"""Subprocess driver for the end-to-end golden parity test (SURVEY §7.2's
minimum slice / BASELINE config 1).

Builds the REFERENCE MLA (reduced LLM: hidden 512 x 4 layers; full-width
1024-d vision tokenizer) on CPU in bf16 with a pinned seed, records its
predict_action_diff / predict_action_ar outputs on pinned inputs, exports its
checkpoint in the reference run-dir format, then loads that run dir through
OUR `load_vla(...)` and asserts the same predictions.

Run in a subprocess (tests/test_golden_e2e.py) because ref_harness swaps the
vendored transformers 4.40.1 (with the reference's modified LlamaForCausalLM)
into sys.modules — that must not leak into other tests.

Reference bugs worked around (documented parity findings, each pinned to the
reference source):
  * predict_action_diff never forwards camera_name -> get_camera_params(None)
    raises (models/mla/model_mla.py:592-775 vs models/vlm/prismatic.py:850);
  * predict_action_ar passes `image=` where forward/generate expect `images=`
    (model_mla.py:563-571) — the vendored GenerationMixin kwarg validation
    rejects it;
  * predict_action_ar feeds a 3-channel image but VisionTokenizer strips the
    last channel as the mask (vision_tokenizer.py:122), so the conv would see
    2 channels; the diff path appends the mask channel (model_mla.py:660-663),
    the AR path forgot;
  * forward() requires x/t when self.use_diff (prismatic.py:958) and
    prepare_inputs_for_generation drops the use_diff kwarg, so AR decode on a
    diffusion model needs the flag flipped externally.

Prints one line of JSON with the comparison results.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PALLAS_AXON_TPU_GEN"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup) — force-enable via jax.config.update; the
# helper reads the dir set above from os.environ.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

# The axon TPU plugin registers at interpreter startup (site .pth), BEFORE
# the env lines above run; if the ambient env carried PALLAS_AXON_TPU_GEN,
# a later jax.devices()/process_index() would initialize the registered TPU
# backend — blocking on the tunnel — despite JAX_PLATFORMS=cpu. Only a
# post-import config update reliably pins the platform (same finding as
# __graft_entry__.dryrun_multichip).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

INSTRUCTION = "close the box"


def run_reference(workdir: str, use_pointcloud: bool = False, llm_kw=None):
    import numpy as np
    import torch
    from PIL import Image

    from tests import ref_harness as rh

    mla, tok = rh.build_reference_mla(
        use_pointcloud=use_pointcloud, use_contrastive=use_pointcloud,
        **(llm_kw or {}),
    )
    # the reference hard-casts diffusion inputs to bf16 (prismatic.py:873-881)
    # which clashes with fp32 weights on CPU; bf16 end-to-end is also what the
    # real 7B deployment runs. The pointcloud path additionally up-casts its
    # inputs to fp32 (pointvit.py forward), so it needs autocast on top.
    mla = mla.to(torch.bfloat16).eval()

    rng = np.random.default_rng(0)
    img_uint8 = rng.integers(0, 255, size=(672, 672, 3), dtype=np.uint8)
    pil = Image.fromarray(img_uint8)
    pc = torch.tensor(
        rng.uniform([-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(1024, 3)).astype(np.float32)
    )[None] if use_pointcloud else torch.tensor(
        rng.uniform(-0.5, 0.5, size=(1024, 3)).astype(np.float32)
    )
    state7 = rng.uniform(-0.2, 0.9, size=7).astype(np.float32)

    # camera_name bug workaround (unused with use_pointcloud=False)
    mla.vlm.forward = functools.partial(mla.vlm.forward, camera_name="rlbench_front")

    # record the initial-noise draw and the pre-clip samples
    recorded = []
    orig_randn = torch.randn

    def rec_randn(*a, **k):
        out = orig_randn(*a, **k)
        recorded.append(out.detach().float().cpu().numpy().copy())
        return out

    raw = {}
    orig_create = mla.create_ddim

    def create_and_wrap(*a, **k):
        dd = orig_create(*a, **k)
        orig_loop = dd.ddim_sample_loop

        def loop(*la, **lk):
            out = orig_loop(*la, **lk)
            raw["x"] = out.detach().float().cpu().numpy().copy()
            return out

        dd.ddim_sample_loop = loop
        return dd

    mla.create_ddim = create_and_wrap

    # capture the FIRST denoise step's eps prediction: the most
    # model-dependent quantity that is NOT amplified by the recursive
    # sampling loop — this is where parity is asserted tightly
    eps_steps = []
    orig_vlm_fwd = mla.vlm.forward

    def capture_fwd(*a, **k):
        out = orig_vlm_fwd(*a, **k)
        if isinstance(out, tuple) and len(out) == 2:
            eps_steps.append(out[1].detach().float().cpu().numpy().copy())
        return out

    mla.vlm.forward = capture_fwd

    torch.randn = rec_randn
    torch.manual_seed(123)
    try:
        import contextlib

        ac = (
            torch.autocast("cpu", dtype=torch.bfloat16)
            if use_pointcloud
            else contextlib.nullcontext()
        )
        with ac:
            diff_actions = mla.predict_action_diff(
                image=pil, pointcloud=pc, instruction=INSTRUCTION,
                unnorm_key="rlbench", cur_robot_state=state7,
            )
    finally:
        torch.randn = orig_randn

    if use_pointcloud:
        ar_ids = ar_actions = None
    else:
        ar_ids, ar_actions = _ref_predict_ar_fixed(mla, pil, pc, state7, tok)

    rh.export_reference_run_dir(mla, workdir)
    return {
        "img_uint8": img_uint8,
        "pc": (pc[0] if use_pointcloud else pc).numpy(), "state7": state7,
        "noise": recorded[0], "raw_samples": raw["x"],
        "eps0": eps_steps[0],
        "diff_actions": np.asarray(diff_actions),
        "ar_ids": None if ar_ids is None else np.asarray(ar_ids),
        "ar_actions": None if ar_actions is None else np.asarray(ar_actions),
    }, tok


def _ref_predict_ar_fixed(mla, pil, pc, state7, tok):
    """predict_action_ar's body (model_mla.py:494-589) with the latent bugs
    above fixed so the reference machinery actually runs."""
    import numpy as np
    import torch

    from models.vlm.prismatic import PrismaticVLM

    vlm = mla.vlm
    proc = vlm.get_vision_tower_2d().image_processor
    pb = vlm.get_prompt_builder()
    pb.add_turn(role="human", message=f"What action should the robot take to {INSTRUCTION.lower()}?")
    input_ids = tok(pb.get_prompt(), truncation=True, return_tensors="pt").input_ids
    if not torch.all(input_ids[:, -1] == 29871):
        input_ids = torch.cat((input_ids, torch.tensor([[29871]], dtype=torch.long)), dim=1)
    pv = proc.preprocess(pil, return_tensors="pt")["pixel_values"]
    mask = torch.ones(pv.shape[0], 1, pv.shape[2], pv.shape[3], dtype=pv.dtype)
    image = torch.cat([pv, mask], dim=1)

    stats = mla.get_proprio_stats("rlbench")
    lo, hi = np.array(stats["q01"]), np.array(stats["q99"])
    prop = np.clip(2 * (state7 - lo) / (hi - lo + 1e-8) - 1, -1, 1)
    prop = torch.tensor(prop, dtype=torch.float32)[None, None]

    vlm.use_diff = False
    try:
        gen_ids = super(PrismaticVLM, vlm).generate(
            input_ids=input_ids, images=image, point_cloud=pc, proprio=prop,
            max_new_tokens=7,
        )
    finally:
        vlm.use_diff = True
    tok_ids = gen_ids[0, -7:].cpu().numpy()
    norm = mla.action_tokenizer.decode_token_ids_to_actions(tok_ids)
    astats = mla.get_action_stats("rlbench")
    alo, ahi = np.array(astats["q01"]), np.array(astats["q99"])
    norm = np.clip(norm, -1, 1)
    norm[6] = np.where(norm[6] < 0.5, 0, 1)
    return tok_ids, 0.5 * (norm + 1) * (ahi - alo) + alo


def run_ours(workdir: str, golden, tok, with_ar: bool = True, model_kw=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mla_tpu.models import mla as mla_mod
    from mla_tpu.models.load import load_vla
    from mla_tpu.models.mla import normalize_proprio
    from mla_tpu.vla.datasets import add_mask_channel, clip_preprocess

    policy = load_vla(workdir, model_id="mla-golden", tokenizer=tok, **(model_kw or {}))
    img = add_mask_channel(clip_preprocess(golden["img_uint8"], 672))

    ours_diff = policy.predict_action_diff(
        img, golden["pc"], INSTRUCTION, cur_robot_state=golden["state7"],
        unnorm_key="rlbench", noise=golden["noise"],
    )

    # pre-clip samples: the sensitive continuous comparison
    ids = mla_mod.build_prompt_ids(tok, INSTRUCTION, mode="diff")
    prefix_ids = jnp.asarray(ids[:, :-1])
    tail_ids = jnp.asarray(ids[:, -1:])
    prop = normalize_proprio(golden["state7"], policy.get_proprio_stats("rlbench"))
    fn = policy._diff_fn(int(prefix_ids.shape[1]), 1, use_ddpm=False)
    samples = fn(
        policy.params, policy.state, prefix_ids, tail_ids,
        {"front_image": jnp.asarray(img[None])}, jnp.asarray(golden["pc"][None]),
        jnp.asarray(prop[None, None, :]), jnp.asarray(golden["noise"].reshape(1, 16, 7)),
        jax.random.PRNGKey(0),
    )
    ours_raw = np.asarray(samples[0])

    # first-step eps through our prefix-KV-cached suffix path
    from mla_tpu.diffusion import gaussian as gd

    sched8 = gd.create_schedule("ddim8", diffusion_steps=100)
    cache_max = int(prefix_ids.shape[1]) + policy.cfg.fused_len + 2 + policy.cfg.action_horizon + 1 + policy.cache_margin
    prefix_embeds = mla_mod.build_prefix_embeds(
        policy.params, policy.state, policy.cfg, prefix_ids,
        {"front_image": jnp.asarray(img[None])}, jnp.asarray(golden["pc"][None]),
    )
    kv, _ = mla_mod.prefill(policy.params, policy.cfg, prefix_embeds, cache_max, compute_logits=False)
    dfn = mla_mod.make_suffix_denoise_fn(
        policy.params, policy.cfg, kv, int(prefix_embeds.shape[1]),
        jnp.asarray(prop[None, None, :]), tail_ids,
    )
    t0 = jnp.full((1,), int(sched8.timestep_map[-1]), jnp.int32)
    ours_eps0 = np.asarray(dfn(jnp.asarray(golden["noise"].reshape(1, 16, 7)), t0))

    if not with_ar:
        return ours_diff, ours_raw, None, None, ours_eps0, None
    ours_ar = policy.predict_action_ar(img, golden["pc"], INSTRUCTION, unnorm_key="rlbench")
    # the raw greedy token ids for the exact-match check
    ar_ids_in = mla_mod.build_prompt_ids(tok, INSTRUCTION, mode="ar")
    arfn = policy._ar_fn(int(ar_ids_in.shape[1]), policy.cfg.action_dim)
    toks, _ = arfn(
        policy.params, policy.state, jnp.asarray(ar_ids_in),
        {"front_image": jnp.asarray(img[None])}, jnp.asarray(golden["pc"][None]),
        jnp.zeros((1, 1, policy.cfg.action_dim), jnp.float32),
    )

    # teacher-forced margin analysis: replay the REFERENCE's greedy ids
    # through our decode path and record, at every step, the fp32-logit gap
    # between our argmax and the reference's chosen token, in units of that
    # step's logit std. Greedy ids can only legitimately differ where this
    # gap is a rounding-scale near-tie (deep bf16 stacks accumulate ~1e-3
    # relative drift); a real divergence shows up as a large gap.
    from mla_tpu.models import prismatic as prismatic_mod

    decoder = prismatic_mod.get_decoder(policy.cfg)
    cfgl = policy.cfg
    cache_max = ar_ids_in.shape[1] + cfgl.fused_len + cfgl.action_dim + policy.cache_margin
    ref_toks = jnp.asarray(np.asarray(golden["ar_ids"]).reshape(-1), jnp.int32)

    @jax.jit
    def tf_logits(params, state, ids_prefix, images, pc, ref_toks):
        prefix = mla_mod.build_prefix_embeds(params, state, cfgl, ids_prefix, images, pc)
        kv, last_logits = mla_mod.prefill(params, cfgl, prefix, cache_max)
        P = prefix.shape[1]

        def step(carry, inputs):
            i, tok = inputs
            cache, logits = carry
            emb = decoder.embed_tokens(params["llm_backbone"], tok[None, None])
            key_mask = (jnp.arange(cache_max) < P + i + 1)[None, :]
            out = decoder.forward(
                params["llm_backbone"], cfgl.llama, emb,
                kv_cache=cache, cache_len=P + i, key_mask=key_mask,
            )
            # emit the distribution the i-th token was chosen FROM
            return (out["kv_cache"], out["logits"][:, -1]), logits[0]

        (_, _), logit_seq = jax.lax.scan(
            step, (kv, last_logits), (jnp.arange(ref_toks.shape[0]), ref_toks)
        )
        return logit_seq  # [T, V] fp32

    logit_seq = np.asarray(tf_logits(
        policy.params, policy.state, jnp.asarray(ar_ids_in),
        {"front_image": jnp.asarray(img[None])}, jnp.asarray(golden["pc"][None]),
        ref_toks,
    ), np.float32)
    ref_np = np.asarray(golden["ar_ids"]).reshape(-1)
    margins = []
    for t in range(len(ref_np)):
        lt = logit_seq[t]
        gap = float(lt.max() - lt[ref_np[t]])
        margins.append(gap / (float(lt.std()) + 1e-9))
    ar_margin = {
        "teacher_forced_agree": float(np.mean(np.argmax(logit_seq, -1) == ref_np)),
        "max_margin_vs_ref": float(np.max(margins)),
    }
    return ours_diff, ours_raw, np.asarray(ours_ar), np.asarray(toks[0]), ours_eps0, ar_margin


def _zero_eps_transform(noise):
    """What the DDIM-8 loop produces when the model predicts eps == 0 — the
    degenerate (model-independent) output a freshly zero-initialized eps head
    yields (prismatic.py:320-321). The recorded samples must differ from
    this, or the golden is vacuous."""
    import numpy as np

    from mla_tpu.diffusion import gaussian as gd

    sched = gd.create_schedule("ddim8", diffusion_steps=100)
    acp = np.asarray(sched.alphas_cumprod)
    acp_prev = np.asarray(sched.alphas_cumprod_prev)
    x = np.asarray(noise, np.float64)
    for t in range(sched.num_timesteps - 1, -1, -1):
        # ddim update with eps = 0: x0 = x / sqrt(acp); x' = sqrt(acp_prev) x0
        x = np.sqrt(acp_prev[t]) * (x / np.sqrt(acp[t]))
    return x.astype(np.float32)


def main():
    import tempfile

    import numpy as np

    # (name, use_pointcloud, reference-LLM dims, our model-config overrides,
    #  run AR). "deep" is the FULL-DEPTH golden (VERDICT r2 #4): production
    # depth 32 at narrow width 256 — exercises bf16 drift over 32 layers,
    # RoPE at depth, and the split-scan at contrastive_layer=8 (our scan is
    # always split at that index, matching the reference's hardcoded
    # hidden_states[8] capture point, modeling_llama.py:1274) inside a
    # 32-layer stack, end-to-end vs the real reference stack.
    scenarios = (
        ("base", False, None, None, True),
        ("pointcloud", True, None, None, False),
        ("deep", False,
         dict(hidden=256, layers=32, heads=8, intermediate=688),
         dict(hidden_size=256, num_layers=32, num_heads=8,
              intermediate_size=688, contrastive_layer=8),
         True),
    )
    results = {}
    for scenario, use_pc, llm_kw, model_kw, with_ar in scenarios:
        workdir = tempfile.mkdtemp(prefix=f"golden_e2e_{scenario}_")
        golden, tok = run_reference(workdir, use_pointcloud=use_pc, llm_kw=llm_kw)
        ours_diff, ours_raw, ours_ar, ours_ar_ids, ours_eps0, ar_margin = run_ours(
            workdir, golden, tok, with_ar=with_ar, model_kw=model_kw
        )

        ref_raw = golden["raw_samples"][0]
        rel = np.abs(ours_raw - ref_raw) / (np.abs(ref_raw) + 1e-3)
        ref_eps0 = golden["eps0"].reshape(ours_eps0.shape)
        eps_rel = np.abs(ours_eps0 - ref_eps0) / (np.abs(ref_eps0).max() + 1e-6)
        degenerate = _zero_eps_transform(golden["noise"].reshape(ref_raw.shape))
        r = {
            "diff_max_abs_err": float(np.abs(ours_diff - golden["diff_actions"]).max()),
            # eps at the first denoise step: the full model forward WITHOUT
            # the sampling recursion's chaotic amplification — the tight check
            # (mean is the robust statistic; max catches single-element tails
            # of the bf16 rounding distribution)
            "eps0_max_rel_err": float(eps_rel.max()),
            "eps0_mean_rel_err": float(eps_rel.mean()),
            "eps0_scale": float(np.abs(ref_eps0).max()),
            "raw_max_rel_err": float(rel.max()),
            "raw_std": float(ref_raw.std()),
            # non-vacuous: the recorded chunk must depend on the model, not
            # just on the input noise
            "model_dependence": float(
                np.abs(ref_raw - degenerate).max() / (np.abs(ref_raw).max() + 1e-6)
            ),
        }
        if ours_ar_ids is not None:
            r["ar_ids_equal"] = bool(
                (ours_ar_ids.reshape(-1) == golden["ar_ids"].reshape(-1)).all()
            )
            r["ar_max_abs_err"] = float(np.abs(ours_ar - golden["ar_actions"]).max())
            if ar_margin is not None:
                r["ar_teacher_forced_agree"] = ar_margin["teacher_forced_agree"]
                r["ar_max_margin_vs_ref"] = ar_margin["max_margin_vs_ref"]
        results[scenario] = r
    print("GOLDEN_E2E_RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
