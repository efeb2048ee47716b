"""MLA top-level wrapper: training losses and action-prediction inference.

Parity target: reference models/mla/model_mla.py — owns the diffusion
schedule (squaredcos_cap_v2, 100 steps, sigma_small), the batch-repetition
training forward (:118-276), and the inference paths `predict_action_ar`
(:494-589) and `predict_action_diff` (:592-775, DDIM-8 default).

TPU-first redesigns:
  * Training: `mla_train_loss` is a pure function (params, state, batch,
    rng) -> (total_loss, aux) designed to sit under jax.value_and_grad
    inside one pjit-ed train step. Batch x4 diffusion repetition and
    q_sample happen inside the jitted graph.
  * Diffusion inference: the multimodal prefix [BOS|fused|prompt] is
    prefilled ONCE into a KV cache; each DDIM step then runs only the
    19-token suffix [proprio, t, x_0..15, tail] against the cached prefix.
    This is mathematically exact (the prefix is unchanged across denoise
    steps and attention is causal) — the reference instead recomputes the
    full ~900-token forward on every step (model_mla.py:742-770 ->
    prismatic forward), which is the dominant cost it leaves on the table.
  * AR inference: greedy decode over a `lax.scan` with the same KV cache
    (the reference taps HF GenerationMixin's python loop).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.diffusion import gaussian as gd
from mla_tpu.models import embedders
from mla_tpu.models import llama as llama_mod
from mla_tpu.models import prismatic
from mla_tpu.vla.action_tokenizer import ActionTokenizer

# Serving-prefill score dtype (MLA_PREFILL_SCORES: 'bf16' | 'fp32').
# bf16 halves the [B,H,S,S] score-tensor HBM traffic of the XLA attention
# blocks — the dominant non-matmul cost of the S=534 prefill (13.1 -> 2.3 ms
# over 32 layers at B=4, scripts/profile_prefill_ops.py on the real chip).
# Softmax still reduces in fp32; training and the flash path are untouched.
# Fidelity vs the fp32-scores path is qualified on the real trained model
# alongside the sampler sweep (docs/kernels.md).
#
# The env var is read LAZILY, at MLAPolicy construction — never at import
# time and never by bare `prefill()` calls, whose library default stays
# fp32-exact (the prefix-cache exactness and golden-parity contracts).
# Serving entry points (bench.py, scripts/serve.py) setdefault bf16 before
# building their policy; merely importing them cannot flip anyone's
# numerics.
def serving_scores_dtype_from_env() -> Optional[jnp.dtype]:
    return (
        jnp.bfloat16
        if os.environ.get("MLA_PREFILL_SCORES", "fp32") == "bf16"
        else None
    )


# XLA compiler options for the serving graphs (MLA_XLA_OPTIONS: a JSON dict
# of option-name -> string value, e.g.
# '{"xla_tpu_enable_latency_hiding_scheduler": "true"}').
#
# The latency-hiding scheduler overlaps each decode-chain dot's weight DMA
# with the previous dot's MXU work, cutting the suffix denoise step
# 10.84 -> 9.91 ms/step on the real v5e (chained-dispatch A/B, chain=16,
# scripts/sweep_suffix_flags.py — docs/kernels.md "XLA scheduling-option
# sweep"). Options ride jax.jit(compiler_options=...), reaching the REMOTE
# TPU compile service (host XLA_FLAGS only configures the local CPU client).
#
# Same lazy contract as MLA_PREFILL_SCORES: resolved at MLAPolicy
# construction, never at import; the library default (unset -> None) keeps
# every non-serving caller on stock-scheduler programs and existing compile
# caches. bench.py / scripts/serve.py setdefault the latency-hiding option.
def serving_compiler_options_from_env() -> Optional[Dict[str, str]]:
    raw = os.environ.get("MLA_XLA_OPTIONS", "")
    return json.loads(raw) if raw else None

# token-id constants of the Llama-2 + MLA vocabulary
BOS_ID = 1
EOS_ID = 2
EMPTY_ID = 29871  # the '▁' empty token after "Out:" (train.py convention)
BOD_ID = 32001
EOD_ID = 32002
IGNORE_INDEX = -100


# --------------------------------------------------------------------------- #
# Training loss
# --------------------------------------------------------------------------- #


def _tile_batch(tree, rep: int):
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x, (rep,) + (1,) * (x.ndim - 1)) if hasattr(x, "ndim") and x.ndim > 0 else x,
        tree,
    )


def mla_train_loss(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    sched: gd.Schedule,
    batch: Dict[str, Any],
    rng: jax.Array,
    *,
    repeated_diffusion_steps: int = 4,
    remat: bool = True,
    use_flash: Optional[bool] = None,
    override_noise: Optional[jnp.ndarray] = None,
    override_t: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]]:
    """One training forward returning (total_loss, (loss_dict, new_state)).

    Reference MLA.forward (:118-276): diffusion mode repeats the batch
    `repeated_diffusion_steps` times with independent (noise, t) draws,
    q-samples the future-action window, and sums
    diff MSE + generation + contrastive losses.

    override_noise / override_t replace the rng draws (shape [B*rep, ...]) —
    golden-parity runs replay the reference's recorded torch draws.
    """
    k_noise, k_t, k_model = jax.random.split(rng, 3)
    zeros = jnp.asarray(0.0, jnp.float32)
    loss_dict = {
        "total_loss": zeros,
        "img_pc_contrastive_loss": zeros,
        "tactile_contrastive_loss": zeros,
        "diff_loss": zeros,
        "ar_loss": zeros,
        "image_gen_loss": zeros,
        "point_cloud_gen_loss": zeros,
        "tactile_gen_loss": zeros,
    }

    if cfg.use_diff:
        rep = repeated_diffusion_steps
        rbatch = _tile_batch(batch, rep)
        actions = rbatch["actions"]  # [B*rep, horizon, action_dim]
        actions_future = actions[:, -cfg.action_horizon :, :]
        Br = actions_future.shape[0]
        if override_noise is not None:
            noise = jnp.asarray(override_noise, jnp.float32).reshape(actions_future.shape)
        else:
            noise = jax.random.normal(k_noise, actions_future.shape, jnp.float32)
        if override_t is not None:
            t = jnp.asarray(override_t, jnp.int32).reshape((Br,))
        else:
            t = jax.random.randint(k_t, (Br,), 0, sched.num_timesteps)
        x = gd.q_sample(sched, actions_future.astype(jnp.float32), t, noise)
        rbatch = {**rbatch, "x": x, "t": t}
        # the reference computes the LM CE in diffusion mode too but discards
        # it from the total (model_mla.py:206-216); skip the 32k-vocab
        # lm_head matmul entirely instead
        rbatch.pop("labels", None)

        outputs, new_state = prismatic.vlm_forward(
            params, state, cfg, rbatch, training=True, use_diff=True,
            rng=k_model, remat=remat, use_flash=use_flash,
        )
        noise_pred = outputs["noise_pred"].astype(jnp.float32)
        diff_loss = jnp.mean((noise_pred - noise) ** 2)
        loss_dict["diff_loss"] = diff_loss
        total = diff_loss
    else:
        outputs, new_state = prismatic.vlm_forward(
            params, state, cfg, batch, training=True, use_diff=False,
            rng=k_model, remat=remat, use_flash=use_flash,
        )
        ar_loss = outputs["lm_loss"]
        loss_dict["ar_loss"] = ar_loss
        total = ar_loss

    if cfg.use_contrastive and "img_pc_contrastive_loss" in outputs:
        c = outputs["img_pc_contrastive_loss"]
        loss_dict["img_pc_contrastive_loss"] = c
        total = total + c
        if cfg.use_tactile and "tactile_contrastive_loss" in outputs:
            tc = outputs["tactile_contrastive_loss"]
            loss_dict["tactile_contrastive_loss"] = tc
            total = total + tc

    if cfg.use_generation and "generation_losses" in outputs:
        gl = outputs["generation_losses"]
        if cfg.gen.use_image and "image_gen_loss" in gl:
            loss_dict["image_gen_loss"] = gl["image_gen_loss"]
            total = total + gl["image_gen_loss"]
        if cfg.gen.use_pointcloud and "point_cloud_gen_loss" in gl:
            loss_dict["point_cloud_gen_loss"] = gl["point_cloud_gen_loss"]
            total = total + gl["point_cloud_gen_loss"]
        if cfg.gen.use_tactile and "tactile_gen_loss" in gl:
            loss_dict["tactile_gen_loss"] = gl["tactile_gen_loss"]
            total = total + gl["tactile_gen_loss"]

    loss_dict["total_loss"] = total
    return total, (loss_dict, new_state)


# --------------------------------------------------------------------------- #
# Inference building blocks (jit-able)
# --------------------------------------------------------------------------- #


def _device_clip_preprocess(img_u8: jnp.ndarray) -> jnp.ndarray:
    """Raw uint8 [B, 3, S, S] CHW frame -> CLIP-normalized float32
    [B, 4, S, S] with the all-ones mask channel, computed on-device
    (identical math to the host vla.datasets.clip_preprocess +
    add_mask_channel; resize/crop, if needed, stays on the host where
    uint8 PIL resize is cheap)."""
    from mla_tpu.vla.datasets import CLIP_MEAN, CLIP_STD

    x = img_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD, jnp.float32).reshape(1, 3, 1, 1)
    x = (x - mean) / std
    mask = jnp.ones((x.shape[0], 1) + x.shape[2:], jnp.float32)
    return jnp.concatenate([x, mask], axis=1)


def build_prefix_embeds(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    input_ids_prefix: jnp.ndarray,  # [B, Lp] — prompt ids up to & excl. tag
    images: Dict[str, jnp.ndarray],
    point_cloud: Optional[jnp.ndarray],
    tactile: Optional[jnp.ndarray] = None,
    gripper_xyz: Optional[jnp.ndarray] = None,
    *,
    with_uncond: bool = False,
) -> jnp.ndarray:
    """[BOS | fused | text[1:]] embeddings — shared by both inference paths.

    with_uncond=True appends the classifier-free-guidance unconditional
    prefix (every conditioning embedding replaced by the z_embedder
    `uncondition` vector, reference LabelEmbedder semantics,
    models/diffusion/models.py:79-97) as a second batch row.

    Serving-path option: image dict values may be RAW uint8 [B, 3, S, S]
    frames — CLIP normalization + the all-ones mask channel then run
    ON-DEVICE (same math as vla.datasets.clip_preprocess/add_mask_channel,
    reference CLIPImageProcessor semantics). Shipping uint8 instead of the
    preprocessed float32 4-channel tensor cuts host->device image bytes
    5.3x, which is the dominant per-request cost for a remote serving
    host. The dtype check is static under jit (retraces per dtype)."""
    images = {k: _device_clip_preprocess(v) if v.dtype == jnp.uint8 else v
              for k, v in images.items()}
    fused_out = prismatic.get_fused_tokens(
        params, state, cfg, images, point_cloud, tactile, gripper_xyz, training=False
    )
    decoder = prismatic.get_decoder(cfg)
    text_emb = decoder.embed_tokens(params["llm_backbone"], input_ids_prefix)
    prefix = jnp.concatenate(
        [text_emb[:, :1], fused_out["fused"].astype(text_emb.dtype), text_emb[:, 1:]], axis=1
    )
    if with_uncond:
        uncond = params["z_embedder"]["uncondition"].astype(prefix.dtype)  # [1, D]
        uncond_prefix = jnp.broadcast_to(uncond[None], prefix.shape)
        prefix = jnp.concatenate([prefix, uncond_prefix], axis=0)
    return prefix


def prefill(
    params: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    prefix_embeds: jnp.ndarray,
    cache_max_len: int,
    compute_logits: bool = True,
    use_flash: Optional[bool] = False,
    scores_dtype: Optional[jnp.dtype] = None,
) -> Tuple[Dict[str, jnp.ndarray], Optional[jnp.ndarray]]:
    """Run the prefix through the decoder, returning (kv_cache, last_logits).
    The diffusion path skips the lm_head (157 GFLOP/step saved at 7B).

    use_flash: attention implementation for the prefill, measured on the
    real chip by scripts/profile_prefill_ops.py. XLA attention stays the
    serving default: even with the flash kernel's MXU dots fixed to
    bf16-in/fp32-acc (round 3), 32 interleaved pallas_calls lose to XLA's
    fused command buffer at S=534 — per-launch overhead (~0.16 ms x 32)
    plus broken weight-DMA prefetch across the kernel boundaries, the same
    mechanism that sank the fused W8A8 Pallas decode path (docs/kernels.md).
    Flash remains the default for training lengths (llama_forward auto)."""
    B, P, _ = prefix_embeds.shape
    decoder = prismatic.get_decoder(cfg)
    cache = decoder.init_kv_cache(cfg.llama, B, cache_max_len)
    key_mask = (jnp.arange(cache_max_len) < P)[None, :].repeat(B, axis=0)
    out = decoder.forward(
        params["llm_backbone"], cfg.llama, prefix_embeds,
        kv_cache=cache, cache_len=0, key_mask=key_mask, compute_logits=False,
        # serving prefill: full layer unroll avoids the scan's dynamic
        # weight-slice copies (same finding as the decode path)
        scan_unroll=cfg.llama.num_layers,
        use_flash=use_flash,
        scores_dtype=scores_dtype,
    )
    if not compute_logits:
        return out["kv_cache"], None
    # AR decode only consumes the LAST position's distribution — slice before
    # the 131M-param lm_head matmul instead of projecting all P positions
    last = decoder.lm_head_logits(params["llm_backbone"], out["last_hidden"][:, -1:])
    return out["kv_cache"], last[:, -1]


def make_suffix_denoise_fn(
    params: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    kv_cache: Dict[str, jnp.ndarray],
    prefix_len: int,
    proprio: jnp.ndarray,   # [B, 1, action_dim]
    tail_ids: jnp.ndarray,  # [B, Lt] ids after the splice (the 29871 tail)
):
    """Build the eps-model closure: (x, t) -> eps via a short suffix forward
    [proprio, t, x_0..15] against the cached prefix. The prompt's trailing
    tail ids (the 29871 after the splice) sit causally AFTER the x tokens, so
    their hidden states cannot influence the eps read-out — they are dropped
    from the denoise forward entirely (exactness covered by
    tests/test_model.py::test_prefix_cache_diffusion_is_exact)."""
    del tail_ids  # kept in the signature for call-site symmetry
    B = proprio.shape[0]
    horizon = cfg.action_horizon
    cache_max = kv_cache["k"].shape[3]

    decoder = prismatic.get_decoder(cfg)
    proprio_emb = embedders.action_embedder(
        params["proprio_embedder"], proprio.astype(cfg.llama.compute_dtype)
    )
    suffix_len = 2 + horizon
    key_mask = (jnp.arange(cache_max) < prefix_len + suffix_len)[None, :].repeat(B, axis=0)

    def denoise_fn(x, t_model):
        x_emb = embedders.action_embedder(
            params["x_embedder"], x.astype(cfg.llama.compute_dtype)
        )
        t_emb = embedders.timestep_embedder(params["t_embedder"], t_model)[:, None, :]
        suffix = jnp.concatenate(
            [proprio_emb, t_emb.astype(x_emb.dtype), x_emb], axis=1
        )
        out = decoder.forward(
            params["llm_backbone"], cfg.llama, suffix,
            kv_cache=kv_cache, cache_len=prefix_len, key_mask=key_mask,
            compute_logits=False,
            # denoise steps re-run the same positions every iteration;
            # persisting their K/V would copy the whole cache per step
            cache_read_only=True,
        )
        final = embedders.final_layer(params["final_layer"], out["last_hidden"])
        # x tokens at suffix positions [2, 2+horizon)
        return final[:, 2 : 2 + horizon].astype(jnp.float32)

    return denoise_fn


def ddim_denoise_actions(
    params: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    sched: gd.Schedule,
    kv_cache: Dict[str, jnp.ndarray],
    prefix_len: int,
    proprio: jnp.ndarray,
    tail_ids: jnp.ndarray,
    noise: jnp.ndarray,  # [B, horizon, action_dim]
    *,
    use_ddpm: bool = False,
    key: Optional[jax.Array] = None,
    cfg_scale: float = 0.0,
    sampler: str = "ddim",
    num_dpm_steps: int = 4,
) -> jnp.ndarray:
    """DDIM/DDPM loop where each step is a short suffix forward against the
    cached prefix. Exact w.r.t. the reference's full recompute.

    sampler='dpm' swaps in DPM-Solver++(2M) (diffusion/dpm_solver.py) with
    `num_dpm_steps` model evaluations — a beyond-parity serving mode: the
    denoise loop is weight-bandwidth-bound, and 4 solver evals reach better
    ODE accuracy than DDIM-8 (tests/test_dpm_solver.py). `sched` is then the
    UNSPACED training schedule carried by the policy.

    With cfg_scale > 1, the cache is expected to hold [cond; uncond] prefix
    rows and `noise`/`proprio`/`tail_ids` the doubled batch; guided eps is
    uncond + scale * (cond - uncond) (reference forward_with_cfg)."""
    base_fn = make_suffix_denoise_fn(params, cfg, kv_cache, prefix_len, proprio, tail_ids)
    if cfg_scale > 1.0:
        def denoise_fn(x, t_model):
            half = x[: x.shape[0] // 2]
            eps = base_fn(jnp.concatenate([half, half], axis=0), t_model)
            cond, uncond = jnp.split(eps, 2, axis=0)
            guided = uncond + cfg_scale * (cond - uncond)
            return jnp.concatenate([guided, guided], axis=0)
    else:
        denoise_fn = base_fn
    if sampler == "dpm":
        from mla_tpu.diffusion.dpm_solver import dpm_solver_pp_2m

        return dpm_solver_pp_2m(sched, denoise_fn, noise, num_steps=num_dpm_steps)
    if use_ddpm:
        return gd.ddpm_sample_loop(sched, denoise_fn, noise, key=key)
    return gd.ddim_sample_loop(sched, denoise_fn, noise, eta=0.0)


def greedy_decode_actions(
    params: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    kv_cache: Dict[str, jnp.ndarray],
    prefix_len: int,
    last_logits: jnp.ndarray,  # [B, V] from prefill
    num_tokens: int,
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """AR decode of `num_tokens` tokens as a lax.scan; returns
    ([B, num_tokens] token ids, [B, num_tokens] per-token max softmax probs).
    temperature == 0 -> greedy (the reference predict_action_ar via HF
    generate, model_mla.py:564-574); temperature > 0 -> sampling with
    optional top-k truncation (HF GenerationMixin's do_sample options)."""
    decoder = prismatic.get_decoder(cfg)
    B = last_logits.shape[0]
    cache_max = kv_cache["k"].shape[3]
    if temperature > 0 and key is None:
        raise ValueError("sampling requires a PRNG key")
    keys = (
        jax.random.split(key, num_tokens)
        if key is not None
        else jnp.zeros((num_tokens, 2), jnp.uint32)
    )

    def select(logits, k):
        if temperature <= 0:
            return jnp.argmax(logits, axis=-1)
        scaled = logits / temperature
        if top_k > 0:
            vals, _ = jax.lax.top_k(scaled, top_k)
            cutoff = vals[:, -1:]
            scaled = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
        return jax.random.categorical(k, scaled, axis=-1)

    def step(carry, inputs):
        i, k = inputs
        cache, logits = carry
        tok = select(logits, k)  # [B]
        # per-token confidence: max softmax prob of the distribution the
        # token was drawn from (reference model_mla.py:895-907 output_scores)
        f32 = logits.astype(jnp.float32)
        prob = jnp.exp(jnp.max(f32, axis=-1) - jax.nn.logsumexp(f32, axis=-1))
        emb = decoder.embed_tokens(params["llm_backbone"], tok[:, None])
        key_mask = (jnp.arange(cache_max) < prefix_len + i + 1)[None, :].repeat(B, axis=0)
        out = decoder.forward(
            params["llm_backbone"], cfg.llama, emb,
            kv_cache=cache, cache_len=prefix_len + i, key_mask=key_mask,
        )
        return (out["kv_cache"], out["logits"][:, -1]), (tok, prob)

    (_, _), (toks, probs) = jax.lax.scan(
        step, (kv_cache, last_logits), (jnp.arange(num_tokens), keys)
    )
    return jnp.swapaxes(toks, 0, 1), jnp.swapaxes(probs, 0, 1)  # [B, T] each


def beam_search_decode(
    params: Dict[str, Any],
    cfg: prismatic.MLAModelConfig,
    kv_cache: Dict[str, jnp.ndarray],
    prefix_len: int,
    last_logits: jnp.ndarray,  # [B, V] from prefill
    num_tokens: int,
    *,
    num_beams: int,
    eos_id: int = EOS_ID,
    length_penalty: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape beam search against the cached prefix; returns
    ([B, num_tokens] best-beam ids, [B] length-penalized log-prob scores).

    Parity surface: the reference routes generate(num_beams=...) through HF
    GenerationMixin's beam search (models/vlm/base_vlm.py:32-108,
    prismatic.py:1195-1295). TPU-idiomatic shape discipline instead of HF's
    dynamic hypothesis lists: beams ride the batch axis (row b's beams are
    flat rows b*K..b*K+K-1), every decode step is ONE [B*K]-batched forward
    on the MXU, parent re-selection regathers the KV cache along the batch
    axis inside the scan, and finished beams extend with EOS at log-prob 0
    (score frozen) so control flow stays static. Selection follows HF's
    scorer: score / len(tokens-up-to-and-including-EOS) ** length_penalty.
    """
    decoder = prismatic.get_decoder(cfg)
    B, V = last_logits.shape
    K = int(num_beams)
    if not 1 <= K <= V:
        raise ValueError(f"num_beams must be in [1, vocab], got {K}")
    cache_max = kv_cache["k"].shape[3]
    NEG = jnp.float32(-1e9)

    cache = jax.tree_util.tree_map(lambda c: jnp.repeat(c, K, axis=1), kv_cache)
    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
    scores, tok = jax.lax.top_k(logp0, K)  # [B, K] each: the first expansion
    finished = tok == eos_id
    lengths = jnp.ones((B, K), jnp.int32)
    tokens = jnp.zeros((B, K, num_tokens), jnp.int32).at[:, :, 0].set(tok)
    batch_offset = (jnp.arange(B) * K)[:, None]  # [B, 1]
    # a finished beam's only continuation: EOS at log-prob 0
    eos_row = jnp.full((V,), NEG).at[eos_id].set(0.0)

    def step(carry, i):
        cache, tok, scores, finished, lengths, tokens = carry
        emb = decoder.embed_tokens(params["llm_backbone"], tok.reshape(B * K, 1))
        key_mask = (jnp.arange(cache_max)[None, :] < prefix_len + i + 1).repeat(
            B * K, axis=0
        )
        out = decoder.forward(
            params["llm_backbone"], cfg.llama, emb,
            kv_cache=cache, cache_len=prefix_len + i, key_mask=key_mask,
        )
        logp = jax.nn.log_softmax(
            out["logits"][:, -1].astype(jnp.float32), axis=-1
        ).reshape(B, K, V)
        logp = jnp.where(finished[:, :, None], eos_row[None, None, :], logp)
        scores, flat = jax.lax.top_k(
            (scores[:, :, None] + logp).reshape(B, K * V), K
        )
        parent, tok = flat // V, flat % V
        was_finished = jnp.take_along_axis(finished, parent, axis=1)
        lengths = jnp.take_along_axis(lengths, parent, axis=1)
        tokens = jnp.take_along_axis(
            tokens, jnp.broadcast_to(parent[:, :, None], (B, K, num_tokens)), axis=1
        ).at[:, :, i + 1].set(tok)
        lengths = jnp.where(was_finished, lengths, lengths + 1)
        finished = was_finished | (tok == eos_id)
        gp = (batch_offset + parent).reshape(-1)  # [B*K] flat parent rows
        cache = jax.tree_util.tree_map(
            lambda c: jnp.take(c, gp, axis=1), out["kv_cache"]
        )
        return (cache, tok, scores, finished, lengths, tokens), None

    if num_tokens > 1:
        (cache, tok, scores, finished, lengths, tokens), _ = jax.lax.scan(
            step, (cache, tok, scores, finished, lengths, tokens),
            jnp.arange(num_tokens - 1),
        )
    penalized = scores / lengths.astype(jnp.float32) ** length_penalty
    best = jnp.argmax(penalized, axis=1)  # [B]
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None].repeat(num_tokens, axis=2), axis=1
    )[:, 0]
    best_scores = jnp.take_along_axis(penalized, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores


# --------------------------------------------------------------------------- #
# Host-side policy wrapper
# --------------------------------------------------------------------------- #


def unnormalize_actions(
    normalized: np.ndarray, action_stats: Dict[str, Any], binarize_gripper: bool = True
) -> np.ndarray:
    """q01/q99 unnormalization + gripper binarize at 0.5
    (reference model_mla.py:682-707)."""
    mask = np.asarray(action_stats.get("mask", np.ones_like(action_stats["q01"], dtype=bool)))
    high, low = np.asarray(action_stats["q99"]), np.asarray(action_stats["q01"])
    a = np.clip(normalized, -1, 1)
    if binarize_gripper:
        if a.ndim == 1:
            for g in range(6, len(a), 7):
                a[g] = np.where(a[g] < 0.5, 0.0, 1.0)
        else:
            for g in range(6, a.shape[-1], 7):
                a[..., g] = np.where(a[..., g] < 0.5, 0.0, 1.0)
    return np.where(mask, 0.5 * (a + 1) * (high - low) + low, a)


def normalize_proprio(proprio: np.ndarray, proprio_stats: Dict[str, Any]) -> np.ndarray:
    mask = np.asarray(proprio_stats.get("mask", np.ones_like(proprio_stats["q01"], dtype=bool)))
    high, low = np.asarray(proprio_stats["q99"]), np.asarray(proprio_stats["q01"])
    p = np.where(mask, 2 * (proprio - low) / (high - low + 1e-8) - 1, proprio)
    return np.clip(p, -1, 1)


def build_prompt_ids(
    tokenizer, instruction: str, mode: str = "diff"
) -> np.ndarray:
    """Tokenize the VLA prompt, reproducing the reference's token surgery.

    mode='ar'  : ensure a trailing 29871 (model_mla.py:541-550)
    mode='diff': append [29871, 32001, 32002, 29871] then STRIP the last 3,
                 i.e. conditioning ends at the first appended 29871
                 (model_mla.py:638-643, 716).
    """
    prompt = f"In: What action should the robot take to {instruction.lower()}?\nOut: "
    # PurePromptBuilder strips the trailing space via rstrip (base_prompter.py:74-76)
    prompt = prompt.rstrip()
    ids = tokenizer(prompt, add_special_tokens=True)["input_ids"]
    ids = list(ids)
    if ids[-1] != EMPTY_ID:
        if mode == "ar":
            ids = ids + [EMPTY_ID]
        else:
            ids = ids + [EMPTY_ID, BOD_ID, EOD_ID, EMPTY_ID]
            ids = ids[:-3]
    return np.asarray([ids], dtype=np.int32)


class MLAPolicy:
    """Deployment-facing policy: load once, call predict_action_* per step.

    This is the `load_vla(...).predict_action_diff(...)` API surface the
    reference's RLBench eval loop uses (scripts/test_rlbench.py:55-78)."""

    def __init__(
        self,
        params: Dict[str, Any],
        state: Dict[str, Any],
        cfg: prismatic.MLAModelConfig,
        tokenizer=None,
        norm_stats: Optional[Dict[str, Any]] = None,
        num_ddim_steps: int = 8,
        cache_margin: int = 32,
        fuse_weights: bool = True,
        prefill_scores_dtype: Any = "serving-default",
        compiler_options: Any = "serving-default",
    ) -> None:
        if fuse_weights and cfg.llm_family == "llama":
            # serving-time qkv/gate-up fusion (fewer dispatches per layer)
            params = {**params, "llm_backbone": llama_mod.fuse_for_serving(params["llm_backbone"])}
        self.params, self.state, self.cfg = params, state, cfg
        self.tokenizer = tokenizer
        self.norm_stats = norm_stats or {}
        self.action_tokenizer = ActionTokenizer(tokenizer, vocab_size=32000)
        self.sched_full = gd.create_schedule("", diffusion_steps=100)
        self.sched_ddim = gd.create_schedule(f"ddim{num_ddim_steps}", diffusion_steps=100)
        self.cache_margin = cache_margin
        # serving-prefill score dtype (None = fp32-exact); env resolved HERE,
        # at construction — see serving_scores_dtype_from_env for the
        # bandwidth rationale + qualification. Jitted graphs are cached per
        # dtype (part of the _jit_cache signature), so flipping the attribute
        # on a warmed policy recompiles instead of serving a stale graph.
        self.prefill_scores_dtype = (
            serving_scores_dtype_from_env()
            if prefill_scores_dtype == "serving-default"
            else prefill_scores_dtype
        )
        # XLA compiler options for every serving graph (None = stock
        # scheduler); env resolved HERE, at construction — see
        # serving_compiler_options_from_env. Part of each _jit_cache
        # signature, so flipping the attribute on a warmed policy
        # recompiles instead of serving a stale graph.
        self.compiler_options = (
            serving_compiler_options_from_env()
            if compiler_options == "serving-default"
            else compiler_options
        )
        self._jit_cache: Dict[Any, Any] = {}

    def _opts_sig(self) -> Any:
        return (
            tuple(sorted(self.compiler_options.items()))
            if self.compiler_options
            else None
        )

    # --- norm stats -------------------------------------------------------
    def _stats(self, unnorm_key: Optional[str], kind: str) -> Dict[str, Any]:
        stats = self.norm_stats
        if unnorm_key is None:
            assert len(stats) == 1, "multiple datasets: pass unnorm_key"
            unnorm_key = next(iter(stats))
        return stats[unnorm_key][kind]

    def get_action_stats(self, unnorm_key=None):
        return self._stats(unnorm_key, "action")

    def get_proprio_stats(self, unnorm_key=None):
        return self._stats(unnorm_key, "proprio")

    # --- jitted graph builders (cached by shape signature) ----------------
    def _diff_fn(
        self, prefix_len: int, tail_len: int, use_ddpm: bool, cfg_scale: float = 0.0,
        sampler: str = "ddim", num_dpm_steps: int = 4,
        num_ddim_steps: Optional[int] = None,
    ):
        sig = ("diff", prefix_len, tail_len, use_ddpm, cfg_scale, sampler,
               num_dpm_steps, num_ddim_steps, jnp.dtype(self.prefill_scores_dtype).name
               if self.prefill_scores_dtype is not None else None,
               self._opts_sig())
        if sig not in self._jit_cache:
            # prefix embeds = text(prefix_len) + fused block
            embed_len = prefix_len + self.cfg.fused_len
            cache_max = embed_len + 2 + self.cfg.action_horizon + tail_len + self.cache_margin
            if use_ddpm or sampler == "dpm":
                sched = self.sched_full
            elif num_ddim_steps is None:
                sched = self.sched_ddim  # policy default (construction-time)
            else:
                sched = gd.create_schedule(f"ddim{num_ddim_steps}", diffusion_steps=100)
            use_cfg = cfg_scale > 1.0

            @partial(jax.jit, compiler_options=self.compiler_options)
            def run(params, state, ids_prefix, tail_ids, images, pc, proprio, noise, key):
                prefix = build_prefix_embeds(
                    params, state, self.cfg, ids_prefix, images, pc, with_uncond=use_cfg
                )
                kv, _ = prefill(params, self.cfg, prefix, cache_max, compute_logits=False,
                                scores_dtype=self.prefill_scores_dtype)
                if use_cfg:
                    proprio_x = jnp.concatenate([proprio, proprio], axis=0)
                    tail_x = jnp.concatenate([tail_ids, tail_ids], axis=0)
                    noise_x = jnp.concatenate([noise, noise], axis=0)
                else:
                    proprio_x, tail_x, noise_x = proprio, tail_ids, noise
                samples = ddim_denoise_actions(
                    params, self.cfg, sched, kv, prefix.shape[1], proprio_x, tail_x,
                    noise_x, use_ddpm=use_ddpm, key=key, cfg_scale=cfg_scale,
                    sampler=sampler, num_dpm_steps=num_dpm_steps,
                )
                return samples[: noise.shape[0]]

            self._jit_cache[sig] = run
        return self._jit_cache[sig]

    def _ar_fn(self, prefix_len: int, num_tokens: int):
        # The AR head's prefill is PINNED to fp32-exact scores regardless of
        # prefill_scores_dtype: the bf16-scores bandwidth lever was motivated
        # and qualified (qualify_samplers --compare_bf16s) for the DIFFUSION
        # prefill only, where the continuous chunk absorbs a 2e-4 rel-rms.
        # Greedy argmax over logits is discrete — a near-tie can flip a token
        # — and the 'AR ids bit-exact' golden runs under fp32. The prefill is
        # ~2 ms of a ~115 ms AR call, so the lever buys ~2% here anyway.
        sig = ("ar", prefix_len, num_tokens, self._opts_sig())
        if sig not in self._jit_cache:
            cache_max = prefix_len + self.cfg.fused_len + num_tokens + self.cache_margin

            @partial(jax.jit, compiler_options=self.compiler_options)
            def run(params, state, ids_prefix, images, pc, proprio):
                prefix = build_prefix_embeds(params, state, self.cfg, ids_prefix, images, pc)
                kv, last_logits = prefill(params, self.cfg, prefix, cache_max,
                                           scores_dtype=None)
                return greedy_decode_actions(
                    params, self.cfg, kv, prefix.shape[1], last_logits, num_tokens
                )

            self._jit_cache[sig] = run
        return self._jit_cache[sig]

    def _gen_fn(self, prefix_len: int, num_tokens: int, *, num_beams: int = 1,
                temperature: float = 0.0, top_k: int = 0,
                length_penalty: float = 1.0):
        """Jitted text-generation graph over the multimodal prefix: greedy /
        sampled (temperature, top-k) via greedy_decode_actions, or beam
        search (num_beams > 1) via beam_search_decode. Same fp32-scores
        prefill pin as _ar_fn (token selection is discrete). Sampling and
        beam search are mutually exclusive, as in HF GenerationMixin."""
        if num_beams > 1 and temperature > 0:
            raise ValueError("beam search and sampling are mutually exclusive")
        sig = ("gen", prefix_len, num_tokens, num_beams, temperature, top_k,
               length_penalty, self._opts_sig())
        if sig not in self._jit_cache:
            cache_max = prefix_len + self.cfg.fused_len + num_tokens + self.cache_margin

            @partial(jax.jit, compiler_options=self.compiler_options)
            def run(params, state, ids_prefix, images, pc, key):
                prefix = build_prefix_embeds(params, state, self.cfg, ids_prefix, images, pc)
                kv, last_logits = prefill(params, self.cfg, prefix, cache_max,
                                          scores_dtype=None)
                if num_beams > 1:
                    return beam_search_decode(
                        params, self.cfg, kv, prefix.shape[1], last_logits,
                        num_tokens, num_beams=num_beams,
                        length_penalty=length_penalty,
                    )
                return greedy_decode_actions(
                    params, self.cfg, kv, prefix.shape[1], last_logits,
                    num_tokens, temperature=temperature, top_k=top_k,
                    key=key if temperature > 0 else None,
                )

            self._jit_cache[sig] = run
        return self._jit_cache[sig]

    # --- public API -------------------------------------------------------
    def predict_action_diff(
        self,
        image,
        pointcloud,
        instruction: str,
        cur_robot_state=None,
        unnorm_key: Optional[str] = None,
        num_ddim_steps: Optional[int] = None,
        use_ddim: bool = True,
        cfg_scale: float = 0.0,
        seed: int = 0,
        input_ids: Optional[np.ndarray] = None,
        noise: Optional[np.ndarray] = None,
        sampler: str = "ddim",
        num_dpm_steps: int = 4,
        return_normalized: bool = False,
    ) -> np.ndarray:
        """Reference predict_action_diff (model_mla.py:592-775): DDIM-8
        denoise of a [horizon, action_dim] chunk, q01/q99 unnormalized.
        `noise` overrides the seed-derived initial x_T (golden-parity runs
        replay the reference's recorded torch.randn draw).
        `num_ddim_steps=None` uses the policy's construction-time respacing
        (default 8); an explicit value builds that DDIM respacing (e.g. 100
        as the sampler-fidelity reference, scripts/qualify_samplers.py).
        `return_normalized=True` returns the raw normalized chunk BEFORE the
        [-1,1] clip / gripper binarize / q01-q99 unnormalization — the space
        the samplers integrate in (sampler-fidelity analysis).
        sampler='dpm' uses DPM-Solver++(2M) with `num_dpm_steps` model
        evaluations — half the denoise cost of DDIM-8 at better ODE accuracy
        (beyond-parity serving mode, diffusion/dpm_solver.py)."""
        cfg = self.cfg
        if input_ids is None:
            input_ids = build_prompt_ids(self.tokenizer, instruction, mode="diff")
        images = {"front_image": _ensure_image_batch(image)}
        pc = _ensure_pc_batch(pointcloud)

        if cur_robot_state is not None:
            proprio = normalize_proprio(
                np.asarray(cur_robot_state, np.float32), self.get_proprio_stats(unnorm_key)
            )[None, None, :]
        else:
            proprio = np.zeros((1, 1, cfg.action_dim), np.float32)

        # split ids at the final 29871: prefix = ids[:-1] + BOS handling; the
        # splice point is the LAST id (the trailing 29871 left after strip)
        ids = np.asarray(input_ids)
        prefix_ids = jnp.asarray(ids[:, :-1])
        tail_ids = jnp.asarray(ids[:, -1:])

        root_key = jax.random.PRNGKey(seed)
        noise_key, sample_key = jax.random.split(root_key)
        if noise is None:
            noise = jax.random.normal(
                noise_key, (1, cfg.action_horizon, cfg.action_dim), jnp.float32
            )
        else:
            noise = jnp.asarray(noise, jnp.float32).reshape(
                1, cfg.action_horizon, cfg.action_dim
            )
        if sampler == "dpm" and not use_ddim:
            raise ValueError(
                "sampler='dpm' is an ODE sampler and conflicts with use_ddim=False "
                "(DDPM ancestral sampling); pass use_ddim=True or sampler='ddim'"
            )
        fn = self._diff_fn(
            int(prefix_ids.shape[1]), 1, use_ddpm=not use_ddim,
            cfg_scale=cfg_scale, sampler=sampler, num_dpm_steps=num_dpm_steps,
            num_ddim_steps=num_ddim_steps,
        )
        samples = fn(
            self.params, self.state, prefix_ids, tail_ids, images, pc,
            jnp.asarray(proprio), noise, sample_key,
        )
        normalized = np.asarray(samples[0])  # [horizon, action_dim]
        if return_normalized:
            return normalized
        return unnormalize_actions(normalized, self.get_action_stats(unnorm_key))

    def predict_action_diff_batched(
        self,
        images,        # [B, 4, H, W]
        pointclouds,   # [B, P, 3]
        instruction: Optional[str] = None,
        unnorm_key: Optional[str] = None,
        seed: int = 0,
        input_ids: Optional[np.ndarray] = None,   # [1, L] shared or [B, L] per-row
        cur_robot_states=None,  # [B, action_dim] array, or list with per-row None
        sampler: str = "ddim",
        num_dpm_steps: int = 4,
        num_ddim_steps: Optional[int] = None,
        return_normalized: bool = False,
    ) -> np.ndarray:
        """Batched diffusion serving (throughput mode): one prefill + denoise
        for B observations — weight reads amortize across the batch
        (bench.py `batch_chunks_per_sec`; the compound batched-DPM-4 mode is
        `sampler="dpm"`). Prompts may differ per row as long as they share a
        token length (the splice layout is static per graph); pass `input_ids`
        as [B, L], or a single `instruction` / [1, L] row to broadcast.
        `cur_robot_states` rows may be None (no proprio for that request ->
        normalized zero, identical to the solo predict path).
        `return_normalized` as in predict_action_diff (pre-clip/-unnorm).
        Returns [B, horizon, action_dim]."""
        return self.dispatch_action_diff_batched(
            images, pointclouds, instruction,
            unnorm_key=unnorm_key, seed=seed, input_ids=input_ids,
            cur_robot_states=cur_robot_states, sampler=sampler,
            num_dpm_steps=num_dpm_steps, num_ddim_steps=num_ddim_steps,
            return_normalized=return_normalized,
        )()

    def dispatch_action_diff_batched(
        self,
        images,
        pointclouds,
        instruction: Optional[str] = None,
        unnorm_key: Optional[str] = None,
        seed: int = 0,
        input_ids: Optional[np.ndarray] = None,
        cur_robot_states=None,  # [B, action_dim] array, or list with per-row None
        sampler: str = "ddim",
        num_dpm_steps: int = 4,
        num_ddim_steps: Optional[int] = None,
        return_normalized: bool = False,
    ):
        """Asynchronous form of `predict_action_diff_batched`: enqueues the
        device call (JAX dispatch is async) and returns a zero-arg `finalize`
        callable that blocks on the result and unnormalizes. Lets a serving
        host dispatch batch N+1 while batch N still executes on the chip
        (`mla_tpu.serving.BatchingServer` depth-2 pipelining)."""
        cfg = self.cfg
        if input_ids is None:
            if instruction is None:
                raise ValueError("pass either instruction or input_ids")
            input_ids = build_prompt_ids(self.tokenizer, instruction, mode="diff")
        B = images.shape[0]
        ids = np.asarray(input_ids)
        if ids.shape[0] == 1 and B > 1:
            ids = np.repeat(ids, B, axis=0)
        if ids.shape[0] != B:
            raise ValueError(f"input_ids rows {ids.shape[0]} != batch {B}")
        prefix_ids = jnp.asarray(ids[:, :-1])
        tail_ids = jnp.asarray(ids[:, -1:])
        if cur_robot_states is not None and any(
            s is not None for s in cur_robot_states
        ):
            # per-row None = no proprio for that request -> NORMALIZED zero,
            # exactly what the solo predict path uses; normalizing a raw zero
            # instead would make a request's result depend on which batch it
            # coalesced into (asymmetric q01/q99 stats shift raw 0). Stats
            # are fetched only when some row needs them: an all-None list
            # must behave exactly like cur_robot_states=None (no proprio
            # stats required).
            pstats = self.get_proprio_stats(unnorm_key)
            proprio = jnp.asarray(np.stack([
                normalize_proprio(np.asarray(s, np.float32), pstats)
                if s is not None
                else np.zeros(cfg.action_dim, np.float32)
                for s in cur_robot_states
            ])[:, None, :])
        else:
            proprio = jnp.zeros((B, 1, cfg.action_dim), jnp.float32)
        noise_key, sample_key = jax.random.split(jax.random.PRNGKey(seed))
        noise = jax.random.normal(noise_key, (B, cfg.action_horizon, cfg.action_dim), jnp.float32)
        fn = self._diff_fn(
            int(prefix_ids.shape[1]), 1, use_ddpm=False,
            sampler=sampler, num_dpm_steps=num_dpm_steps,
            num_ddim_steps=num_ddim_steps,
        )
        samples = fn(
            self.params, self.state, prefix_ids, tail_ids,
            {"front_image": jnp.asarray(images)}, jnp.asarray(pointclouds),
            proprio, noise, sample_key,
        )

        def finalize() -> np.ndarray:
            out = np.asarray(samples)   # blocks until the device call completes
            if return_normalized:
                return out
            stats = self.get_action_stats(unnorm_key)
            return np.stack([unnormalize_actions(out[b], stats) for b in range(B)])

        return finalize

    def predict_action_ar(
        self,
        image,
        pointcloud,
        instruction: str,
        unnorm_key: Optional[str] = None,
        input_ids: Optional[np.ndarray] = None,
        return_probs: bool = False,
    ) -> np.ndarray:
        """Reference predict_action_ar (model_mla.py:494-589): greedy decode
        of action_dim discretized tokens, decoded through the action
        tokenizer and unnormalized. With `return_probs`, also returns the
        per-token max softmax confidences (model_mla.py:895-907)."""
        cfg = self.cfg
        if input_ids is None:
            input_ids = build_prompt_ids(self.tokenizer, instruction, mode="ar")
        images = {"front_image": _ensure_image_batch(image)}
        pc = _ensure_pc_batch(pointcloud)
        proprio = np.zeros((1, 1, cfg.action_dim), np.float32)

        fn = self._ar_fn(int(input_ids.shape[1]), cfg.action_dim)
        toks, probs = fn(
            self.params, self.state, jnp.asarray(input_ids), images, pc, jnp.asarray(proprio)
        )
        token_ids = np.asarray(toks[0])
        normalized = self.action_tokenizer.decode_token_ids_to_actions(token_ids)
        actions = unnormalize_actions(normalized, self.get_action_stats(unnorm_key))
        if return_probs:
            return actions, [float(p) for p in np.asarray(probs[0])]
        return actions

    def generate_text(
        self,
        image,
        pointcloud,
        prompt: str,
        max_new_tokens: int = 64,
        input_ids: Optional[np.ndarray] = None,
        num_beams: int = 1,
        temperature: float = 0.0,
        top_k: int = 0,
        length_penalty: float = 1.0,
        seed: int = 0,
    ) -> str:
        """Multimodal text generation (reference PrismaticVLM.generate,
        prismatic.py:1195-1295, which routes through HF GenerationMixin):
        greedy by default, sampled with temperature/top_k, or beam search
        with num_beams > 1 (+ HF-convention length_penalty). Output is
        truncated at the first EOS."""
        if input_ids is None:
            ids = self.tokenizer(
                f"In: {prompt}\nOut:".rstrip(), add_special_tokens=True
            )["input_ids"]
            input_ids = np.asarray([ids], np.int32)
        images = {"front_image": _ensure_image_batch(image)}
        pc = _ensure_pc_batch(pointcloud)
        fn = self._gen_fn(
            int(input_ids.shape[1]), max_new_tokens, num_beams=num_beams,
            temperature=temperature, top_k=top_k, length_penalty=length_penalty,
        )
        toks = np.asarray(
            fn(self.params, self.state, jnp.asarray(input_ids), images, pc,
               jax.random.PRNGKey(seed))[0]
        )[0]
        return self._decode_to_eos(toks)

    def _decode_to_eos(self, toks: np.ndarray) -> str:
        eos = np.nonzero(toks == EOS_ID)[0]
        if len(eos):
            toks = toks[: eos[0]]
        if self.tokenizer is None:
            return " ".join(str(t) for t in toks)
        return self.tokenizer.decode(toks)

    def generate_text_batch(
        self,
        images,
        pointclouds,
        prompts: List[str],
        max_new_tokens: int = 64,
        num_beams: int = 1,
        temperature: float = 0.0,
        top_k: int = 0,
        length_penalty: float = 1.0,
        seed: int = 0,
    ) -> List[str]:
        """Batched multimodal generation (reference generate_batch,
        prismatic.py:1246-1295). TPU shape discipline: rows are grouped by
        prompt token length and each group runs as ONE batched graph (same
        static-shape bucketing the serving host uses) — padding prompts
        instead would shift the static splice layout. Beam search batches
        too (beams ride the flattened [B*K] batch axis)."""
        n = len(prompts)
        ids_list = [
            np.asarray(
                [self.tokenizer(f"In: {p}\nOut:".rstrip(), add_special_tokens=True)["input_ids"]],
                np.int32,
            )
            for p in prompts
        ]
        groups: Dict[int, list] = {}
        for i, ids in enumerate(ids_list):
            groups.setdefault(int(ids.shape[1]), []).append(i)
        out: List[Optional[str]] = [None] * n
        for L, rows in groups.items():
            images_b = {
                "front_image": jnp.concatenate(
                    [_ensure_image_batch(images[i]) for i in rows], axis=0
                )
            }
            pc_b = jnp.concatenate([_ensure_pc_batch(pointclouds[i]) for i in rows], axis=0)
            ids_b = jnp.asarray(np.concatenate([ids_list[i] for i in rows], axis=0))
            fn = self._gen_fn(
                L, max_new_tokens, num_beams=num_beams, temperature=temperature,
                top_k=top_k, length_penalty=length_penalty,
            )
            toks = np.asarray(
                fn(self.params, self.state, ids_b, images_b, pc_b,
                   jax.random.PRNGKey(seed))[0]
            )
            for j, i in enumerate(rows):
                out[i] = self._decode_to_eos(toks[j])
        return out  # type: ignore[return-value]

    def predict_action_diff_ar(
        self,
        front_image,
        pointcloud,
        instruction: str,
        cur_robot_state=None,
        unnorm_key: Optional[str] = None,
        num_ddim_steps: int = 8,
        seed: int = 0,
        sampler: str = "ddim",
        num_dpm_steps: int = 4,
    ) -> Dict[str, Any]:
        """Run BOTH heads (reference predict_action_diff_ar,
        model_mla.py:778-991): autoregressive token decode for a fast/
        confident single action + diffusion denoise for the smooth chunk,
        returning per-phase wall-clock timings like the reference. The
        diffusion chunk honors the same sampler selection as
        predict_action_diff (sampler='dpm' for the DPM-4 serving mode)."""
        import time as _time

        ar_ids = build_prompt_ids(self.tokenizer, instruction, mode="ar")
        t0 = _time.perf_counter()
        ar_actions, ar_max_probs = self.predict_action_ar(
            front_image, pointcloud, instruction, unnorm_key=unnorm_key, input_ids=ar_ids,
            return_probs=True,
        )
        t_ar = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        diff_actions = self.predict_action_diff(
            front_image, pointcloud, instruction, cur_robot_state=cur_robot_state,
            unnorm_key=unnorm_key, num_ddim_steps=num_ddim_steps, seed=seed,
            sampler=sampler, num_dpm_steps=num_dpm_steps,
        )
        t_diff = _time.perf_counter() - t0
        return {
            "actions": diff_actions,
            "ar_actions": ar_actions,
            # per-token AR confidences over the action_dim decode steps
            # (reference model_mla.py:901-907 `max_probs`)
            "ar_max_probs": ar_max_probs[-self.cfg.action_dim:],
            "timings": [t_ar, t_diff],
        }

    def predict_action_batch(
        self,
        images,
        pointclouds,
        instructions,
        action_model_params=None,
        action_model_cfg=None,
        unnorm_key: Optional[str] = None,
        cfg_scale: float = 1.5,
        num_ddim_steps: int = 10,
        seed: int = 0,
    ) -> np.ndarray:
        """Legacy CogACT path (reference model_mla.py:993-1164): condition a
        STANDALONE DiT action head on the LLM's last cognition feature and
        denoise a batch of action chunks. Requires an `action_model`
        (models/action_model.py) params+config pair."""
        from mla_tpu.models import action_model as am

        if action_model_params is None:
            raise ValueError("predict_action_batch requires action_model params")
        B = len(instructions)
        ids_list = [build_prompt_ids(self.tokenizer, ins, mode="ar") for ins in instructions]
        L = max(x.shape[1] for x in ids_list)
        ids = np.full((B, L), 32000, np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : x.shape[1]] = x[0]
        images_b = {"front_image": jnp.asarray(np.stack([np.asarray(im) for im in images]))}
        pc_b = jnp.asarray(np.stack([np.asarray(p) for p in pointclouds]))

        prefix = build_prefix_embeds(
            self.params, self.state, self.cfg, jnp.asarray(ids), images_b, pc_b
        )
        # cognition feature: last hidden at the final position (no KV cache
        # needed — the external DiT conditions on a single token)
        decoder = prismatic.get_decoder(self.cfg)
        out = decoder.forward(
            self.params["llm_backbone"], self.cfg.llama, prefix, compute_logits=False
        )
        z = out["last_hidden"][:, -1:, :].astype(jnp.float32)  # [B,1,token]

        sched = gd.create_schedule(f"ddim{num_ddim_steps}", diffusion_steps=100)
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, (B, self.cfg.action_horizon, self.cfg.action_dim))
        if cfg_scale > 1.0:
            z_all = jnp.concatenate(
                [z, jnp.broadcast_to(action_model_params["uncondition"][None], z.shape)], axis=0
            )
            noise2 = jnp.concatenate([noise, noise], axis=0)
            denoise = lambda x, t: am.dit_forward_with_cfg(
                action_model_params, action_model_cfg, x, t, z_all, cfg_scale
            )
            samples = gd.ddim_sample_loop(sched, denoise, noise2, eta=0.0)[:B]
        else:
            denoise = lambda x, t: am.dit_forward(action_model_params, action_model_cfg, x, t, z)
            samples = gd.ddim_sample_loop(sched, denoise, noise, eta=0.0)
        return unnormalize_actions(np.asarray(samples), self.get_action_stats(unnorm_key))


def _ensure_image_batch(image) -> jnp.ndarray:
    """Accepts [4,672,672] or [B,4,672,672] (RGB+mask, CLIP-normalized)."""
    arr = jnp.asarray(image)
    if arr.ndim == 3:
        arr = arr[None]
    return arr


def _ensure_pc_batch(pc) -> Optional[jnp.ndarray]:
    if pc is None:
        return None
    arr = jnp.asarray(pc)
    if arr.ndim == 2:
        arr = arr[None]
    return arr
