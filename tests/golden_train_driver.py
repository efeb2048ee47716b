"""Subprocess driver for the TRAINING-loss golden parity test.

Builds the reference MLA at reduced LLM size (9 layers — the reference
hardcodes the contrastive hook at hidden_states[8], modeling_llama.py:1274)
with pointcloud + contrastive ON, runs ONE reference training forward
(MLA.forward, model_mla.py:118-276) on a pinned batch with recorded
noise/timestep draws, exports the checkpoint, and replays the same forward
through OUR mla_train_loss — pinning the training splice (at the last EOS id
2), the repeated-diffusion-steps batch semantics, q_sample, the noise-pred
extraction span, and the coordinate-contrastive loss computed on hidden[8]
with the converted projection heads.

Reference quirks handled (beyond the inference driver's list):
  * the diff-training branch requires module training mode AND
    unconditionally calls the generation visualization with a hardcoded
    absolute path (prismatic.py:1129-1135) — stubbed out;
  * `loss_dict['total_loss']` and `['diff_loss']` alias ONE tensor
    (model_mla.py:218-221), so the in-place `+=` of the contrastive terms
    contaminates the logged diff_loss — the true diff MSE is
    total - contrastive, which is what our (non-aliased) diff_loss is
    compared against.

Prints one line of JSON with relative errors.
"""

from __future__ import annotations

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

# see golden_e2e_driver.py: the axon plugin registers at interpreter startup,
# and only a post-import config update reliably pins the platform to CPU
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

B, REP, L = 2, 2, 24


def make_batch(rng, np):
    from mla_tpu.vla.datasets import add_mask_channel, clip_preprocess

    # training-layout ids: [BOS, prompt..., 29871, <BOD>, <EOD>, 29871,
    # 7 action ids, EOS(2)] — the splice anchors at the LAST id 2
    ids = np.zeros((B, L), np.int64)
    ids[:, 0] = 1
    ids[:, 1:12] = rng.integers(1000, 1040, size=(B, 11))
    ids[:, 12] = 29871
    ids[:, 13] = 32001
    ids[:, 14] = 32002
    ids[:, 15] = 29871
    ids[:, 16:23] = rng.integers(31744, 32000, size=(B, 7))
    ids[:, 23] = 2
    labels = np.full((B, L), -100, np.int64)
    labels[:, 16:24] = ids[:, 16:24]
    imgs = np.stack([
        add_mask_channel(clip_preprocess(
            rng.integers(0, 255, size=(672, 672, 3), dtype=np.uint8), 672
        ))
        for _ in range(B)
    ])
    return {
        "ids": ids, "labels": labels, "imgs": imgs,
        "attention_mask": np.ones((B, L), bool),
        "pc": rng.uniform([-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(B, 1024, 3)).astype(np.float32),
        "actions": rng.uniform(-1, 1, size=(B, 16, 7)).astype(np.float32),
        "proprio": rng.uniform(-1, 1, size=(B, 1, 7)).astype(np.float32),
    }


def run_reference(workdir, data):
    import numpy as np
    import torch

    from tests import ref_harness as rh

    mla, tok = rh.build_reference_mla(
        use_pointcloud=True, use_contrastive=True, layers=9
    )
    mla = mla.to(torch.bfloat16)
    mla.train()
    import models.vlm.prismatic as ref_prismatic

    ref_prismatic.visualize_generation_simple = lambda *a, **k: None

    rec = {}
    orig_randn_like = torch.randn_like
    orig_randint = torch.randint

    def rec_randn_like(x, *a, **k):
        out = orig_randn_like(x.float(), *a, **k)
        rec["noise"] = out.detach().float().cpu().numpy().copy()
        return out.to(x.dtype)

    def rec_randint(*a, **k):
        out = orig_randint(*a, **k)
        rec["t"] = out.detach().cpu().numpy().copy()
        return out

    torch.randn_like = rec_randn_like
    torch.randint = rec_randint
    torch.manual_seed(11)
    try:
        with torch.autocast("cpu", dtype=torch.bfloat16):
            loss_dict, _ = mla.forward(
                input_ids=torch.tensor(data["ids"]),
                attention_mask=torch.tensor(data["attention_mask"]),
                images=torch.tensor(data["imgs"]),
                point_cloud=torch.tensor(data["pc"]),
                labels=torch.tensor(data["labels"]),
                actions=torch.tensor(data["actions"]),
                proprio=torch.tensor(data["proprio"]),
                action_masks=torch.ones(B, 7),
                camera_name="rlbench_front",
                repeated_diffusion_steps=REP,
            )
    finally:
        torch.randn_like = orig_randn_like
        torch.randint = orig_randint

    rh.export_reference_run_dir(mla, workdir)
    return (
        {k: float(v) for k, v in loss_dict.items()},
        rec["noise"], rec["t"], tok,
    )


def run_ours(workdir, data, noise, t, tok):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mla_tpu.diffusion import gaussian as gd
    from mla_tpu.models import mla as mla_mod
    from mla_tpu.models.load import load_vla

    params, state, cfg, _ = load_vla(
        workdir, model_id="mla-golden", tokenizer=tok, load_for_training=True,
        num_layers=9, contrastive_layer=8,
    )
    ids = data["ids"].astype(np.int32)
    splice_idx = np.array([np.where(row == 2)[0][-1] for row in ids], np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(data["attention_mask"]),
        "labels": jnp.asarray(data["labels"].astype(np.int32)),
        "splice_idx": jnp.asarray(splice_idx),
        "images": {"front_image": jnp.asarray(data["imgs"])},
        "point_cloud": jnp.asarray(data["pc"]),
        "actions": jnp.asarray(data["actions"]),
        "proprio": jnp.asarray(data["proprio"]),
    }
    sched = gd.create_schedule("", diffusion_steps=100)
    _, (loss_dict, _) = mla_mod.mla_train_loss(
        params, state, cfg, sched, batch, jax.random.PRNGKey(0),
        repeated_diffusion_steps=REP, remat=False,
        override_noise=noise, override_t=t,
    )
    return {k: float(v) for k, v in loss_dict.items()}


def main():
    import tempfile

    import numpy as np

    rng = np.random.default_rng(7)
    data = make_batch(rng, np)
    workdir = tempfile.mkdtemp(prefix="golden_train_")
    ref_losses, noise, t, tok = run_reference(workdir, data)
    ours = run_ours(workdir, data, noise, t, tok)

    ref_total = ref_losses["total_loss"]
    ref_contr = ref_losses["img_pc_contrastive_loss"]
    ref_diff_true = ref_total - ref_contr  # aliasing bug, see module docstring
    result = {
        "ref_total": ref_total, "ref_contrastive": ref_contr,
        "ours_total": ours["total_loss"],
        "total_rel_err": abs(ours["total_loss"] - ref_total) / max(ref_total, 1e-6),
        "diff_rel_err": abs(ours["diff_loss"] - ref_diff_true) / max(ref_diff_true, 1e-6),
        "contrastive_rel_err": abs(ours["img_pc_contrastive_loss"] - ref_contr) / max(ref_contr, 1e-6),
    }
    print("GOLDEN_TRAIN_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
