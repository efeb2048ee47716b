"""On-chip Pallas kernel revalidation (VERDICT r3 item 2).

Interpret mode (the CPU test suite) provably does NOT catch TPU tiling
violations on this stack (CLAUDE.md), so every kernel-level change must be
re-proven on the real chip. This script runs the round-4 changes at real
shapes and prints ONE JSON line the bench attaches as
`kernel_revalidation`:

  * flash-attention forward at block_q != block_k in BOTH orders plus the
    serving-prefill sequence length (S=534, not a multiple of either
    block) — the lcm-pad fix (ops/flash_attention.py:291, commit af65d62)
    silently zeroed outputs before it;
  * flash-attention backward (custom VJP, dq + dkv kernels) at the same
    asymmetric blocks;
  * the single-program Pallas FPS kernel vs the XLA fori_loop reference
    (identical indices expected — same algorithm, same tie-breaks).

Runs on whatever backend JAX resolves; on CPU the kernels run in
interpret mode, so only a TPU run (backend=="tpu" in the JSON) counts as
revalidation. Usage: python scripts/kernel_check.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup, freezing env-derived config defaults) — the
# helper force-enables the cache via jax.config.update. Kept env vars above
# so spawned subprocesses inherit them at startup, where they DO work.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

import jax  # noqa: E402  (backend resolution stays lazy)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _reference_attention(q, k, v, mask, causal):
    """Pure-XLA fp32 attention with the same key-padding + causal masking."""
    B, H, S, hd = q.shape
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / np.sqrt(hd)
    neg = jnp.float32(-1e30)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, neg)
    if causal:
        qi = jnp.arange(S)[:, None]
        ki = jnp.arange(S)[None, :]
        scores = jnp.where((ki <= qi)[None, None], scores, neg)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def check_flash(block_q: int, block_k: int, S: int = 534) -> dict:
    from mla_tpu.ops.flash_attention import flash_attention

    B, H, hd = 2, 4, 128
    rng = np.random.default_rng(block_q * 1000 + block_k)
    q = jnp.asarray(rng.normal(size=(B, H, S, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, hd)), jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(S)[None, :] < np.array([S, S - 37])[:, None]
    )  # one full row, one padded row

    def flash_loss(q, k, v):
        o = flash_attention(q, k, v, mask=mask, causal=True,
                            block_q=block_q, block_k=block_k)
        return (o.astype(jnp.float32) ** 2).sum(), o

    def ref_loss(q, k, v):
        o = _reference_attention(q, k, v, mask, causal=True)
        return (o ** 2).sum(), o

    (_, o_f), g_f = jax.value_and_grad(flash_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (_, o_r), g_r = jax.value_and_grad(ref_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    def rel_rms(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.sqrt(np.mean((a - b) ** 2)) / max(np.sqrt(np.mean(b**2)), 1e-9))

    fwd_err = rel_rms(o_f, o_r)
    bwd_err = max(rel_rms(np.asarray(gf, np.float32), gr) for gf, gr in zip(g_f, g_r))
    # bf16 mantissa is 8 bits: ~4e-3 per-element rounding; accumulated rel
    # rms beyond 3e-2 means a real (tiling/masking) defect, not rounding
    return {
        "block_q": block_q, "block_k": block_k, "seq": S,
        "fwd_rel_rms": round(fwd_err, 5), "bwd_rel_rms": round(bwd_err, 5),
        "ok": bool(fwd_err < 3e-2 and bwd_err < 6e-2),
    }


def check_fps() -> dict:
    from mla_tpu.ops.pointops import furthest_point_sample

    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.normal(size=(4, 1024, 3)), jnp.float32)
    idx_ref = np.asarray(furthest_point_sample(xyz, 256, use_pallas=False))
    idx_pal = np.asarray(furthest_point_sample(xyz, 256, use_pallas=True))
    match = bool((idx_ref == idx_pal).all())
    return {"npoint": 256, "n": 1024, "indices_match": match, "ok": match}


def main():
    backend = jax.default_backend()
    checks = {
        "backend": backend,
        "flash_bq128_bk256": check_flash(128, 256),
        "flash_bq256_bk128": check_flash(256, 128),
        "flash_bq128_bk128": check_flash(128, 128),
        "fps_pallas": check_fps(),
    }
    checks["ok"] = all(
        v.get("ok") for v in checks.values() if isinstance(v, dict)
    )
    print(json.dumps(checks))
    return 0 if checks["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
