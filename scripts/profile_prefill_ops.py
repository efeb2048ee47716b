"""Per-op breakdown of the serving prefill (the 24 ms / ~55-75% MFU phase).

The 534-token prefill is nominally MXU-compute-bound: 2 * 6.48e9 int8
weights * 534 tokens = 6.9e12 int-ops = 17.6 ms at the v5e's 394 TOPS int8
peak. The measured 24 ms leaves ~6 ms of residue; the suspected sink is the
XLA attention path materializing the [B,H,534,534] fp32 score tensor in HBM
(~36 MB/layer written+read ≈ 4-5 ms over 32 layers), which a flash kernel
keeps in VMEM. Variant graphs:

  dots_only        — the 32x4 fused W8A8 matmuls chained at S=534
  attn_xla         — 32 einsum+softmax attention blocks (sdpa_reference)
  attn_flash       — 32 Pallas flash blocks (bf16 MXU dots, fp32 acc)
  prefill_xla      — the real prefill graph, use_flash=False
  prefill_flash    — the real prefill graph, use_flash=True

Methodology as scripts/profile_suffix_ops.py: device-resident args (weights
as jit ARGS), one fp32 scalar fetched via device_get, inputs perturbed per
call, trivial-op RTT subtracted. Results in docs/kernels.md.

Usage: python scripts/profile_prefill_ops.py [--iters 10] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup, freezing env-derived config defaults) — the
# helper force-enables the cache via jax.config.update. Kept env vars above
# so spawned subprocesses inherit them at startup, where they DO work.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mla-7b-int8")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prefix_len", type=int, default=534)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_policy
    from mla_tpu import nn
    from mla_tpu.models import mla as mla_mod
    from mla_tpu.ops import attention as attn_ops

    policy, cfg = build_policy(args.model)
    params = policy.params
    lcfg = cfg.llama
    L, D, H, hd = lcfg.num_layers, lcfg.hidden_size, lcfg.num_heads, lcfg.head_dim

    B, P = args.batch, args.prefix_len
    cache_max = P + (2 + cfg.action_horizon) + 1 + policy.cache_margin

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(B, P, D)) * 0.02, lcfg.compute_dtype)
    qkv0 = jnp.asarray(rng.normal(size=(B, H, P, hd)) * 0.3, lcfg.compute_dtype)
    lp = params["llm_backbone"]["layers"]

    # ---- variant graphs (weights as jit ARGS, never captured constants) ----
    def dots_only(h, lp):
        for i in range(L):
            qkv = nn.linear({k: v[i] for k, v in lp["attn"]["qkv_fused"].items()}, h)
            h = qkv[..., :D]
            h = nn.linear({k: v[i] for k, v in lp["attn"]["o"].items()}, h)
            gu = nn.linear({k: v[i] for k, v in lp["mlp"]["gateup_fused"].items()}, h)
            I = gu.shape[-1] // 2
            h = nn.linear({k: v[i] for k, v in lp["mlp"]["down"].items()}, gu[..., :I])
        return h.astype(jnp.float32).sum()

    def attn_chain(q, use_flash):
        # 32 chained attention blocks on fixed-size q/k/v; the output of one
        # feeds the next so XLA cannot elide any block
        h = q
        for _ in range(L):
            h = attn_ops.sdpa(h, h, h, causal=True, use_flash=use_flash)
        return h.astype(jnp.float32).sum()

    def attn_bf16s_chain(q):
        # candidate lever: keep the [B,H,S,S] score tensor in bf16 (softmax
        # reductions still fp32) — halves the score-materialization HBM
        # traffic that makes up most of the XLA attention residue
        import math
        h = q
        scale = 1.0 / math.sqrt(hd)
        cm = (jnp.arange(P)[None, :] <= jnp.arange(P)[:, None])[None, None]
        for _ in range(L):
            s = jnp.einsum("bhqd,bhkd->bhqk", h, h) * scale       # bf16 scores
            s = jnp.where(cm, s, jnp.asarray(-jnp.inf, s.dtype))
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
            h = jnp.einsum("bhqk,bhkd->bhqd", p, h)
        return h.astype(jnp.float32).sum()

    def prefill_graph(use_flash):
        def fn(prefix_embeds, params):
            kv, _ = mla_mod.prefill(
                params, cfg, prefix_embeds, cache_max, compute_logits=False,
                use_flash=use_flash,
            )
            return kv["k"].astype(jnp.float32)[..., 0, 0].sum()
        return fn

    # ---- timing harness (see profile_suffix_ops.py) -------------------------
    def timeit(fn, *a, vary):
        jfn = jax.jit(fn)
        aa = list(a)
        float(jax.device_get(jfn(*aa)))
        ts = []
        for i in range(args.iters):
            aa = list(a)
            dt = aa[vary].dtype
            # multiplicative perturbation: an ADDITIVE epsilon rounds away in
            # bf16 at O(0.1) magnitudes, leaving the input bit-identical and
            # letting the remote execution layer serve the call from its
            # result cache (measured as a fake 0.0 ms phase)
            aa[vary] = aa[vary] * np.asarray(1.0 + (i + 1) * 2.0**-7, dt)
            jax.block_until_ready(aa[vary])
            st = time.perf_counter()
            float(jax.device_get(jfn(*aa)))
            ts.append(time.perf_counter() - st)
        return float(np.percentile(ts, 50) * 1e3)

    t_null = timeit(lambda a: (a * 2).sum(), jnp.zeros((8, 128), jnp.float32), vary=0)
    net = lambda t: max(t - t_null, 0.0)

    results = {"model": args.model, "backend": jax.default_backend(),
               "batch": B, "prefix_len": P,
               "dispatch_rtt_ms": round(t_null, 2)}

    def iter_wq(tree):
        if isinstance(tree, dict):
            if "w_q" in tree:
                yield tree["w_q"]
            else:
                for v in tree.values():
                    yield from iter_wq(v)

    wq_bytes = sum(int(np.prod(w.shape)) for w in iter_wq(lp))
    results["mxu_floor_ms"] = round(2 * wq_bytes * B * P / 394e12 * 1e3, 2)

    results["dots_only_ms"] = round(net(timeit(dots_only, h0, lp, vary=0)), 2)
    results["attn_xla_ms"] = round(net(timeit(lambda q: attn_chain(q, False), qkv0, vary=0)), 2)
    try:
        results["attn_flash_ms"] = round(net(timeit(lambda q: attn_chain(q, True), qkv0, vary=0)), 2)
    except Exception as e:
        print(f"attn_flash failed: {type(e).__name__}: {e}", file=sys.stderr)
        results["attn_flash_ms"] = None
    results["attn_bf16s_ms"] = round(net(timeit(attn_bf16s_chain, qkv0, vary=0)), 2)
    results["prefill_xla_ms"] = round(net(timeit(prefill_graph(False), h0, params, vary=0)), 2)
    try:
        results["prefill_flash_ms"] = round(net(timeit(prefill_graph(True), h0, params, vary=0)), 2)
    except Exception as e:
        print(f"prefill_flash failed: {type(e).__name__}: {e}", file=sys.stderr)
        results["prefill_flash_ms"] = None

    if results["prefill_xla_ms"]:
        results["residue_xla_vs_parts_ms"] = round(
            results["prefill_xla_ms"] - results["dots_only_ms"] - results["attn_xla_ms"], 2
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
