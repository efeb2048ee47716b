"""Per-op breakdown of the serving suffix denoise step (VERDICT r2 item #1a).

The suffix step's in-graph cost (~10.7 ms r2) sits ~30% above the 8.2 ms
int8 weight-read bound computed from the v5e's 819 GB/s SPEC bandwidth.
This script decomposes the residue with device-resident variant graphs:

  bw_sweep        — reduce over all int8 weight bytes: the chip's ACHIEVABLE
                    HBM bandwidth on these exact arrays (spec is not
                    attainable; this is the honest floor)
  dots_only       — the 32x4 fused W8A8 matmuls chained, no attention/norms:
                    dot streaming efficiency + per-dot activation quant
  dots_noquant    — same with activations pre-quantized once (static scale):
                    isolates the per-matmul activation-quant cost
  attn_only       — the 32 cache_read_only attention blocks on fixed q/k/v:
                    KV reads + softmax + masks + small einsums
  suffix_full     — the real suffix step (reference point)

Methodology as scripts/profile_serving.py: every graph reduces to one fp32
scalar fetched via device_get, inputs perturbed per call, trivial-op RTT
subtracted. Results published in docs/kernels.md.

Usage: python scripts/profile_suffix_ops.py [--iters 10]
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
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of variants to time "
                         "(bw_sweep,dots_only,dots_pallas,dots_noquant,"
                         "attn_only,suffix_full) — each variant is its own "
                         "7B compile, so flag sweeps run just suffix_full")
    ap.add_argument("--chain", type=int, default=0,
                    help="time N suffix steps CHAINED inside one dispatch "
                         "(lax.fori_loop feeding eps back as x) and report "
                         "the per-step time. The single-step probe's "
                         "RTT-subtraction is only as good as the null-op "
                         "calibration (~±3 ms drift on the dev tunnel, same "
                         "order as the 10 ms signal); chaining divides the "
                         "per-dispatch noise by N — the authoritative mode "
                         "for flag A/Bs")
    ap.add_argument("--compiler_options", default=None,
                    help="JSON dict of XLA compiler options (flag names "
                         "without leading dashes) applied to every timed "
                         "graph via jax.jit(compiler_options=...). This is "
                         "the mechanism that reaches the REMOTE TPU compile "
                         "service — host XLA_FLAGS only configures the local "
                         "CPU client, which rejects TPU-only flags outright")
    args = ap.parse_args()
    compiler_options = json.loads(args.compiler_options) if args.compiler_options else None
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_policy
    from mla_tpu import nn
    from mla_tpu.models import mla as mla_mod
    from mla_tpu.ops import rope as rope_ops

    policy, cfg = build_policy(args.model)
    params = policy.params
    lcfg = cfg.llama
    L, D, H, hd = lcfg.num_layers, lcfg.hidden_size, lcfg.num_heads, lcfg.head_dim

    B, S = 1, 2 + cfg.action_horizon          # 18-token suffix
    P = 534                                    # serving prefix length
    cache_max = P + S + 1 + policy.cache_margin

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(B, S, D)) * 0.02, lcfg.compute_dtype)
    kv = {
        "k": jnp.asarray(rng.normal(size=(L, B, lcfg.num_kv_heads, cache_max, hd)) * 0.1, lcfg.compute_dtype),
        "v": jnp.asarray(rng.normal(size=(L, B, lcfg.num_kv_heads, cache_max, hd)) * 0.1, lcfg.compute_dtype),
    }
    lp = params["llm_backbone"]["layers"]

    # ---- total int8 weight bytes on the decode path -------------------------
    def iter_wq(tree):
        if isinstance(tree, dict):
            if "w_q" in tree:
                yield tree["w_q"]
            else:
                for v in tree.values():
                    yield from iter_wq(v)

    wq_leaves = list(iter_wq(lp))
    wq_bytes = sum(int(np.prod(w.shape)) for w in wq_leaves)

    # ---- variant graphs (weights/caches are jit ARGS, never captured
    # constants — captured trees re-upload and distort timing) -------------
    def bw_sweep(bias, ws):
        # int32 partial sums keep the reduce on the VPU at stream rate
        acc = bias
        for w in ws:
            acc = acc + jnp.sum(w, dtype=jnp.int32)
        return acc.astype(jnp.float32)

    def dots_only(h, lp):
        for i in range(L):
            qkv = nn.linear({k: v[i] for k, v in lp["attn"]["qkv_fused"].items()}, h)
            h = qkv[..., :D]
            h = nn.linear({k: v[i] for k, v in lp["attn"]["o"].items()}, h)
            gu = nn.linear({k: v[i] for k, v in lp["mlp"]["gateup_fused"].items()}, h)
            I = gu.shape[-1] // 2
            h = nn.linear({k: v[i] for k, v in lp["mlp"]["down"].items()}, gu[..., :I])
        return h.astype(jnp.float32).sum()

    def dots_noquant(h, lp):
        # activations quantized ONCE outside the per-dot path: int8 x int8
        # dots with a fixed activation scale folded into the weight rescale
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) / 0.01), -127, 127).astype(jnp.int8)
        for i in range(L):
            def dot(leaf, x):
                acc = jax.lax.dot_general(
                    x, leaf["w_q"][i], (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) * 0.01 * leaf["w_scale"][i][0]
                return jnp.clip(jnp.round(y / 0.01), -127, 127).astype(jnp.int8)
            q = dot(lp["attn"]["qkv_fused"], hq)[..., :D]
            o = dot(lp["attn"]["o"], q)
            gu = dot(lp["mlp"]["gateup_fused"], o)
            hq = dot(lp["mlp"]["down"], gu[..., : lp["mlp"]["down"]["w_q"].shape[1]])
        return hq.astype(jnp.float32).sum()

    def dots_pallas(h, lp):
        # fused Pallas W8A8 kernel (quant inside the program; weights stream
        # straight to the MXU) — the round-3 candidate decode path
        from mla_tpu.ops.quantization import w8a8_matmul

        M = h.shape[0] * h.shape[1]
        for i in range(L):
            def dot(leaf, x):
                return w8a8_matmul(
                    x.reshape(M, -1), leaf["w_q"][i], leaf["w_scale"][i]
                ).reshape(x.shape[:-1] + (leaf["w_q"].shape[-1],))
            qkv = dot(lp["attn"]["qkv_fused"], h)
            h = dot(lp["attn"]["o"], qkv[..., :D])
            gu = dot(lp["mlp"]["gateup_fused"], h)
            I = gu.shape[-1] // 2
            h = dot(lp["mlp"]["down"], gu[..., :I])
        return h.astype(jnp.float32).sum()

    def attn_only(h, kv):
        cos_table, sin_table = rope_ops.rope_tables(hd, lcfg.max_position_embeddings, lcfg.rope_theta)
        positions = jnp.arange(S) + P
        key_mask = (jnp.arange(cache_max) < P + S)[None, :].repeat(B, axis=0)
        acc = jnp.float32(0.0)
        qkv_w = jnp.zeros((1,))
        for i in range(L):
            q = h.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
            k = h.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
            v = h.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
            q, k = rope_ops.apply_rope(q, k, jnp.asarray(cos_table), jnp.asarray(sin_table), positions)
            k_cache, v_cache = kv["k"][i], kv["v"][i]
            scale = 1.0 / np.sqrt(hd)
            s_cache = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache, preferred_element_type=jnp.float32) * scale
            cache_pos = jnp.arange(cache_max)
            stale = cache_pos[None, None, None, :] >= P
            stale = stale | ~key_mask[:, None, None, :]
            s_cache = jnp.where(stale, -jnp.inf, s_cache)
            s_new = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
            qi = jnp.arange(S)[:, None]
            ki = jnp.arange(S)[None, :]
            s_new = jnp.where((ki > qi)[None, None], -jnp.inf, s_new)
            attn = jax.nn.softmax(jnp.concatenate([s_cache, s_new], axis=-1), axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn[..., :cache_max], v_cache) + jnp.einsum(
                "bhqk,bhkd->bhqd", attn[..., cache_max:], v
            )
            h = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return h.astype(jnp.float32).sum()

    def suffix_full(x, t, params, kv):
        proprio = jnp.zeros((B, 1, cfg.action_dim), jnp.float32)
        tail = jnp.zeros((B, 1), jnp.int32)
        fn = mla_mod.make_suffix_denoise_fn(params, cfg, kv, P, proprio, tail)
        if args.chain:
            # eps has x's shape: feed it back so every step is loop-carried
            # (nothing elidable) — mirrors the real sampler's data flow
            out = jax.lax.fori_loop(
                0, args.chain, lambda i, xx: fn(xx, t + i), x)
            return out.sum()
        return fn(x, t).sum()

    # ---- timing harness ------------------------------------------------------
    def timeit(fn, *a, vary):
        jfn = jax.jit(fn, compiler_options=compiler_options)
        aa = list(a)
        float(jax.device_get(jfn(*aa)))
        ts = []
        for i in range(args.iters):
            aa = list(a)
            # perturb in the SAME dtype (a promoting add would change the graph)
            dt = aa[vary].dtype
            if np.issubdtype(dt, np.integer):
                aa[vary] = aa[vary] + np.asarray(i + 1, dt)
            else:
                aa[vary] = aa[vary] + np.asarray((i + 1) * 1e-6, dt)
            jax.block_until_ready(aa[vary])
            st = time.perf_counter()
            float(jax.device_get(jfn(*aa)))
            ts.append(time.perf_counter() - st)
        return float(np.percentile(ts, 50) * 1e3)

    t_null = timeit(lambda a: (a * 2).sum(), jnp.zeros((8, 128), jnp.float32), vary=0)
    net = lambda t: max(t - t_null, 0.0)

    t_bw = net(timeit(bw_sweep, jnp.int32(0), wq_leaves, vary=0)) if want("bw_sweep") else None
    t_dots = net(timeit(dots_only, h0, lp, vary=0)) if want("dots_only") else None
    t_pallas = None
    if want("dots_pallas"):
        try:
            t_pallas = net(timeit(dots_pallas, h0, lp, vary=0))
        except Exception as e:
            print(f"dots_pallas failed: {type(e).__name__}: {e}", file=sys.stderr)
    t_noq = net(timeit(dots_noquant, h0, lp, vary=0)) if want("dots_noquant") else None
    t_attn = net(timeit(attn_only, h0, kv, vary=0)) if want("attn_only") else None
    t_suffix = None
    if want("suffix_full"):
        x0 = jnp.asarray(rng.normal(size=(B, cfg.action_horizon, cfg.action_dim)), jnp.float32)
        t_suffix = net(timeit(suffix_full, x0, jnp.full((B,), 99, jnp.int32), params, kv, vary=0))
        if args.chain:
            t_suffix /= args.chain

    kv_bytes = 2 * L * B * lcfg.num_kv_heads * cache_max * hd * 2

    r = lambda t: round(t, 2) if t is not None else None  # noqa: E731
    print(json.dumps({
        "model": args.model, "backend": jax.default_backend(),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "libtpu_init_args": os.environ.get("LIBTPU_INIT_ARGS", ""),
        "compiler_options": compiler_options,
        "chain": args.chain or None,
        "dispatch_rtt_ms": round(t_null, 2),
        "weight_bytes_gb": round(wq_bytes / 1e9, 2),
        "bw_sweep_ms": r(t_bw),
        "achieved_gbps": round(wq_bytes / t_bw / 1e6, 1) if t_bw else None,
        "spec_floor_ms": round(wq_bytes / 819e9 * 1e3, 2),
        "dots_only_ms": r(t_dots),
        "dots_pallas_ms": r(t_pallas),
        "dots_noquant_ms": r(t_noq),
        "attn_only_ms": r(t_attn),
        "kv_read_floor_ms": round(kv_bytes / 819e9 * 1e3, 2),
        "suffix_full_ms": r(t_suffix),
        "residue_vs_parts_ms": round(t_suffix - t_dots - t_attn, 2)
        if None not in (t_suffix, t_dots, t_attn) else None,
    }))


if __name__ == "__main__":
    main()
