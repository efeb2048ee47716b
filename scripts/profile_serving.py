"""Phase profiler for the serving hot path (predict_action_diff).

Splits the end-to-end chunk latency into its three phases, each timed as its
own jitted graph with device-resident inputs:

  1. front-end  — build_prefix_embeds (vision tokenizer + point tokenizer +
                  projectors + text embed concat)
  2. prefill    — ~530-token decoder forward writing the KV cache
  3. suffix x8  — one 19-token denoise forward against the cached prefix
                  (the DDIM-8 loop pays this 8 times)

Timing methodology (hard-won on this dev box, where the chip sits behind a
network tunnel):
  * every phase graph is reduced to ONE fp32 scalar and timed with
    `float(jax.device_get(...))` — on the tunnel backend `block_until_ready`
    returns before execution finishes, and identical (executable, inputs)
    pairs are served from a result cache, so each timed call also perturbs
    one input;
  * a trivial-op scalar fetch measures the fixed dispatch RTT (~25 ms) which
    is subtracted from every phase ("net" numbers).

Published numbers live in docs/kernels.md ("Serving path findings").

Usage:  python scripts/profile_serving.py [--model mla-7b-int8] [--iters 10]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_policy
    from mla_tpu.models import mla as mla_mod

    policy, cfg = build_policy(args.model)
    params, state = policy.params, policy.state

    B = args.batch
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    img = np.concatenate(
        [rng.normal(size=(B, 3, size, size)).astype(np.float32), np.ones((B, 1, size, size), np.float32)],
        axis=1,
    )
    pc = rng.uniform(
        [-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(B, cfg.point.input_points, 3)
    ).astype(np.float32)
    ids = np.concatenate([[1], rng.integers(100, 20000, 20), [29871]]).astype(np.int32)
    prefix_ids = jnp.asarray(np.tile(ids[None, :-1], (B, 1)))
    tail_ids = jnp.asarray(np.tile(ids[None, -1:], (B, 1)))
    images_d = {"front_image": jnp.asarray(img)}
    pc_d = jnp.asarray(pc)
    proprio_d = jnp.zeros((B, 1, cfg.action_dim), jnp.float32)
    key = jax.random.PRNGKey(0)

    prefix_len_tokens = prefix_ids.shape[1] + cfg.fused_len
    suffix_len = 2 + cfg.action_horizon + tail_ids.shape[1]
    cache_max = prefix_len_tokens + suffix_len

    def tree_sum(t):
        leaves = [l.astype(jnp.float32).sum() for l in jax.tree_util.tree_leaves(t)]
        return sum(leaves[1:], leaves[0])

    # --- phase graphs (each reduced to one scalar) --------------------------
    @jax.jit
    def frontend_s(params, state, ids_p, images, pc):
        return tree_sum(mla_mod.build_prefix_embeds(params, state, cfg, ids_p, images, pc))

    @jax.jit
    def frontend(params, state, ids_p, images, pc):
        return mla_mod.build_prefix_embeds(params, state, cfg, ids_p, images, pc)

    @jax.jit
    def prefill_s(params, prefix_embeds):
        kv = mla_mod.prefill(params, cfg, prefix_embeds, cache_max, compute_logits=False)[0]
        return tree_sum(kv)

    @jax.jit
    def prefill_kv(params, prefix_embeds):
        return mla_mod.prefill(params, cfg, prefix_embeds, cache_max, compute_logits=False)[0]

    @jax.jit
    def suffix_s(params, kv, proprio, tail, x, t):
        fn = mla_mod.make_suffix_denoise_fn(params, cfg, kv, prefix_len_tokens, proprio, tail)
        return tree_sum(fn(x, t))

    # device-resident intermediates
    prefix_embeds = frontend(params, state, prefix_ids, images_d, pc_d)
    kv = prefill_kv(params, prefix_embeds)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.action_horizon, cfg.action_dim))
    t0v = jnp.full((B,), 99, jnp.int32)

    def timeit(fn, *a, vary):
        """p50 of `iters` calls, each fetched to host (device_get forces true
        completion on this backend) with input `vary` perturbed per call."""
        # warm (compile)
        aa = list(a)
        float(jax.device_get(fn(*aa)))
        ts = []
        for i in range(args.iters):
            aa = list(a)
            aa[vary] = aa[vary] + jnp.float32(i + 1) * 1e-6
            jax.block_until_ready(aa[vary])
            st = time.perf_counter()
            float(jax.device_get(fn(*aa)))
            ts.append(time.perf_counter() - st)
        return float(np.percentile(ts, 50) * 1e3)

    null_fn = jax.jit(lambda a: (a * 2).sum())
    t_null = timeit(null_fn, jnp.zeros((8, 128), jnp.float32), vary=0)

    t_front = timeit(frontend_s, params, state, prefix_ids, images_d, pc_d, vary=4)
    t_prefill = timeit(prefill_s, params, prefix_embeds, vary=1)
    t_suffix = timeit(suffix_s, params, kv, proprio_d, tail_ids, x0, t0v, vary=4)

    # the full fused graph for comparison
    full = policy._diff_fn(prefix_ids.shape[1], tail_ids.shape[1], use_ddpm=False)
    full_s = jax.jit(lambda *a: full(*a).astype(jnp.float32).sum())
    t_full = timeit(
        full_s, params, state, prefix_ids, tail_ids, images_d, pc_d, proprio_d, x0, key, vary=7
    )

    net = lambda t: max(t - t_null, 0.0)
    print(json.dumps({
        "model": args.model, "batch": B, "backend": jax.default_backend(),
        "dispatch_rtt_ms": round(t_null, 2),
        "frontend_ms": round(net(t_front), 2),
        "prefill_ms": round(net(t_prefill), 2),
        "suffix_step_ms": round(net(t_suffix), 2),
        "suffix_x8_ms": round(8 * net(t_suffix), 2),
        "sum_net_ms": round(net(t_front) + net(t_prefill) + 8 * net(t_suffix), 2),
        "full_graph_ms": round(t_full, 2),
        "full_graph_net_ms": round(net(t_full), 2),
        "prefix_tokens": int(prefix_len_tokens), "suffix_tokens": int(suffix_len),
    }))


if __name__ == "__main__":
    main()
