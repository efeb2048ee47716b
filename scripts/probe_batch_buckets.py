"""Probe batched DPM-4 serving throughput across batch sizes on the chip.

Finds the best static bucket size for the serving host: per-call latency
and chunks/s for B in --batches, following the tunnel timing rules
(scalar-reduced jit, device_get completion, per-call input perturbation,
RTT netted out). Batches that OOM report as null.

    python scripts/probe_batch_buckets.py [--batches 4 6 8] [--model mla-7b-int8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup, freezing env-derived config defaults) — the
# helper force-enables the cache via jax.config.update. Kept env vars above
# so spawned subprocesses inherit them at startup, where they DO work.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mla-7b-int8")
    p.add_argument("--batches", type=int, nargs="+", default=[4, 6, 8])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_policy

    policy, cfg = build_policy(args.model)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    ids = np.concatenate(
        [[1], rng.integers(100, 20000, 20), [29871]]
    ).astype(np.int32)[None, :]
    img = np.concatenate([
        rng.normal(size=(3, size, size)).astype(np.float32),
        np.ones((1, size, size), np.float32),
    ])
    pc = rng.uniform(
        [-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(cfg.point.input_points, 3)
    ).astype(np.float32)
    key = jax.random.PRNGKey(0)

    # dispatch RTT of the dev tunnel, netted out of every reading
    null_fn = jax.jit(lambda a: (a * 2.0).sum())
    null_in = jnp.zeros((8, 128), jnp.float32)
    float(jax.device_get(null_fn(null_in)))
    rtts = []
    for i in range(8):
        nv = null_in + jnp.float32(i)
        nv.block_until_ready()
        t0 = time.perf_counter()
        float(jax.device_get(null_fn(nv)))
        rtts.append(time.perf_counter() - t0)
    rtt_s = float(np.percentile(rtts, 50))

    out = {"model": args.model, "sampler": "dpm4", "rtt_ms": round(rtt_s * 1e3, 2)}
    for B in args.batches:
        try:
            inp = (
                jnp.repeat(jnp.asarray(ids[:, :-1]), B, axis=0),
                jnp.repeat(jnp.asarray(ids[:, -1:]), B, axis=0),
                {"front_image": jnp.repeat(jnp.asarray(img[None]), B, axis=0)},
                jnp.repeat(jnp.asarray(pc[None]), B, axis=0),
                jnp.zeros((B, 1, cfg.action_dim), jnp.float32),
            )
            fn = policy._diff_fn(ids.shape[1] - 1, 1, use_ddpm=False,
                                 sampler="dpm", num_dpm_steps=4)
            fn_scalar = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())

            def run(noise):
                return float(jax.device_get(
                    fn_scalar(policy.params, policy.state, *inp, noise, key)
                ))

            t0 = time.time()
            run(jax.random.normal(key, (B, cfg.action_horizon, cfg.action_dim)))
            print(f"warm B={B}: {time.time() - t0:.1f}s", file=sys.stderr)
            ts = []
            for i in range(args.iters):
                noise = jax.random.normal(
                    jax.random.fold_in(key, 1000 * B + i),
                    (B, cfg.action_horizon, cfg.action_dim),
                )
                noise.block_until_ready()
                t0 = time.perf_counter()
                run(noise)
                ts.append(time.perf_counter() - t0)
            net = max(float(np.percentile(ts, 50)) - rtt_s, 1e-6)
            out[f"b{B}"] = {
                "net_ms_per_call": round(net * 1e3, 1),
                "chunks_per_sec": round(B / net, 2),
            }
        except Exception as e:  # noqa: BLE001 — OOM etc: record and move on
            out[f"b{B}"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
