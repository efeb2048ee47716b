"""Real-chip throughput of the dynamic-batching serving host.

Measures what a robot fleet would actually see from `scripts/serve.py`:
M closed-loop clients (each submits its next observation as soon as its
previous chunk returns) against `mla_tpu.serving.BatchingServer` on the
7B int8 flagship, DPM-Solver++(2M) 4-eval sampler. Unlike bench.py's
device-resident graph timings, this number includes everything a
deployment pays: host-side batching/padding, the np<->device transfers,
and the dev tunnel's per-dispatch RTT (a colocated host would not pay
the ~26 ms RTT — reported alongside so both readings are visible).

Tunnel timing rules (CLAUDE.md) are respected structurally: every
request carries a distinct image (no remote result-cache hits) and
completion is forced by predict_action_diff_batched's np.asarray fetch.

    python scripts/bench_serve_host.py [--clients 4] [--rounds 6]
        [--model mla-7b-int8] [--buckets 1 4]

Buckets default to (1, 4) to reuse bench.py's compiled B=1/B=4 DPM-4
graphs from the persistent compile cache.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
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
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--rounds", type=int, default=6,
                   help="chunks per client in the timed window")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 4])
    p.add_argument("--max_wait_ms", type=float, default=20.0)
    p.add_argument("--sampler", default="dpm", choices=["dpm", "ddim"])
    args = p.parse_args(argv)

    import jax  # noqa: F401  (backend init before building the policy)
    import numpy as np

    if jax.default_backend() == "tpu":
        # published serving configuration (matches bench.py/serve.py):
        # latency-hiding scheduler on the serving graphs; TPU-gated since
        # the option names are TPU-compiler-only
        os.environ.setdefault(
            "MLA_XLA_OPTIONS",
            '{"xla_tpu_enable_latency_hiding_scheduler": "true"}',
        )

    from bench import build_policy
    from mla_tpu.serving import BatchingServer

    policy, cfg = build_policy(args.model)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    ids = np.concatenate(
        [[1], rng.integers(100, 20000, 20), [29871]]
    ).astype(np.int32)[None, :]
    pc = rng.uniform(
        [-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(cfg.point.input_points, 3)
    ).astype(np.float32)

    # Pre-generate every observation OUTSIDE the timed window: on the
    # 1-core dev box, per-request image synthesis inside client threads
    # serializes on the GIL and destroys batching (requests trickle in one
    # at a time -> B=1 calls). Real cameras hand the host a ready frame.
    # Frames are RAW uint8 CHW — CLIP preprocessing runs on-device
    # (models/mla.py _device_clip_preprocess), cutting upload bytes 5.3x.
    base_img = rng.integers(0, 256, size=(3, size, size)).astype(np.uint8)

    def make_obs(i: int):
        # distinct image per request: defeats the remote result cache and
        # models a real camera stream
        img = base_img.copy()
        img[:, 0, 0] = np.asarray([i % 251, (i // 251) % 251, 7], np.uint8)
        return img

    obs_pool = {}

    with BatchingServer(
        policy, buckets=args.buckets, max_wait_ms=args.max_wait_ms,
        sampler=args.sampler, num_dpm_steps=4,
    ) as srv:
        # warm every bucket graph (compile or cache-load happens here)
        for b in args.buckets:
            t0 = time.time()
            futs = [srv.submit(make_obs(10_000 + b * 100 + j), pc, input_ids=ids,
                               unnorm_key="rlbench") for j in range(b)]
            for f in futs:
                f.result(timeout=3600)
            print(f"warm bucket {b}: {time.time() - t0:.1f}s", file=sys.stderr)

        for c in range(args.clients):
            for r in range(args.rounds):
                obs_pool[(c, r)] = make_obs(c * 1000 + r)

        warm_stats = srv.stats()
        srv.reset_latency_stats()   # phase rings: steady-state calls only
        done = threading.Barrier(args.clients + 1)
        t_start = time.time()

        def client(cid: int):
            for r in range(args.rounds):
                srv.submit(obs_pool[(cid, r)], pc, input_ids=ids,
                           unnorm_key="rlbench").result(timeout=3600)
            done.wait()

        threads = [threading.Thread(target=client, args=(c,)) for c in range(args.clients)]
        for t in threads:
            t.start()
        done.wait()
        wall = time.time() - t_start
        for t in threads:
            t.join()
        stats = srv.stats()

    chunks = args.clients * args.rounds
    calls = stats["device_calls"] - warm_stats["device_calls"]
    print(json.dumps({
        "serve_host_chunks_per_sec": round(chunks / wall, 2),
        "clients": args.clients, "chunks": chunks, "wall_s": round(wall, 2),
        "device_calls": calls,
        "avg_batch_per_call": round(chunks / max(calls, 1), 2),
        "padded_rows": stats["padded_rows"] - warm_stats["padded_rows"],
        "model": args.model, "sampler": args.sampler,
        "buckets": args.buckets, "max_wait_ms": args.max_wait_ms,
        # per-device-call phase decomposition (VERDICT r4 #8): where the
        # gross-vs-device-ceiling gap goes — worker time assembling +
        # enqueuing each batch (host memcpy + transfer initiation) vs time
        # blocked on the oldest in-flight batch (execution not hidden)
        "assemble_dispatch_ms": stats.get("assemble_dispatch_ms"),
        "finalize_block_ms": stats.get("finalize_block_ms"),
        "queue_wait_ms": stats.get("queue_wait_ms"),
        "e2e_ms": stats.get("e2e_ms"),
        "note": "closed-loop clients via BatchingServer; raw uint8 frames, "
                "CLIP preprocess on-device; includes host batching + "
                "transfers + the dev tunnel's ~26 ms/dispatch RTT",
    }))


if __name__ == "__main__":
    main()
