"""HTTP serving host: dynamic-batching action-chunk prediction.

Beyond-parity deployment front-end (the reference ships only the in-process
RLBench loop, scripts/test_rlbench.py); wraps
`mla_tpu.serving.BatchingServer` — concurrent requests coalesce into one
bucketed batched device call, which is where the single-chip throughput is
(bench.py: 14+ chunks/s at B=1 vs 18+ at B=4 on mla-7b-int8).

    python scripts/serve.py --checkpoint runs/<id> --port 8700 \
        [--sampler dpm|ddim] [--max_wait_ms 5]

Protocol (stdlib-only client, see tests/test_serving.py):

  POST /predict   body = npz archive with
                    image       [H, W, 3] uint8 raw frame — preferred:
                                stays uint8, CLIP preprocess runs on-device
                                (5.3x fewer host->device bytes). [4, S, S]
                                float32 already-preprocessed also accepted.
                    pointcloud  [P, 3] float32
                    instruction scalar string
                    proprio     [action_dim] float32          (optional)
                    unnorm_key  scalar string                 (optional)
                  -> {"actions": [[...] x horizon]}
  GET  /stats     -> batching counters + latency percentiles (JSON)
  GET  /metrics   -> same data in Prometheus text exposition format
  GET  /healthz   -> {"ok": true}
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Published serving configuration (matches bench.py): bf16 prefill score
# tensors, qualified up the tiny->2b scale ladder (chunk rel-rms 2e-4 vs
# fp32 scores, gripper agreement 1.0) for a measured net serving win
# (batch-4 DPM-4 18.5 -> 21.3 chunks/s; docs/kernels.md). Override with
# MLA_PREFILL_SCORES=fp32. The env var is read lazily at MLAPolicy
# construction (models/mla.py serving_scores_dtype_from_env), so it must be
# set before the policy is built — import order does not matter.
import os  # noqa: E402

os.environ.setdefault("MLA_PREFILL_SCORES", "bf16")
# Persistent XLA compile cache (same dir as bench.py): without it every
# fresh serve process pays the full remote compile for each bucket graph
# (~10-15 min cold on the 7B flagship) instead of a cache load.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# env setdefault alone is DEAD in-process on this box (the axon .pth imports
# jax at interpreter startup, freezing env-derived config defaults) — the
# helper force-enables the cache via jax.config.update. Kept env vars above
# so spawned subprocesses inherit them at startup, where they DO work.
from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()


def _serving_xla_options_default() -> None:
    # Published serving configuration (matches bench.py): XLA latency-hiding
    # scheduler on the serving graphs (suffix denoise 10.84 -> 9.91 ms/step
    # on the real v5e; docs/kernels.md "XLA scheduling-option sweep").
    # TPU-gated — the option names are TPU-compiler-only, and a CPU-hosted
    # smoke run must not feed them to the CPU client. Resolved lazily at
    # MLAPolicy construction like MLA_PREFILL_SCORES; override with
    # MLA_XLA_OPTIONS='{}' for the stock scheduler.
    import jax

    if jax.default_backend() == "tpu":
        os.environ.setdefault(
            "MLA_XLA_OPTIONS",
            '{"xla_tpu_enable_latency_hiding_scheduler": "true"}',
        )


from mla_tpu.serving import QueueFull  # noqa: E402


def _prep_image(img: np.ndarray, size: int) -> np.ndarray:
    """Raw [H, W, 3] uint8 -> [3, S, S] uint8 CHW (CLIP normalization +
    mask channel run ON-DEVICE, models/mla.py _device_clip_preprocess —
    shipping uint8 cuts host->device image bytes 5.3x); pass through
    already-preprocessed [4, S, S] float inputs. Host only resizes/crops,
    and only when the frame is not already size x size."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] == 4:
        return img.astype(np.float32)
    img = img.astype(np.uint8)
    if img.shape[:2] != (size, size):
        # the one shared geometric transform — keeps serving pixel-identical
        # to the training-side clip_preprocess
        from mla_tpu.vla.datasets import resize_center_crop

        img = resize_center_crop(img, size)
    return img.transpose(2, 0, 1)  # [3, S, S] uint8


def render_prometheus(stats: dict) -> str:
    """BatchingServer.stats() -> Prometheus text exposition format."""
    lines = []

    def emit(name, value, labels="", mtype="gauge"):
        lines.append(f"# TYPE {name} {mtype}")
        lines.append(f"{name}{labels} {value}")

    for key, mtype in (
        ("requests", "counter"), ("device_calls", "counter"),
        ("padded_rows", "counter"), ("errors", "counter"),
        ("rejected", "counter"), ("pending", "gauge"),
        ("avg_batch_size", "gauge"),
    ):
        if key in stats:
            emit(f"mla_serve_{key}", stats[key], mtype=mtype)
    for bucket, count in stats.get("batch_size_hist", {}).items():
        lines.append(f'mla_serve_batches{{bucket="{bucket}"}} {count}')
    for key in ("queue_wait_ms", "e2e_ms"):
        if key in stats:
            for q in ("p50", "p95", "max"):
                lines.append(f'mla_serve_{key}{{quantile="{q}"}} {stats[key][q]}')
    return "\n".join(lines) + "\n"


def warm_buckets(server, warm_lens, log=True) -> None:
    """Drive one synthetic batch per (prompt length, bucket) through the
    server BEFORE it accepts traffic: compiles (or persistent-cache-loads)
    every bucket graph and pays the one-time weight upload up front, so no
    live request eats a multi-minute compile. Raw uint8 frames — the
    preferred protocol — so the warmed graphs match what /predict
    dispatches. Graphs are keyed by prompt token length; warm the lengths
    the deployment's prompts tokenize to."""
    import time as _time

    cfg = server.policy.cfg
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    img = rng.integers(0, 256, size=(3, size, size)).astype(np.uint8)
    n_pts = getattr(getattr(cfg, "point", None), "input_points", 1024)
    pc = rng.uniform(-0.5, 0.5, size=(n_pts, 3)).astype(np.float32)
    saved_wait, server.max_wait_s = server.max_wait_s, 0.25  # coalesce warm rows
    try:
        for L in warm_lens:
            if L < 2:
                raise ValueError(f"warm_len {L}: prompt needs >= 2 tokens")
            ids = np.concatenate(
                [[1], np.full(max(L - 2, 0), 5, np.int64), [29871]]
            ).astype(np.int32)[None, :]
            for b in server.buckets:
                t0 = _time.time()
                futs = [server.submit(img, pc, input_ids=ids) for _ in range(b)]
                for f in futs:
                    f.result(timeout=3600)
                if log:
                    print(f"warm len={L} bucket={b}: {_time.time() - t0:.1f}s",
                          file=sys.stderr, flush=True)
    finally:
        server.max_wait_s = saved_wait
    server.reset_latency_stats()


def make_handler(server, cfg):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet access log
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, server.stats())
            elif self.path == "/metrics":
                body = render_prometheus(server.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                with np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False) as z:
                    image = _prep_image(z["image"], cfg.vision.image_size)
                    pc = np.asarray(z["pointcloud"], np.float32)
                    instruction = str(z["instruction"])
                    proprio = (
                        np.asarray(z["proprio"], np.float32) if "proprio" in z else None
                    )
                    unnorm_key = str(z["unnorm_key"]) if "unnorm_key" in z else None
                actions = server.predict(
                    image, pc, instruction,
                    cur_robot_state=proprio, unnorm_key=unnorm_key,
                )
                self._json(200, {"actions": np.asarray(actions).tolist()})
            except QueueFull as e:   # shed load: tell the client to back off
                self._json(503, {"error": f"overloaded: {e}"[:400]})
            except Exception as e:  # noqa: BLE001 — report to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"[:400]})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="run dir / .pt for load_vla (use_ema via --use_ema)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer path (default: SimpleTokenizer)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--sampler", default="dpm", choices=["dpm", "ddim"])
    p.add_argument("--num_dpm_steps", type=int, default=4)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--max_pending", type=int, default=64,
                   help="pending-request cap; beyond it /predict sheds load "
                        "with HTTP 503 (0 = unbounded)")
    p.add_argument("--warm_len", type=int, nargs="*", default=None,
                   help="pre-compile every bucket graph at startup for these "
                        "prompt token lengths (e.g. --warm_len 22); graphs are "
                        "keyed by prompt length, so warm the lengths your "
                        "deployment's prompts tokenize to. Without this the "
                        "first request of each (length, bucket) pays the "
                        "compile (or persistent-cache load) mid-traffic.")
    args = p.parse_args(argv)

    from mla_tpu.models.load import load_vla
    from mla_tpu.serving import BatchingServer
    from mla_tpu.vla.tokenizer import SimpleTokenizer, load_llama_tokenizer

    tokenizer = (
        load_llama_tokenizer(args.tokenizer) if args.tokenizer else SimpleTokenizer()
    )
    _serving_xla_options_default()  # before the policy resolves its env
    policy = load_vla(args.checkpoint, use_ema=args.use_ema, tokenizer=tokenizer)
    server = BatchingServer(
        policy, buckets=args.buckets, max_wait_ms=args.max_wait_ms,
        sampler=args.sampler, num_dpm_steps=args.num_dpm_steps,
        max_pending=args.max_pending or None,
    )
    if args.warm_len:
        warm_buckets(server, args.warm_len)

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server, policy.cfg))
    print(f"serving on http://{args.host}:{args.port} "
          f"(sampler={args.sampler}, buckets={args.buckets})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
