"""XLA/libtpu scheduling-flag sweep over the suffix denoise step
(VERDICT r4 #4 — one positive attempt at the ~1.5 ms MXU-drain residue).

Round-3 established the decode chain's 128 fused W8A8 dots measure ~9.4 ms
against a 7.98 ms achieved-bandwidth sweep, attributed to MXU pipeline
drain between back-to-back small-M (M=19) dots, and that hand-written
Pallas fusion LOSES 3x (kernel-boundary DMA stalls). The remaining lever
this sweep probes is the XLA-side schedule: scoped-VMEM budget (deeper
weight-DMA double buffering) and the latency-hiding scheduler.

Each flag set runs `profile_suffix_ops.py --only suffix_full` in a FRESH
subprocess (XLA flags are process-level) with a per-flag-set compilation
cache dir (the persistent cache key does not include XLA_FLAGS, so sharing
one dir would silently serve the baseline executable back). Results are
printed as one JSON line per flag set + a summary table; the docs table in
docs/kernels.md records the outcome either way.

Usage: python scripts/sweep_suffix_flags.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FLAG_SETS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem64m+lhs": (
        "--xla_tpu_scoped_vmem_limit_kib=65536 "
        "--xla_tpu_enable_latency_hiding_scheduler=true"
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--model", default="mla-7b-int8")
    ap.add_argument("--sets", nargs="+", default=list(FLAG_SETS),
                    help="subset of flag sets to run")
    ap.add_argument("--only", default="suffix_full")
    args = ap.parse_args()

    results = {}
    for name in args.sets:
        flags = FLAG_SETS[name]
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # per-flag-set cache: the persistent cache key ignores XLA_FLAGS
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/mla_tpu_jax_cache_tpu_{name}"
        print(f"--- {name}: XLA_FLAGS='{flags}'", file=sys.stderr)
        p = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "profile_suffix_ops.py"),
             "--model", args.model, "--iters", str(args.iters),
             "--only", args.only],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if p.returncode == 0 and lines:
            results[name] = json.loads(lines[-1])
            print(lines[-1])
        else:
            err = (p.stderr.strip().splitlines() or ["no output"])[-1][:300]
            results[name] = {"error": err}
            print(json.dumps({"set": name, "error": err}))

    base = results.get("baseline", {}).get("suffix_full_ms")
    print("\nflag set            suffix_full_ms   delta", file=sys.stderr)
    for name, r in results.items():
        v = r.get("suffix_full_ms")
        d = f"{v - base:+.2f}" if (v is not None and base) else "-"
        print(f"{name:<20}{v if v is not None else 'ERR':<17}{d}", file=sys.stderr)
    print(json.dumps({"sweep": {k: v.get("suffix_full_ms") for k, v in results.items()}}))


if __name__ == "__main__":
    main()
