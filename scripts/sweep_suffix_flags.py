"""XLA scheduling-option sweep over the suffix denoise step
(VERDICT r4 #4 — one positive attempt at the ~1.5 ms MXU-drain residue).

Round-3 established the decode chain's 128 fused W8A8 dots measure ~9.4 ms
against a 7.98 ms achieved-bandwidth sweep, attributed to MXU pipeline
drain between back-to-back small-M (M=19) dots, and that hand-written
Pallas fusion LOSES 3x (kernel-boundary DMA stalls). The remaining lever
this sweep probes is the XLA-side schedule: scoped-VMEM budget (deeper
weight-DMA double buffering) and the latency-hiding scheduler.

Mechanism: the options ride `jax.jit(compiler_options=...)` — NOT host
XLA_FLAGS. On this box the local client is CPU XLA (the axon plugin
forwards compilation to a remote TPU compile service), so TPU-only flags
in XLA_FLAGS abort the process at startup ("Unknown flag in XLA_FLAGS");
compiler_options travel inside CompileOptions.env_option_overrides and are
interpreted by the remote TPU compiler. Each option set still runs in a
FRESH subprocess with a per-set compilation cache dir (belt and
suspenders; options do enter the cache key, process isolation keeps one
bad set from poisoning the rest). Results are printed as one JSON line per
set + a summary table; docs/kernels.md records the outcome either way.

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

OPTION_SETS = {
    "baseline": {},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem64m+lhs": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
    # round-5 second wave: tune AROUND the adopted latency-hiding scheduler.
    # 64M scoped VMEM measured +5.4% (fewer double-buffer slots); probe the
    # other direction and the scheduler's own cost-model knobs instead.
    "lhs+vmem24m": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "24576",
    },
    "lhs+slop98": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_memory_limit_slop_factor": "98",
    },
    "lhs+rerun5": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_latency_hiding_scheduler_rerun": "5",
    },
    "lhs+copybw": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_async_copy_bandwidth_scaling_factor": "0.8",
    },
    "lhs+nodsr": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_enable_dot_strength_reduction": "false",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--model", default="mla-7b-int8")
    ap.add_argument("--sets", nargs="+", default=list(OPTION_SETS),
                    help="subset of option sets to run")
    ap.add_argument("--only", default="suffix_full")
    ap.add_argument("--chain", type=int, default=0,
                    help="pass through to profile_suffix_ops.py --chain "
                         "(N steps per dispatch; per-step numbers reported)")
    args = ap.parse_args()

    results = {}
    for name in args.sets:
        opts = OPTION_SETS[name]
        env = dict(os.environ)
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/mla_tpu_jax_cache_tpu_{name}"
        print(f"--- {name}: compiler_options={opts}", file=sys.stderr)
        cmd = [sys.executable, str(REPO / "scripts" / "profile_suffix_ops.py"),
               "--model", args.model, "--iters", str(args.iters),
               "--only", args.only]
        if args.chain:
            cmd += ["--chain", str(args.chain)]
        if opts:
            cmd += ["--compiler_options", json.dumps(opts)]
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if p.returncode == 0 and lines:
            results[name] = json.loads(lines[-1])
            print(lines[-1])
        else:
            err = (p.stderr.strip().splitlines() or ["no output"])[-1][:300]
            results[name] = {"error": err}
            print(json.dumps({"set": name, "error": err}))

    base = results.get("baseline", {}).get("suffix_full_ms")
    print("\noption set          suffix_full_ms   delta", file=sys.stderr)
    for name, r in results.items():
        v = r.get("suffix_full_ms")
        d = f"{v - base:+.2f}" if (v is not None and base) else "-"
        print(f"{name:<20}{v if v is not None else 'ERR':<17}{d}", file=sys.stderr)
    print(json.dumps({"sweep": {k: v.get("suffix_full_ms") for k, v in results.items()}}))


if __name__ == "__main__":
    main()
