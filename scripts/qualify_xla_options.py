"""Numerics qualification for the MLA_XLA_OPTIONS serving configuration.

The latency-hiding scheduler (docs/kernels.md "XLA scheduling-option
sweep") reorders the instruction schedule of the serving graphs; it must
not change their math. This script proves it on the real chip at flagship
scale: the SAME policy object predicts the same DPM-4 chunk twice — once
with the stock scheduler, once with the published serving options — and
the actions are compared elementwise. Flipping `policy.compiler_options`
between calls recompiles (the option set is part of every _jit_cache
signature) rather than serving a stale graph, which is itself part of the
contract under test.

bench.py's registry policy carries zero int8 weights (every dot output
would be 0 — a degenerate comparison), so the decode-path w_q leaves are
re-randomized ON DEVICE (deterministic fold_in keys; no 6.5 GB host
upload) before predicting.

Usage: python scripts/qualify_xla_options.py [--model mla-7b-int8]
Prints one JSON line: max |delta|, rel-rms, bit_identical.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
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
# both variants are built EXPLICITLY below — the env default must not leak
os.environ["MLA_XLA_OPTIONS"] = ""

SERVING_OPTIONS = {"xla_tpu_enable_latency_hiding_scheduler": "true"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mla-7b-int8")
    ap.add_argument("--sampler", default="dpm")
    ap.add_argument("--num_dpm_steps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_policy

    policy, cfg = build_policy(args.model)

    # randomize every int8 decode weight on device (zero weights make the
    # comparison trivially 0 == 0)
    def randomize(tree, key):
        if isinstance(tree, dict):
            out = {}
            for name, v in tree.items():
                key, sub = jax.random.split(key)
                if name == "w_q":
                    out[name] = jax.jit(
                        lambda k, shape=v.shape: jax.random.randint(
                            k, shape, -127, 128, dtype=jnp.int8
                        )
                    )(sub)
                elif name == "w_scale":
                    # small scales keep 32-layer activations finite
                    out[name] = jnp.full(v.shape, 2e-4, v.dtype)
                else:
                    out[name] = randomize(v, sub)
            return out
        return tree

    policy.params = {
        **policy.params,
        "llm_backbone": randomize(policy.params["llm_backbone"], jax.random.PRNGKey(7)),
    }

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    img = rng.integers(0, 256, size=(3, size, size)).astype(np.uint8)
    pc = rng.uniform(
        [-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(cfg.point.input_points, 3)
    ).astype(np.float32)
    ids = np.concatenate(
        [[1], rng.integers(100, 20000, 20), [29871]]
    ).astype(np.int32)[None, :]
    noise = rng.standard_normal((1, cfg.action_horizon, cfg.action_dim)).astype(np.float32)

    def predict():
        return policy.predict_action_diff(
            img, pc, "qualify", input_ids=ids, noise=noise,
            sampler=args.sampler, num_dpm_steps=args.num_dpm_steps,
        )

    policy.compiler_options = None
    a = np.asarray(predict())
    policy.compiler_options = SERVING_OPTIONS
    b = np.asarray(predict())

    denom = float(np.sqrt(np.mean(a**2))) or 1.0
    out = {
        "model": args.model,
        "sampler": f"{args.sampler}{args.num_dpm_steps}",
        "options": SERVING_OPTIONS,
        "max_abs_delta": float(np.max(np.abs(a - b))),
        "rel_rms": float(np.sqrt(np.mean((a - b) ** 2)) / denom),
        "bit_identical": bool(np.array_equal(a, b)),
        "action_rms": denom,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
