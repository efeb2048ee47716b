"""Single-chip TPU smoke: one real-size training step + policy call.

Validates on actual hardware what the CPU test suite runs in interpret
mode: flash-attention forward AND backward Mosaic lowering, the fused
train step (remat + optimizer), and the cached-prefix policy graph.

    python scripts/tpu_smoke.py [--model mla-2b] [--batch 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache_tpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mla-2b")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "adafactor"],
                   help="adafactor (factored second moments) fits mla-2b "
                        "training on the single 16 GB dev chip")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.diffusion import gaussian as gd
    from mla_tpu.models import prismatic
    from mla_tpu.training import optim, strategy
    from mla_tpu.vla.dummy import synthetic_batch

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = get_model_config(args.model)
    t0 = time.time()
    params, mstate = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    print(f"init: {time.time() - t0:.1f}s")

    tcfg = strategy.TrainConfig(
        learning_rate=1e-5, grad_accumulation_steps=1, repeated_diffusion_steps=1,
        enable_gradient_checkpointing=True, num_training_steps=10,
    )
    tx, _, _ = optim.make_optimizer(params, learning_rate=1e-5, num_training_steps=10,
                                    optimizer=args.optimizer)
    state = strategy.init_train_state(params, tx, mstate)
    del params, mstate
    sched = gd.create_schedule("", diffusion_steps=100)
    step_fn = strategy.make_train_step(cfg, tcfg, tx, sched, mesh=None)

    batch = synthetic_batch(cfg, B=args.batch, L=32)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    times = []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["total_loss"])  # blocks
        dt = time.time() - t0
        times.append(dt)
        print(f"step {i}: loss={loss:.4f} grad_norm={float(metrics['grad_norm']):.4f} "
              f"({dt:.2f}s)")
        assert loss == loss, "NaN loss"
    print("TRAIN STEP OK")

    if len(times) > 1:
        import json

        warm = times[1:]
        # tokens processed per optimizer step: B x seq (text+fused+diff) x
        # repeated_diffusion_steps
        seq = 32 + cfg.fused_len + cfg.diff_block_len
        toks = args.batch * seq * tcfg.repeated_diffusion_steps
        p50 = sorted(warm)[len(warm) // 2]
        # training MFU, PaLM convention (6N per token, remat recompute not
        # counted; same per-token decoder param rules as scripts/train.py —
        # embed is a gather, lm_head never multiplies in diffusion mode)
        llm = state["params"]["llm_backbone"]
        skip = {"embed"} | ({"lm_head"} if cfg.use_diff else set())
        n_params = sum(
            int(l.size)
            for k, sub in llm.items() if k not in skip
            for l in jax.tree_util.tree_leaves(sub)
        )
        mfu = None
        if jax.default_backend() == "tpu":
            mfu = (toks / p50) * 6.0 * n_params / (197e12 * jax.device_count())
        print(json.dumps({
            "train_step_p50_s": round(p50, 4),
            "train_tokens_per_sec": round(toks / p50, 1),
            "train_mfu": round(mfu, 4) if mfu is not None else None,
            "model": args.model, "batch": args.batch, "seq": seq,
            "optimizer": args.optimizer, "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
