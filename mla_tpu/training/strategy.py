"""GSPMD training strategy: sharded train state + one jitted train step.

TPU-native analogue of the reference's FSDPStrategy.run_setup /
run_vla_training (training/strategies/{fsdp.py,base_strategy_mla.py}):
  * parameter/optimizer sharding via PartitionSpecs (== FSDP wrap policy),
  * bf16 compute with fp32 master params & reductions
    (== MixedPrecision(param bf16, reduce fp32), fsdp.py:184-199),
  * rematerialized decoder layers (== activation checkpointing :211-223),
  * gradient accumulation as an in-graph lax.scan over micro-batches
    (== base_strategy_mla.py:365-379's python accumulation loop),
  * EMA update (== update_ema :32-41).

Everything lives inside ONE pjit-compiled step — no per-microbatch host
round trips, and XLA overlaps the FSDP all-gathers with compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mla_tpu.diffusion import gaussian as gd
from mla_tpu.models import mla as mla_mod
from mla_tpu.models import prismatic
from mla_tpu.parallel import sharding as shard_mod


@dataclass
class TrainConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "constant"
    warmup_ratio: float = 0.0
    num_training_steps: int = 1000
    grad_accumulation_steps: int = 1
    repeated_diffusion_steps: int = 4
    stage: str = "pretrain"
    use_ema: bool = False
    ema_decay: float = 0.9999
    enable_gradient_checkpointing: bool = True


def init_train_state(
    params: Any, tx: optax.GradientTransformation, model_state: Any, use_ema: bool = False
) -> Dict[str, Any]:
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "model_state": model_state,
        "step": jnp.zeros((), jnp.int32),
    }
    if use_ema:
        state["ema_params"] = jax.tree_util.tree_map(jnp.copy, params)
    return state


def make_train_step(
    cfg: prismatic.MLAModelConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    sched: gd.Schedule,
    mesh: Optional[Mesh] = None,
    use_flash: Optional[bool] = None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    Sharding is carried by the INPUTS, not by this function: place the
    state with `shard_train_state(state, mesh)` and the batch with
    `parallel.shard_batch(batch, mesh)` — jit propagates those placements
    and XLA generates the collectives (`mesh` is accepted only as
    documentation of that contract; passing it does not shard anything by
    itself). `grad_accumulation_steps > 1` expects the batch leading dim to
    be divisible by it; micro-batches run under lax.scan with grads
    averaged before one optimizer step (loss semantics identical to the
    reference's loss/grad_accum backward loop)."""
    accum = train_cfg.grad_accumulation_steps

    def loss_fn(params, model_state, batch, rng):
        total, (loss_dict, new_state) = mla_mod.mla_train_loss(
            params, model_state, cfg, sched, batch, rng,
            repeated_diffusion_steps=train_cfg.repeated_diffusion_steps,
            remat=train_cfg.enable_gradient_checkpointing,
            use_flash=use_flash,
        )
        return total, (loss_dict, new_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, batch, rng):
        params = state["params"]
        model_state = state["model_state"]

        if accum > 1:
            def split(x):
                if hasattr(x, "ndim") and x.ndim > 0:
                    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])
                return x

            micro = jax.tree_util.tree_map(split, batch)
            rngs = jax.random.split(rng, accum)

            def body(carry, inputs):
                g_acc, l_acc, mstate = carry
                mbatch, mrng = inputs
                (loss, (ldict, new_mstate)), grads = grad_fn(params, mstate, mbatch, mrng)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                l_acc = jax.tree_util.tree_map(jnp.add, l_acc, ldict)
                return (g_acc, l_acc, new_mstate), None

            g0 = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
            l0 = {
                k: jnp.zeros((), jnp.float32)
                for k in [
                    "total_loss", "img_pc_contrastive_loss", "tactile_contrastive_loss",
                    "diff_loss", "ar_loss", "image_gen_loss", "point_cloud_gen_loss",
                    "tactile_gen_loss",
                ]
            }
            (grads, loss_dict, new_mstate), _ = jax.lax.scan(
                body, (g0, l0, model_state), (micro, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss_dict = jax.tree_util.tree_map(lambda l: l / accum, loss_dict)
        else:
            (loss, (loss_dict, new_mstate)), grads = grad_fn(params, model_state, batch, rng)

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)

        new_state = {
            "params": new_params,
            "opt_state": new_opt_state,
            "model_state": new_mstate,
            "step": state["step"] + 1,
        }
        if "ema_params" in state:
            d = train_cfg.ema_decay
            new_state["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * p, state["ema_params"], new_params
            )
        metrics = dict(loss_dict)
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    # With a mesh, shardings come from the INPUT state (placed by
    # shard_train_state) and propagate through jit; XLA inserts the
    # all-gathers/reduce-scatters. Donation reuses the old state's buffers.
    return jax.jit(train_step, donate_argnums=(0,))


def shard_train_state(state: Dict[str, Any], mesh: Mesh, use_tp: bool = False) -> Dict[str, Any]:
    """Place a host-side train state onto the mesh: params/opt-state/ema get
    FSDP(+TP) shardings, scalars replicate."""
    p_shardings = shard_mod.param_shardings(state["params"], mesh, use_tp)
    rep = shard_mod.replicate(mesh)

    def _names(path):
        return tuple(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path
        )

    # opt_state's adam mu/nu (and ema) mirror the params pytree, so an
    # opt-state leaf's key-path ENDS with some param's full key-path (e.g.
    # (..., 'mu', 'llm_backbone', 'layers', 'attn', 'q', 'w')). Match on that
    # suffix + shape/dtype — matching on (shape, dtype) alone mis-shards
    # same-shaped params with different specs (TP: q.w out-dim-sharded vs
    # o.w in-dim-sharded), which forces a second train-step compile and
    # per-leaf resharding on the first step.
    p_entries = [
        (_names(path), leaf.shape, sh)
        for (path, leaf), sh in zip(
            jax.tree_util.tree_flatten_with_path(state["params"])[0],
            jax.tree_util.tree_leaves(p_shardings),
        )
    ]

    def put_like_params(tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for path, x in flat:
            names = _names(path)
            sh = rep
            if hasattr(x, "shape"):
                # dtype intentionally not compared: a sharding constrains
                # only the shape, and opt states may keep a wider dtype
                for pnames, pshape, psh in p_entries:
                    if (
                        len(names) >= len(pnames)
                        and names[-len(pnames):] == pnames
                        and x.shape == pshape
                    ):
                        sh = psh
                        break
            out.append(jax.device_put(x, sh))
        return jax.tree_util.tree_unflatten(treedef, out)

    out = {
        "params": jax.tree_util.tree_map(jax.device_put, state["params"], p_shardings),
        "opt_state": put_like_params(state["opt_state"]),
        "model_state": jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state["model_state"]),
        "step": jax.device_put(state["step"], rep),
    }
    if "ema_params" in state:
        out["ema_params"] = jax.tree_util.tree_map(
            jax.device_put, state["ema_params"], p_shardings
        )
    return out


def make_visualize_step(cfg: prismatic.MLAModelConfig, sched: gd.Schedule) -> Callable:
    """Jitted eval forward returning the generation-head outputs for
    training-time visualization (the reference dumps these from inside the
    training forward via a hardcoded path, models/vlm/prismatic.py:1129-1135;
    here it is an explicit cadence hook in scripts/train.py driven by
    --visualize_interval, writing under the run dir)."""

    @jax.jit
    def viz_step(state, batch, rng):
        k_noise, k_t, k_model = jax.random.split(rng, 3)
        params, model_state = state["params"], state["model_state"]
        b = dict(batch)
        if cfg.use_diff:
            actions_future = b["actions"][:, -cfg.action_horizon:, :]
            noise = jax.random.normal(k_noise, actions_future.shape, jnp.float32)
            t = jax.random.randint(k_t, (actions_future.shape[0],), 0, sched.num_timesteps)
            b["x"] = gd.q_sample(sched, actions_future.astype(jnp.float32), t, noise)
            b["t"] = t
            b.pop("labels", None)
        outputs, _ = prismatic.vlm_forward(
            params, model_state, cfg, b, training=True, use_diff=cfg.use_diff,
            rng=k_model, remat=False,
        )
        return outputs.get("generation_outputs", {})

    return viz_step
