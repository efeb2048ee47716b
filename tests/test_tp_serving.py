"""Tensor-parallel serving path: the full cached-prefix diffusion graph
jitted over a tp=4 x fsdp=2 mesh of virtual devices — validates that the
megatron shardings compile and execute with XLA-inserted collectives."""

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.diffusion import gaussian as gd
from mla_tpu.models import mla as mla_mod
from mla_tpu.parallel import make_mesh, sharding as shard_mod

from tiny import tiny_batch, tiny_config, tiny_model


def test_tp_sharded_diffusion_inference():
    cfg = tiny_config(use_contrastive=False)
    params, state = tiny_model(cfg)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    p_sh = shard_mod.param_shardings(params, mesh, use_tp=True)
    params_sharded = jax.tree_util.tree_map(jax.device_put, params, p_sh)
    state_sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard_mod.replicate(mesh)), state
    )

    batch = tiny_batch(cfg, B=1, L=14, training=False)
    ids = np.asarray(batch["input_ids"])
    splice = int(np.asarray(batch["splice_idx"])[0])
    ids_infer = ids[:, : splice + 1]
    prefix_ids = jnp.asarray(ids_infer[:, :-1])
    tail_ids = jnp.asarray(ids_infer[:, -1:])
    sched = gd.create_schedule("ddim2", diffusion_steps=100)
    cache_max = prefix_ids.shape[1] + cfg.fused_len + 2 + cfg.action_horizon + 1 + 8

    @jax.jit
    def run(params, state, noise):
        prefix = mla_mod.build_prefix_embeds(
            params, state, cfg, prefix_ids, batch["images"], batch.get("point_cloud")
        )
        kv, _ = mla_mod.prefill(params, cfg, prefix, cache_max, compute_logits=False)
        return mla_mod.ddim_denoise_actions(
            params, cfg, sched, kv, prefix.shape[1], batch["proprio"], tail_ids, noise
        )

    noise = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.action_horizon, cfg.action_dim))
    out_sharded = run(params_sharded, state_sharded, noise)
    assert out_sharded.shape == (1, cfg.action_horizon, cfg.action_dim)
    assert np.isfinite(np.asarray(out_sharded)).all()

    # numerics match the unsharded single-device run
    out_single = run(params, state, noise)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), atol=2e-3, rtol=1e-3
    )
