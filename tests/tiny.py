"""Tiny-but-complete MLA model config + synthetic batch for tests.

Thin wrappers over the package fixtures (conf `mla-tiny` preset +
mla_tpu.vla.dummy.synthetic_batch) so tests and the driver's multichip
dryrun share one definition."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mla_tpu.conf.models import get_model_config
from mla_tpu.models import prismatic
from mla_tpu.vla.dummy import synthetic_batch


def tiny_config(**flags):
    return get_model_config("mla-tiny", **flags)


def tiny_batch(cfg, B=2, L=16, seed=0, training=True):
    batch = synthetic_batch(cfg, B=B, L=L, seed=seed, training=training)
    return jax.tree_util.tree_map(jnp.asarray, batch)


def tiny_model(cfg, seed=0):
    return prismatic.mla_model_init(jax.random.PRNGKey(seed), cfg)
