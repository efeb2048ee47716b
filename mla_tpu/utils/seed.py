"""Global seeding (reference util/torch_utils.py:30-77, JAX-native).

JAX PRNG is functional, so "global seed" means: seed python/numpy RNGs for
host-side data code and return a root `jax.random.PRNGKey` that callers
thread through the model. Per-host decorrelation folds in the process index
(the reference relied on torchrun rank-dependent worker seeds)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_global_seed(seed: int, *, fold_process_index: bool = True):
    assert 0 <= seed < 2**32, "seed must fit in uint32"
    import jax

    if fold_process_index:
        seed = (seed + 1_000_003 * jax.process_index()) % (2**32)
    random.seed(seed)
    np.random.seed(seed)
    # hash randomization is fixed at interpreter startup — this only makes
    # CHILD processes (data workers) deterministic, never the current one
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
