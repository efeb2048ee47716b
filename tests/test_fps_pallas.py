"""Pallas FPS kernel vs the jnp fallback (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.ops.pointops import furthest_point_sample
from mla_tpu.ops.pointops_pallas import fps_pallas


def test_matches_fallback_deterministic():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(3, 256, 3)).astype(np.float32))
    a = np.asarray(fps_pallas(xyz, 32))
    b = np.asarray(furthest_point_sample(xyz, 32, deterministic=True, use_pallas=False))
    np.testing.assert_array_equal(a, b)


def test_random_start():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    start = jnp.array([5, 17], jnp.int32)
    a = np.asarray(fps_pallas(xyz, 8, start=start))
    assert a[0, 0] == 5 and a[1, 0] == 17
    # trajectory matches the fallback initialized at the same starts
    b = np.asarray(
        jax.vmap(lambda x, s: furthest_point_sample(
            x[None], 8, deterministic=True, use_pallas=False
        )[0] * 0)(xyz, start)
    )  # placeholder shape check only; the real comparison below
    # run the reference loop manually with the custom start
    for bi in range(2):
        pts = np.asarray(xyz[bi])
        dist = np.full(256 if pts.shape[0] == 256 else pts.shape[0], np.inf, np.float32)
        far = int(start[bi])
        idxs = []
        for i in range(8):
            idxs.append(far)
            d = ((pts - pts[far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
        np.testing.assert_array_equal(a[bi], idxs)


def test_dispatch_through_pointops():
    """furthest_point_sample(use_pallas=True) must equal the fallback."""
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))
    a = np.asarray(furthest_point_sample(xyz, 16, use_pallas=True))
    b = np.asarray(furthest_point_sample(xyz, 16, use_pallas=False))
    np.testing.assert_array_equal(a, b)
