"""Native C++ host ops vs numpy fallbacks / jax kernels."""

import numpy as np
import pytest

from mla_tpu.native import (
    chamfer_distance_host,
    fps_host,
    grid_subsample,
    knn_host,
    native_available,
)


def test_native_builds():
    assert native_available(), "g++ build of the host ops library failed"


def test_grid_subsample_dedupes_voxels():
    pts = np.array(
        [[0.0, 0.0, 0.0], [0.01, 0.0, 0.0], [1.0, 0.0, 0.0], [1.01, 0.01, 0.0], [0.0, 1.0, 0.0]],
        np.float32,
    )
    idx = grid_subsample(pts, cell=0.1)
    assert set(idx.tolist()) == {0, 2, 4}


def test_fps_matches_jax_kernel():
    import jax.numpy as jnp

    from mla_tpu.ops.pointops import furthest_point_sample

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    host = fps_host(pts, 16, start=0)
    dev = np.asarray(furthest_point_sample(jnp.asarray(pts)[None], 16, deterministic=True))[0]
    np.testing.assert_array_equal(host, dev)


def test_knn_correct():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    q = pts[:5]
    idx = knn_host(pts, q, 4)
    d = ((q[:, None] - pts[None]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :4]
    # nearest is the point itself; compare sets per row (ties may reorder)
    for r in range(5):
        assert idx[r, 0] == r
        assert set(idx[r].tolist()) == set(want[r].tolist())


def test_chamfer_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(50, 3)).astype(np.float32)
    b = rng.normal(size=(70, 3)).astype(np.float32)
    got = chamfer_distance_host(a, b)
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    want = d.min(1).mean() + d.min(0).mean()
    assert got == pytest.approx(want, rel=1e-5)
    assert chamfer_distance_host(a, a) == pytest.approx(0.0, abs=1e-6)
