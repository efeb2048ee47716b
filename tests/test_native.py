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


def test_prepare_pointcloud_paths():
    """Raw-cloud preprocessing: voxel subsample + exact-count adjust covers
    oversized, undersized, and exact inputs deterministically."""
    import numpy as np

    from mla_tpu.native.pointops_host import prepare_pointcloud

    rng = np.random.default_rng(0)
    dense = rng.uniform(0, 1, size=(5000, 3)).astype(np.float32)
    out = prepare_pointcloud(dense, 1024, cell=0.05)
    assert out.shape == (1024, 3)
    # deterministic for a fixed seed
    np.testing.assert_array_equal(out, prepare_pointcloud(dense, 1024, cell=0.05))
    # voxel subsample keeps the first point per cell -> output is a subset
    as_set = {tuple(p) for p in np.round(dense, 6)}
    assert all(tuple(p) in as_set for p in np.round(out, 6))

    small = dense[:100]
    up = prepare_pointcloud(small, 256)
    assert up.shape == (256, 3)
    assert {tuple(p) for p in np.round(up, 6)} <= {tuple(p) for p in np.round(small, 6)}

    exact = dense[:512]
    np.testing.assert_array_equal(prepare_pointcloud(exact, 512), exact)

    # --voxel_cell is honored even on exact-size clouds: a dense cloud of
    # duplicate sensor returns deduplicates through the voxel pass and is
    # re-upsampled to target_n afterwards
    dup = np.repeat(dense[:64], 8, axis=0)  # 512 points, 64 unique
    out_dup = prepare_pointcloud(dup, 512, cell=0.05)
    assert out_dup.shape == (512, 3)
    uniq = {tuple(p) for p in np.round(out_dup, 6)}
    assert len(uniq) <= 64
