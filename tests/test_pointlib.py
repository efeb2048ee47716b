"""OpenPoints-style layer library (mla_tpu/models/pointlib.py): registry,
batched kmeans + KMeansEmbed grouping, graph convs, PEFT adapter, and the
multi-view projection utilities — the latter verified NUMERICALLY against
the reference's own torch `peft_module/mv_utils.py` loaded from
/root/reference (it depends only on torch+numpy)."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.models import pointlib as pl
from mla_tpu.ops import pointops

REF_MV = "/root/reference/models/mla/pointcloud/peft_module/mv_utils.py"


def _load_ref_mv():
    torch = pytest.importorskip("torch")
    del torch
    spec = importlib.util.spec_from_file_location("ref_mv_utils", REF_MV)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------- #
# registry
# --------------------------------------------------------------------------- #


def test_registry_build_from_cfg():
    reg = pl.Registry("test")

    @reg.register
    def widget(a, b=2):
        return a + b

    assert "widget" in reg
    assert reg.build({"NAME": "widget", "a": 3}) == 5
    assert pl.build_from_cfg({"NAME": "widget", "a": 1, "b": 10}, reg) == 11
    with pytest.raises(KeyError):
        reg.build({"NAME": "missing"})
    with pytest.raises(KeyError):
        reg.register(widget)  # duplicate
    # the graph-conv registry is pre-populated
    assert "edgeconv" in pl.GCN_LAYERS and "mrconv" in pl.GCN_LAYERS


# --------------------------------------------------------------------------- #
# kmeans
# --------------------------------------------------------------------------- #


def test_kmeans_converges_and_is_consistent():
    rng = np.random.default_rng(0)
    # 4 well-separated blobs per batch element
    centers = rng.normal(size=(2, 4, 3)) * 5
    pts = np.concatenate(
        [centers[:, i : i + 1] + 0.1 * rng.normal(size=(2, 32, 3)) for i in range(4)],
        axis=1,
    ).astype(np.float32)
    cent, labels = pl.kmeans(jnp.asarray(pts), num_clusters=4, num_iters=15)
    cent, labels = np.asarray(cent), np.asarray(labels)
    assert cent.shape == (2, 4, 3) and labels.shape == (2, 128)
    # labels are the argmin assignment to the returned centroids
    d = ((pts[:, :, None] - cent[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(labels, d.argmin(-1))
    # each true blob maps to exactly one cluster (well-separated case)
    for b in range(2):
        for i in range(4):
            assert len(np.unique(labels[b, 32 * i : 32 * (i + 1)])) == 1
    # centroids are stationary: recomputed means match
    for b in range(2):
        for k in range(4):
            sel = labels[b] == k
            np.testing.assert_allclose(cent[b, k], pts[b][sel].mean(0), atol=1e-5)


def test_kmeans_embed_shapes_and_pooling():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    p = pl.kmeans_embed_init(jax.random.PRNGKey(0), encoder_dim=96)
    cent, feats, p_i, labels = pl.kmeans_embed(p, xyz, num_groups=8, num_iters=5)
    assert cent.shape == (2, 8, 3)
    assert feats.shape == (2, 8, 96)
    assert p_i.shape == (2, 64, 3)
    assert labels.shape == (2, 64)
    assert np.isfinite(np.asarray(feats)).all()
    # p_i is the assigned centroid per point
    np.testing.assert_allclose(
        np.asarray(p_i), np.asarray(pointops.index_points(cent, labels)), atol=1e-6
    )


def test_segment_max_matches_numpy():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(2, 20, 5)).astype(np.float32)
    lab = rng.integers(0, 4, size=(2, 20))
    out = np.asarray(pl._segment_max(jnp.asarray(v), jnp.asarray(lab), 4))
    for b in range(2):
        for k in range(4):
            sel = lab[b] == k
            expect = v[b][sel].max(0) if sel.any() else np.zeros(5, np.float32)
            np.testing.assert_allclose(out[b, k], expect, atol=1e-6)


# --------------------------------------------------------------------------- #
# graph convs
# --------------------------------------------------------------------------- #


def test_edge_conv_matches_manual():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 6)).astype(np.float32))
    idx = pl.dilated_knn(4, 1, x[..., :3])
    p = pl.graph_conv_init(jax.random.PRNGKey(1), 6, 8)
    out = np.asarray(pl.edge_conv(p, x, idx))
    assert out.shape == (1, 16, 8)

    # manual: per-neighbor MLP([x_i, x_j - x_i]) then max over k
    xn, idxn = np.asarray(x), np.asarray(idx)
    w, b = np.asarray(p["fc"]["w"]), np.asarray(p["fc"]["b"])
    s, bb = np.asarray(p["ln"]["scale"]), np.asarray(p["ln"]["bias"])
    for n in range(16):
        rows = []
        for k in range(4):
            xi, xj = xn[0, n], xn[0, idxn[0, n, k]]
            h = np.concatenate([xi, xj - xi]) @ w + b
            mu, var = h.mean(), h.var()
            h = (h - mu) / np.sqrt(var + 1e-5) * s + bb
            rows.append(np.maximum(h, 0))
        np.testing.assert_allclose(out[0, n], np.max(rows, axis=0), atol=1e-4)


def test_dilated_knn_subsamples():
    rng = np.random.default_rng(4)
    xyz = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    full = np.asarray(pointops.knn(8, xyz, xyz))
    dil = np.asarray(pl.dilated_knn(4, 2, xyz))
    np.testing.assert_array_equal(dil, full[..., ::2])


def test_mr_conv_runs():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    idx = pl.dilated_knn(4, 1, x[..., :3])
    p = pl.graph_conv_init(jax.random.PRNGKey(2), 4, 12)
    out = pl.mr_conv(p, x, idx)
    assert out.shape == (2, 16, 12) and np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------- #
# adapter + drop_path
# --------------------------------------------------------------------------- #


def test_adapter_matches_reference_math():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    p = pl.adapter_init(jax.random.PRNGKey(3), 16, 4)
    out = np.asarray(pl.adapter(p, x))
    # manual: x + ln2(quick_gelu(ln1(x)))
    xn = np.asarray(x)
    h = xn @ np.asarray(p["ln1"]["w"]) + np.asarray(p["ln1"]["b"])
    h = h * (1.0 / (1.0 + np.exp(-1.702 * h)))
    h = h @ np.asarray(p["ln2"]["w"]) + np.asarray(p["ln2"]["b"])
    np.testing.assert_allclose(out, xn + h, atol=1e-5)
    # identity override
    ident = jnp.zeros_like(x)
    np.testing.assert_allclose(
        np.asarray(pl.adapter(p, x, identity=ident)), h, atol=1e-5
    )


def test_drop_path():
    x = jnp.ones((8, 4))
    np.testing.assert_array_equal(np.asarray(pl.drop_path(None, x, 0.0)), np.ones((8, 4)))
    np.testing.assert_array_equal(
        np.asarray(pl.drop_path(jax.random.PRNGKey(0), x, 0.9, training=False)),
        np.ones((8, 4)),
    )
    y = np.asarray(pl.drop_path(jax.random.PRNGKey(0), x, 0.5))
    # rows are either dropped or rescaled by 1/keep
    assert set(np.unique(y)).issubset({0.0, 2.0})


# --------------------------------------------------------------------------- #
# multi-view utilities vs the reference torch implementation
# --------------------------------------------------------------------------- #


def test_euler2mat_matches_reference():
    ref = _load_ref_mv()
    import torch

    rng = np.random.default_rng(7)
    ang = rng.uniform(-np.pi, np.pi, size=(5, 3)).astype(np.float32)
    ours = np.asarray(pl.euler2mat(jnp.asarray(ang)))
    theirs = ref.euler2mat(torch.tensor(ang)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # 1-D form
    np.testing.assert_allclose(
        np.asarray(pl.euler2mat(jnp.asarray(ang[0]))),
        ref.euler2mat(torch.tensor(ang[0])).numpy(), atol=1e-5,
    )


def test_points2depth_matches_reference():
    ref = _load_ref_mv()
    import torch

    rng = np.random.default_rng(8)
    pts = rng.uniform(-1, 1, size=(2, 200, 3)).astype(np.float32)
    pts[:, :, 2] += 2.5  # in front of the camera
    ours = np.asarray(pl.points2depth(jnp.asarray(pts), 32, 32, 4, 4))
    theirs = ref.points2depth(torch.tensor(pts), 32, 32, 4, 4).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_pcviews_projects_six_views():
    pv = pl.PCViews()
    rng = np.random.default_rng(9)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 128, 3)).astype(np.float32))
    imgs = np.asarray(pv.get_img(pts, resolution=32))
    assert imgs.shape == (12, 32, 32)
    assert np.isfinite(imgs).all()
    # projected depths are negative-through-camera translate (-1.6): nonzero
    assert (np.abs(imgs) > 0).any()


def test_models_registry_builds_point_pn_and_kmeans_embed():
    """Config-driven builds (reference build.build_model_from_cfg)."""
    cfg, init, apply = pl.build_from_cfg(
        {"NAME": "Point_PN", "input_points": 64, "embed_dim": 12,
         "k_neighbors": 8, "lga_blocks": (2, 1), "dim_expansion": (2, 2),
         "out_dim": 24}
    )
    params = init(jax.random.PRNGKey(0))
    assert params

    init2, apply2 = pl.build_from_cfg(
        {"NAME": "KMeansEmbed", "num_groups": 8, "encoder_dim": 32}
    )
    p2 = init2(jax.random.PRNGKey(1))
    rng = np.random.default_rng(10)
    xyz = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    cent, feats, _, _ = apply2(p2, xyz)
    assert cent.shape == (1, 8, 3) and feats.shape == (1, 8, 32)
