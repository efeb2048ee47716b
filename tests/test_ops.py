import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.ops import attention, chamfer, pointops, projection, rope


# ---------------------------------------------------------------------------
# pointops
# ---------------------------------------------------------------------------


def test_square_distance_matches_naive():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 10, 3)).astype(np.float32)
    b = rng.normal(size=(2, 7, 3)).astype(np.float32)
    got = np.asarray(pointops.square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fps_matches_reference_algorithm():
    """Deterministic FPS (start=0) must match the reference torch loop
    (Point_PN.py:6-21) run with farthest initialized to 0."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)

    def torch_fps(xyz_np, npoint):
        x = torch.tensor(xyz_np)
        B, N, _ = x.shape
        fps_idx = torch.zeros(B, npoint, dtype=torch.long)
        farthest = torch.zeros(B, dtype=torch.long)
        distance = torch.ones(B, N) * 1e10
        for i in range(npoint):
            fps_idx[:, i] = farthest
            centroid = x[torch.arange(B), farthest, :].view(B, 1, 3)
            dist = torch.sum((x - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        return fps_idx.numpy()

    want = torch_fps(xyz, 16)
    got = np.asarray(pointops.furthest_point_sample(jnp.asarray(xyz), 16, deterministic=True))
    np.testing.assert_array_equal(got, want)


def test_fps_spreads_points():
    # FPS on a line should pick the endpoints early
    xyz = np.zeros((1, 100, 3), dtype=np.float32)
    xyz[0, :, 0] = np.linspace(0, 1, 100)
    idx = np.asarray(pointops.furthest_point_sample(jnp.asarray(xyz), 3))
    assert idx[0, 0] == 0
    assert idx[0, 1] == 99  # farthest from x=0
    assert idx[0, 2] in (49, 50)  # middle


def test_knn_correct():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(1, 32, 3)).astype(np.float32)
    q = xyz[:, :4]
    idx = np.asarray(pointops.knn(5, jnp.asarray(xyz), jnp.asarray(q)))
    d = ((q[:, :, None] - xyz[:, None]) ** 2).sum(-1)
    want = np.argsort(d, axis=-1)[..., :5]
    assert set(idx[0, 0]) == set(want[0, 0])
    # nearest neighbor of a query that IS a data point is itself
    assert idx[0, 0, 0] == 0


def test_index_points():
    pts = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
    idx = jnp.array([[1, 0], [3, 2]])
    out = np.asarray(pointops.index_points(pts, idx))
    np.testing.assert_allclose(out[0, 0], np.asarray(pts)[0, 1])
    np.testing.assert_allclose(out[1, 0], np.asarray(pts)[1, 3])


def test_ball_query_fills_with_first():
    xyz = np.zeros((1, 8, 3), dtype=np.float32)
    xyz[0, :, 0] = [0.0, 0.05, 0.07, 5, 6, 7, 8, 9]
    q = np.zeros((1, 1, 3), dtype=np.float32)
    idx = np.asarray(pointops.ball_query(0.1, 5, jnp.asarray(xyz), jnp.asarray(q)))
    assert list(idx[0, 0]) == [0, 1, 2, 0, 0]


def test_three_nn_interpolate_exact_at_known():
    rng = np.random.default_rng(3)
    known = rng.normal(size=(1, 10, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 10, 4)).astype(np.float32)
    out = np.asarray(
        pointops.three_nn_interpolate(jnp.asarray(known), jnp.asarray(known), jnp.asarray(feats))
    )
    np.testing.assert_allclose(out, feats, atol=1e-3)


# ---------------------------------------------------------------------------
# chamfer
# ---------------------------------------------------------------------------


def test_chamfer_matches_torch_cdist():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 20, 3)).astype(np.float32)
    b = rng.normal(size=(2, 30, 3)).astype(np.float32)
    got = float(chamfer.chamfer_distance_l2(jnp.asarray(a), jnp.asarray(b)))
    ta, tb = torch.tensor(a), torch.tensor(b)
    dm = torch.cdist(ta, tb)
    want = (dm.min(dim=2)[0].mean(dim=1) + dm.min(dim=1)[0].mean(dim=1)).mean().item()
    assert got == pytest.approx(want, abs=1e-4)


def test_chamfer_zero_for_identical():
    a = jnp.asarray(np.random.default_rng(5).normal(size=(1, 16, 3)).astype(np.float32))
    assert float(chamfer.chamfer_distance_l2(a, a)) < 1e-3


# ---------------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------------


def test_projection_matches_reference_torch():
    """Golden parity with the reference project_3d_to_2d_672_rlbench."""
    torch = pytest.importorskip("torch")
    cam = projection.get_camera_params("rlbench_front")
    rng = np.random.default_rng(6)
    # points roughly in the RLBench workspace
    pts = rng.uniform([-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(1, 64, 3)).astype(np.float32)

    got_idx, got_valid = projection.project_3d_to_2d(jnp.asarray(pts), cam)
    got_idx, got_valid = np.asarray(got_idx), np.asarray(got_valid)

    # reference math in torch (contrastive.py:5-45)
    K = torch.tensor(cam.K)
    R = torch.tensor(cam.R)
    t = torch.tensor(cam.t)
    scale = 672 / 224
    Ks = K.clone()
    Ks[0, 0] *= scale
    Ks[1, 1] *= scale
    Ks[0, 2] *= scale
    Ks[1, 2] *= scale
    Rw = R.T
    tw = -Rw @ t
    xyz_cam = torch.tensor(pts) @ Rw.T + tw
    uvw = xyz_cam @ Ks.T
    z = uvw[..., 2:]
    xy = uvw[..., :2] / (z + 1e-6)
    row = (xy[..., 1] / 42).floor().long()
    col = (xy[..., 0] / 42).floor().long()
    valid = (z.squeeze(-1) > 0) & (xy[..., 0] >= 0) & (xy[..., 0] < 672) & (xy[..., 1] >= 0) & (xy[..., 1] < 672)
    row = torch.clamp(row, 0, 15)
    col = torch.clamp(col, 0, 15)
    want_idx = torch.stack([row, col], dim=-1).numpy()
    np.testing.assert_array_equal(got_idx, want_idx)
    np.testing.assert_array_equal(got_valid, valid.numpy())
    assert got_valid.sum() > 0, "test points should partly project into frame"


# ---------------------------------------------------------------------------
# rope + attention
# ---------------------------------------------------------------------------


def test_rope_matches_hf_llama_formula():
    torch = pytest.importorskip("torch")
    hd, L = 8, 16
    cos, sin = rope.rope_tables(hd, L)
    q = np.random.default_rng(7).normal(size=(1, 2, 5, hd)).astype(np.float32)
    k = np.random.default_rng(8).normal(size=(1, 2, 5, hd)).astype(np.float32)
    pos = np.arange(5)
    got_q, got_k = rope.apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin, jnp.asarray(pos))

    # HF formula
    inv_freq = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    freqs = np.outer(pos, inv_freq)
    emb = np.concatenate([freqs, freqs], -1)
    c, s = np.cos(emb), np.sin(emb)

    def rot(x):
        return np.concatenate([-x[..., hd // 2 :], x[..., : hd // 2]], -1)

    want_q = q * c[None, None] + rot(q) * s[None, None]
    np.testing.assert_allclose(np.asarray(got_q), want_q.astype(np.float32), atol=1e-5)


def test_causal_sdpa_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(9)
    q = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    k = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    v = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    got = np.asarray(attention.sdpa_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), is_causal=True
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sdpa_bf16_scores_close_to_fp32():
    """The serving-prefill bandwidth lever (scores_dtype=bf16, softmax still
    fp32) must track the fp32-scores path closely on bf16 inputs and respect
    padding masks; default scores_dtype=None must stay bit-identical to the
    pre-lever path (training/goldens)."""
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.normal(size=(2, 4, 16, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 4, 16, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 4, 16, 32)), jnp.bfloat16)
    mask = np.ones((2, 16), dtype=bool)
    mask[:, -3:] = False
    m = jnp.asarray(mask)[:, None, None, :]
    ref = np.asarray(attention.sdpa_reference(q, k, v, mask=m), np.float32)
    got = np.asarray(
        attention.sdpa_reference(q, k, v, mask=m, scores_dtype=jnp.bfloat16), np.float32
    )
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 0.03, rel
    # masked-out queries attending over an all-masked row must stay finite
    assert np.isfinite(got).all()
    # the default (scores_dtype=None) branch must stay BIT-identical to the
    # pre-lever computation (training/golden contract) — spell that old code
    # path out and compare exactly, so a regression in the refactored default
    # branch (e.g. a stray low-precision round-trip) is caught here
    import math

    from mla_tpu.ops.attention import NEG_INF, make_causal_mask

    hd = q.shape[-1]
    old_scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    cm = make_causal_mask(q.shape[2], k.shape[2], 0)
    old_scores = jnp.where(cm[None, None], old_scores, NEG_INF)
    old_scores = jnp.where(m, old_scores, NEG_INF)
    old_probs = jax.nn.softmax(old_scores, axis=-1).astype(v.dtype)
    old = jnp.einsum("bhqk,bhkd->bhqd", old_probs, v)
    np.testing.assert_array_equal(
        np.asarray(attention.sdpa_reference(q, k, v, mask=m), np.float32),
        np.asarray(old, np.float32),
    )


def test_sdpa_with_kv_cache_offset():
    """Decoding one token with cache offset == full-sequence last row."""
    rng = np.random.default_rng(10)
    S = 7
    q = rng.normal(size=(1, 2, S, 8)).astype(np.float32)
    k, v = q + 1, q - 1
    full = np.asarray(attention.sdpa_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    last = np.asarray(
        attention.sdpa_reference(
            jnp.asarray(q[:, :, -1:]), jnp.asarray(k), jnp.asarray(v), causal_offset=S - 1
        )
    )
    np.testing.assert_allclose(last[:, :, 0], full[:, :, -1], atol=1e-5)


def test_sdpa_padding_mask():
    rng = np.random.default_rng(11)
    q = rng.normal(size=(1, 1, 4, 8)).astype(np.float32)
    k = rng.normal(size=(1, 1, 4, 8)).astype(np.float32)
    v = rng.normal(size=(1, 1, 4, 8)).astype(np.float32)
    # mask out key position 1 entirely
    mask = np.ones((1, 4, 4), dtype=bool)
    mask[:, :, 1] = False
    got = np.asarray(
        attention.sdpa_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(mask))
    )
    # same as removing key 1 from the sequence for the last query row
    got_reduced = np.asarray(
        attention.sdpa_reference(
            jnp.asarray(q[:, :, 3:]), jnp.asarray(k[:, :, [0, 2, 3]]), jnp.asarray(v[:, :, [0, 2, 3]]),
            causal=False,
        )
    )
    np.testing.assert_allclose(got[:, :, 3], got_reduced[:, :, 0], atol=1e-5)


def test_subtraction_matches_cuda_semantics():
    """out[i,j] = input1[i] - input2[idx[i,j]] (reference
    subtraction_forward_cuda) + autodiff reproduces the handwritten
    backward (scatter-add into input2)."""
    import jax

    rng = np.random.default_rng(0)
    N, K, C = 6, 3, 4
    a = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(N, K)).astype(np.int32))

    out = np.asarray(pointops.subtraction(a, b, idx))
    want = np.asarray(a)[:, None, :] - np.asarray(b)[np.asarray(idx)]
    np.testing.assert_allclose(out, want, atol=1e-6)

    # backward parity with the CUDA kernel: d/da = sum_j g, d/db = -scatter
    g = rng.normal(size=(N, K, C)).astype(np.float32)
    _, vjp = jax.vjp(lambda a_, b_: pointops.subtraction(a_, b_, idx), a, b)
    da, db = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(da), g.sum(1), atol=1e-5)
    db_want = np.zeros((N, C), np.float32)
    np.subtract.at(db_want, np.asarray(idx).reshape(-1), g.reshape(-1, C))
    np.testing.assert_allclose(np.asarray(db), db_want, atol=1e-5)


def test_aggregation_matches_cuda_semantics():
    """out[i,c] = sum_j (feat[idx[i,j],c] + pos[i,j,c]) * w[i,j,c % w_c]
    (reference aggregation_forward_cuda, shared-plane weights)."""
    rng = np.random.default_rng(1)
    N, K, C, WC = 5, 3, 6, 2
    feat = rng.normal(size=(N, C)).astype(np.float32)
    pos = rng.normal(size=(N, K, C)).astype(np.float32)
    w = rng.normal(size=(N, K, WC)).astype(np.float32)
    idx = rng.integers(0, N, size=(N, K)).astype(np.int32)

    out = np.asarray(
        pointops.aggregation(jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(w), jnp.asarray(idx))
    )
    want = np.zeros((N, C), np.float32)
    for i in range(N):
        for c in range(C):
            for j in range(K):
                want[i, c] += (feat[idx[i, j], c] + pos[i, j, c]) * w[i, j, c % WC]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_query_and_group():
    """Center-relative kNN grouping (reference queryandgroup)."""
    rng = np.random.default_rng(2)
    B, N, M, K, C = 2, 16, 4, 3, 5
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32))
    new_xyz = jnp.asarray(rng.uniform(-1, 1, size=(B, M, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    out = np.asarray(pointops.query_and_group(K, xyz, new_xyz, feat))
    assert out.shape == (B, M, K, 3 + C)
    idx = np.asarray(pointops.knn(K, xyz, new_xyz))
    for b in range(B):
        for m in range(M):
            np.testing.assert_allclose(
                out[b, m, :, :3],
                np.asarray(xyz)[b, idx[b, m]] - np.asarray(new_xyz)[b, m],
                atol=1e-6,
            )
            np.testing.assert_allclose(out[b, m, :, 3:], np.asarray(feat)[b, idx[b, m]], atol=1e-6)
