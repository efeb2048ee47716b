"""Point-cloud ops: FPS, kNN, ball query, grouping, 3-NN interpolation.

TPU-native rebirth of the reference's dormant CUDA extensions
(vla/datasets/cpp/{pointops,pointnet2_batch}, SURVEY.md section 2.9) and of
the pure-torch fallbacks actually used on the active path
(models/mla/pointcloud/backbone/Point_PN.py:6-94).

Design:
  * Everything is batched, statically shaped, vmap/jit-friendly.
  * FPS is the only sequential op: a `lax.fori_loop` carrying the per-point
    min-distance field; each iteration is one fused distance update + argmax
    over N points — the whole loop stays on-chip (VPU), no host sync.
    `deterministic=True` starts from point 0 (bit-reproducible; the
    reference seeds with torch.randint, Point_PN.py:10 — stochastic).
  * kNN is one [S, N] distance matrix (MXU matmul) + top_k.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2: src [..., N, C], dst [..., M, C] -> [..., N, M].

    Uses |a|^2 + |b|^2 - 2ab so the inner term rides the MXU
    (reference Point_PN.py:23-42 computes the same decomposition)."""
    inner = jnp.einsum("...nc,...mc->...nm", src, dst, preferred_element_type=jnp.float32)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
    return s2 + d2 - 2.0 * inner


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: points [B, N, C], idx [B, ...] -> [B, ..., C]
    (reference Point_PN.py:44-60)."""
    return jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(points, idx)


def furthest_point_sample(
    xyz: jnp.ndarray,
    npoint: int,
    *,
    key: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """FPS indices [B, npoint] for xyz [B, N, 3].

    Matches the reference algorithm (Point_PN.py:6-21): iteratively pick the
    point furthest from the selected set, tracking the running min distance.
    Start point: index 0 when deterministic (bit-match mode), else uniform
    random per batch element via `key` (reference uses torch.randint).

    On TPU the whole sequential loop runs inside one Pallas kernel
    (ops/pointops_pallas.py) — identical indices, no per-iteration dispatch."""
    B, N, _ = xyz.shape
    xyzf = xyz.astype(jnp.float32)
    if deterministic or key is None:
        farthest0 = jnp.zeros((B,), dtype=jnp.int32)
    else:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and N % 128 == 0
    if use_pallas:
        from mla_tpu.ops.pointops_pallas import fps_pallas

        return fps_pallas(xyzf, npoint, start=farthest0)

    batch_ar = jnp.arange(B)

    def body(i, carry):
        fps_idx, distance, farthest = carry
        fps_idx = fps_idx.at[:, i].set(farthest)
        centroid = xyzf[batch_ar, farthest][:, None, :]  # [B,1,3]
        dist = jnp.sum((xyzf - centroid) ** 2, axis=-1)  # [B,N]
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return fps_idx, distance, farthest

    fps_idx0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    dist0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    fps_idx, _, _ = jax.lax.fori_loop(0, npoint, body, (fps_idx0, dist0, farthest0))
    return fps_idx


def knn(nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    """k nearest neighbors: xyz [B,N,3], new_xyz [B,S,3] -> idx [B,S,k]
    (reference knn_point, Point_PN.py:62-73). Downstream aggregation is
    order-invariant (max-pool), so neighbor ordering may differ from torch's
    unsorted topk."""
    d = square_distance(new_xyz, xyz)  # [B,S,N]
    _, idx = jax.lax.top_k(-d, nsample)
    return idx


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """Fixed-radius neighborhood query (parity with pointops ballquery CUDA
    kernel, vla/datasets/cpp/pointops/src/ballquery). Returns [B,S,nsample]
    indices; slots beyond the in-radius count repeat the first in-radius
    neighbor (the CUDA kernel's convention)."""
    d = square_distance(new_xyz, xyz)  # [B,S,N]
    in_ball = d <= radius * radius
    # order candidates: in-ball points by index order, others pushed to +inf
    N = xyz.shape[1]
    order_key = jnp.where(in_ball, jnp.arange(N, dtype=jnp.float32)[None, None, :], jnp.inf)
    _, idx = jax.lax.top_k(-order_key, nsample)  # smallest index first
    # replicate first valid neighbor into empty slots
    has_any = jnp.any(in_ball, axis=-1, keepdims=True)
    first = idx[..., :1]
    count = jnp.sum(in_ball, axis=-1, keepdims=True)
    slot = jnp.arange(nsample)[None, None, :]
    idx = jnp.where(slot < count, idx, first)
    idx = jnp.where(has_any, idx, 0)
    return idx


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B,N,C], idx [B,S,k] -> [B,S,k,C] (pointnet2 group_points)."""
    return index_points(points, idx)


def three_nn_interpolate(
    unknown_xyz: jnp.ndarray,
    known_xyz: jnp.ndarray,
    known_feats: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance-weighted 3-NN feature interpolation
    (pointnet2 three_nn + three_interpolate; vla/datasets/cpp/pointnet2_batch
    src/interpolate). unknown [B,N,3], known [B,M,3], feats [B,M,C] -> [B,N,C]."""
    d = square_distance(unknown_xyz, known_xyz)  # [B,N,M]
    neg_d3, idx3 = jax.lax.top_k(-d, 3)
    # square_distance's |a|^2+|b|^2-2ab form can return tiny NEGATIVE values
    # for (near-)coincident points under fp32 cancellation — common here,
    # since known_xyz is usually an FPS subset of unknown_xyz. A negative d
    # would flip the weight's sign (the CUDA reference's sum-of-squares
    # distance is always >= 0), so clamp before inverting.
    w = 1.0 / (jnp.maximum(-neg_d3, 0.0) + eps)  # [B,N,3]
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = index_points(known_feats, idx3)  # [B,N,3,C]
    return jnp.sum(gathered * w[..., None].astype(gathered.dtype), axis=-2)


def fps_knn(
    xyz: jnp.ndarray,
    feats: jnp.ndarray,
    group_num: int,
    k_neighbors: int,
    *,
    key: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The FPS_kNN stage of Point_PN (reference Point_PN.py:76-94):
    returns (lc_xyz, lc_x, knn_xyz, knn_x, fps_idx, knn_idx)."""
    fps_idx = furthest_point_sample(xyz, group_num, key=key, deterministic=deterministic)
    lc_xyz = index_points(xyz, fps_idx)
    lc_x = index_points(feats, fps_idx)
    knn_idx = knn(k_neighbors, xyz, lc_xyz)
    knn_xyz = index_points(xyz, knn_idx)
    knn_x = index_points(feats, knn_idx)
    return lc_xyz, lc_x, knn_xyz, knn_x, fps_idx, knn_idx


# --------------------------------------------------------------------------- #
# Point-transformer ops (reference pointops Subtraction/Aggregation/
# queryandgroup, vla/datasets/cpp/pointops/functions/pointops.py:106-244).
# The CUDA autograd Functions become plain jnp expressions — JAX autodiff
# reproduces the hand-written backward kernels exactly (tested).
# --------------------------------------------------------------------------- #


def subtraction(input1: jnp.ndarray, input2: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[..., i, j, :] = input1[..., i, :] - input2[..., idx[i, j], :].

    input1/input2: [..., N, C], idx: [..., N, K] int -> [..., N, K, C]
    (reference subtraction_forward_cuda semantics)."""
    gathered = jnp.take_along_axis(
        input2[..., None, :], idx[..., None].astype(jnp.int32), axis=-3
    )
    return input1[..., :, None, :] - gathered


def aggregation(
    feat: jnp.ndarray, position: jnp.ndarray, weight: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Point-transformer vector-attention aggregation
    (aggregation_forward_cuda): out[i, c] = sum_j (feat[idx[i,j], c] +
    position[i, j, c]) * weight[i, j, c % w_c].

    feat: [..., N, C], position: [..., N, K, C], weight: [..., N, K, w_c]
    with w_c dividing C (shared-plane weights), idx: [..., N, K] -> [..., N, C]."""
    g = jnp.take_along_axis(
        feat[..., None, :], idx[..., None].astype(jnp.int32), axis=-3
    )  # [..., N, K, C]
    reps = feat.shape[-1] // weight.shape[-1]
    w = jnp.tile(weight, (1,) * (weight.ndim - 1) + (reps,))
    return ((g + position) * w).sum(axis=-2)


def query_and_group(
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: Optional[jnp.ndarray],
    feat: jnp.ndarray,
    idx: Optional[jnp.ndarray] = None,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Reference queryandgroup (pointops.py:151-173), batched: kNN-group
    features around query centers with center-relative coordinates.

    xyz: [B, N, 3], new_xyz: [B, M, 3] (None -> xyz), feat: [B, N, C]
    -> [B, M, K, 3+C] (or [B, M, K, C] when use_xyz=False)."""
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        idx = knn(nsample, xyz, new_xyz)  # [B, M, K]
    grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
    grouped_feat = index_points(feat, idx)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    return grouped_feat
