"""OpenPoints-style point-cloud layer library, TPU-native.

Parity target: the reference's vendored PointNeXt/OpenPoints module lib
(`models/mla/pointcloud/`): the config registry (`registry_utils.py`,
`build.py`), `layers/{kmeans,graph_conv,local_aggregation,upsampling,
drop}.py` and the PEFT multi-view utilities (`peft_module/{adapter,
mv_utils}.py`). The MLA *active* path only consumes Point_PN
(`models/point_tokenizer.py`) through `ops/pointops.py`; this module
completes the library surface a PointNeXt-style user would reach for —
redesigned functional-JAX (params = dict pytrees, `(init, apply)` pairs,
`lax`-friendly static shapes) rather than a torch module port:

  * `Registry` / `build_from_cfg`          (registry_utils.py:1-120)
  * `CHANNEL_MAP` / `neighborhood_features` (local_aggregation.py:13-36)
  * `kmeans` batched Lloyd iterations + `kmeans_embed` grouping
    (layers/kmeans.py:8-66; fast_pytorch_kmeans + torch_scatter replaced
    by one-hot matmuls — segment reductions as MXU work, no scatter)
  * `edge_conv` / `mr_conv` dense graph convolutions + `dilated_knn`
    (layers/graph_conv.py:24-60, layers/knn.py)
  * `three_interpolate` feature propagation (layers/upsampling.py)
  * `drop_path` stochastic depth (layers/drop.py)
  * PEFT bottleneck `adapter` with QuickGELU (peft_module/adapter.py:10-47)
  * multi-view: `euler2mat`, `point_transform`, `points2depth`, `PCViews`
    6-view projection (peft_module/mv_utils.py:8-360; scatter_add replaced
    by bincount-style segment sums)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu import nn
from mla_tpu.ops import pointops

Params = Dict[str, Any]


# --------------------------------------------------------------------------- #
# Registry (reference registry_utils.Registry + build.build_model_from_cfg)
# --------------------------------------------------------------------------- #


class Registry:
    """Name -> builder registry driven by config dicts with a NAME key."""

    def __init__(self, name: str) -> None:
        self.name = name
        self._builders: Dict[str, Callable] = {}

    def register(self, fn: Optional[Callable] = None, *, name: Optional[str] = None):
        def deco(f):
            key = name or f.__name__
            if key in self._builders:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._builders[key] = f
            return f

        return deco(fn) if fn is not None else deco

    def get(self, name: str) -> Callable:
        if name not in self._builders:
            raise KeyError(f"{name!r} not in registry {self.name}; have {sorted(self._builders)}")
        return self._builders[name]

    def build(self, cfg: Dict[str, Any], **kwargs):
        """cfg = {"NAME": <registered name>, ...builder kwargs}."""
        cfg = dict(cfg)
        name = cfg.pop("NAME")
        return self.get(name)(**cfg, **kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._builders

    def keys(self):
        return sorted(self._builders)


MODELS = Registry("models")


def build_from_cfg(cfg: Dict[str, Any], registry: Registry = MODELS, **kwargs):
    return registry.build(cfg, **kwargs)


@MODELS.register(name="Point_PN")
def _build_point_pn(**cfg_kwargs):
    """Config-driven Point_PN build (reference build_model_from_cfg with
    the Point_PN NAME): returns (cfg, init, apply)."""
    from mla_tpu.models import point_tokenizer as pt

    cfg = pt.PointTokenizerConfig(**cfg_kwargs)
    return cfg, (lambda key: pt.point_tokenizer_init(key, cfg)), pt.point_tokenizer


@MODELS.register(name="KMeansEmbed")
def _build_kmeans_embed(in_chans: int = 3, num_groups: int = 256,
                        encoder_dim: int = 256, feature_type: str = "dp"):
    def init(key):
        return kmeans_embed_init(key, in_chans, encoder_dim, feature_type)

    def apply(p, xyz):
        return kmeans_embed(p, xyz, num_groups=num_groups, feature_type=feature_type)

    return init, apply


# --------------------------------------------------------------------------- #
# Neighborhood feature assembly (reference local_aggregation.CHANNEL_MAP)
# --------------------------------------------------------------------------- #

CHANNEL_MAP: Dict[str, Callable[[int], int]] = {
    "fj": lambda x: x,
    "df": lambda x: x,
    "assa": lambda x: x * 3,
    "assa_dp": lambda x: x * 3 + 3,
    "dp_fj": lambda x: 3 + x,
    "pj": lambda x: x,
    "dp": lambda x: 3,
    "pi_dp": lambda x: x + 3,
    "pj_dp": lambda x: x + 3,
    "dp_fj_df": lambda x: x * 2 + 3,
    "dp_fi_df": lambda x: x * 2 + 3,
    "pi_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_df": lambda x: x + 6,
    "dp_df": lambda x: x + 3,
}


def neighborhood_features(
    feature_type: str,
    p_j: jnp.ndarray,              # [B, N, K, 3] neighbor coords
    p_i: jnp.ndarray,              # [B, N, 1, 3] center coords
    f_j: Optional[jnp.ndarray] = None,  # [B, N, K, C] neighbor features
    f_i: Optional[jnp.ndarray] = None,  # [B, N, 1, C] center features
) -> jnp.ndarray:
    """Assemble grouped features per CHANNEL_MAP key ('dp' = relative
    coords, 'pj_dp' = absolute + relative, 'dp_fj_df' = rel coords +
    neighbor feats + feature deltas, ...)."""
    dp = p_j - p_i
    parts = {
        "dp": lambda: [dp],
        "pj": lambda: [p_j],
        "fj": lambda: [f_j],
        "df": lambda: [f_j - f_i],
        "pj_dp": lambda: [p_j, dp],
        "pi_dp": lambda: [jnp.broadcast_to(p_i, p_j.shape), dp],
        "dp_fj": lambda: [dp, f_j],
        "dp_df": lambda: [dp, f_j - f_i],
        "dp_fj_df": lambda: [dp, f_j, f_j - f_i],
        "dp_fi_df": lambda: [dp, jnp.broadcast_to(f_i, f_j.shape), f_j - f_i],
        "pj_dp_df": lambda: [p_j, dp, f_j - f_i],
        "pi_dp_fj_df": lambda: [jnp.broadcast_to(p_i, p_j.shape), dp, f_j, f_j - f_i],
        "pj_dp_fj_df": lambda: [p_j, dp, f_j, f_j - f_i],
    }
    if feature_type not in parts:
        raise ValueError(f"unknown feature_type {feature_type!r}")
    return jnp.concatenate(parts[feature_type](), axis=-1)


# --------------------------------------------------------------------------- #
# Batched k-means (reference layers/kmeans.py via fast_pytorch_kmeans)
# --------------------------------------------------------------------------- #


def kmeans(
    xyz: jnp.ndarray,      # [B, N, D]
    num_clusters: int,
    num_iters: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Lloyd's algorithm with deterministic FPS initialization
    (fast_pytorch_kmeans uses random init; FPS gives reproducible,
    well-spread starts and is the same primitive the rest of the stack
    uses). Returns (centroids [B, K, D], labels [B, N]).

    Static shapes + one-hot matmul segment means keep every iteration on
    the MXU; empty clusters keep their previous centroid."""
    B, N, D = xyz.shape
    init_idx = pointops.furthest_point_sample(xyz[..., :3], num_clusters)
    cent0 = pointops.index_points(xyz, init_idx)  # [B, K, D]

    def body(_, cent):
        d = pointops.square_distance(xyz, cent)          # [B, N, K]
        labels = jnp.argmin(d, axis=-1)                  # [B, N]
        onehot = jax.nn.one_hot(labels, num_clusters, dtype=xyz.dtype)  # [B,N,K]
        counts = onehot.sum(axis=1)                      # [B, K]
        sums = jnp.einsum("bnk,bnd->bkd", onehot, xyz)
        new = sums / jnp.maximum(counts, 1.0)[..., None]
        return jnp.where(counts[..., None] > 0, new, cent)

    cent = jax.lax.fori_loop(0, num_iters, body, cent0)
    labels = jnp.argmin(pointops.square_distance(xyz, cent), axis=-1)
    return cent, labels


def kmeans_embed_init(key, in_chans: int = 3, encoder_dim: int = 256,
                      feature_type: str = "dp") -> Params:
    """KMeansEmbed (reference kmeans.py:8-66): per-point MLP -> cluster
    max-pool -> concat pooled-back -> MLP -> cluster max-pool."""
    channels = CHANNEL_MAP[feature_type](in_chans)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": {
            "fc1": nn.linear_init(k1, channels, 128),
            "ln": nn.layer_norm_init(128),
            "fc2": nn.linear_init(k2, 128, 256),
        },
        "conv2": {
            "fc1": nn.linear_init(k3, 512, 512),
            "ln": nn.layer_norm_init(512),
            "fc2": nn.linear_init(k4, 512, encoder_dim),
        },
    }


def _segment_max(values: jnp.ndarray, labels: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, N, C] max-reduced by cluster label -> [B, K, C] (empty -> 0),
    torch_scatter reduce='max' semantics. vmapped segment_max keeps memory
    at O(N*C) (a one-hot expansion would materialize [B, N, K, C])."""
    out = jax.vmap(
        lambda v, l: jax.ops.segment_max(v, l, num_segments=k)
    )(values, labels)
    # segment_max fills empty segments with -inf; torch_scatter yields 0
    return jnp.where(jnp.isfinite(out), out, 0.0)


def kmeans_embed(
    p: Params,
    xyz: jnp.ndarray,                  # [B, N, 3]
    num_groups: int = 256,
    feature_type: str = "dp",
    num_iters: int = 10,
):
    """Returns (centroids [B,K,3], group features [B,K,C], per-point
    centers p_i [B,N,3], labels [B,N])."""
    cent, labels = kmeans(xyz, num_groups, num_iters)
    p_i = pointops.index_points(cent, labels)  # [B, N, 3]
    rel = xyz - p_i
    if feature_type == "dp":
        feats = rel
    elif feature_type == "pj_dp":
        feats = jnp.concatenate([xyz, rel], -1)
    elif feature_type == "pi_dp":
        feats = jnp.concatenate([p_i, rel], -1)
    else:
        raise ValueError(f"unsupported feature_type {feature_type!r}")

    def mlp(block, x):
        h = nn.linear(block["fc1"], x)
        h = nn.layer_norm(block["ln"], h)
        h = jax.nn.relu(h)
        return nn.linear(block["fc2"], h)

    per_point = mlp(p["conv1"], feats)                    # [B, N, 256]
    pooled = _segment_max(per_point, labels, num_groups)  # [B, K, 256]
    back = pointops.index_points(pooled, labels)          # [B, N, 256]
    fused = jnp.concatenate([back, per_point], -1)        # [B, N, 512]
    out = _segment_max(mlp(p["conv2"], fused), labels, num_groups)
    return cent, out, p_i, labels


# --------------------------------------------------------------------------- #
# Graph convolutions (reference layers/graph_conv.py) + dilated kNN
# --------------------------------------------------------------------------- #


def dilated_knn(k: int, dilation: int, xyz: jnp.ndarray) -> jnp.ndarray:
    """kNN with dilation d: of the k*d nearest, keep every d-th
    (reference layers/knn.DilatedKNN, stochastic=False)."""
    idx = pointops.knn(k * dilation, xyz, xyz)  # [B, N, k*d]
    return idx[..., ::dilation]


def graph_conv_init(key, in_channels: int, out_channels: int) -> Params:
    return {"fc": nn.linear_init(key, in_channels * 2, out_channels),
            "ln": nn.layer_norm_init(out_channels)}


def edge_conv(p: Params, x: jnp.ndarray, edge_index: jnp.ndarray) -> jnp.ndarray:
    """EdgeConv (DGCNN): max_k MLP([x_i, x_j - x_i]).
    x [B, N, C], edge_index [B, N, K] -> [B, N, C_out]."""
    x_j = pointops.index_points(x, edge_index)            # [B, N, K, C]
    x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
    h = jnp.concatenate([x_i, x_j - x_i], axis=-1)
    h = jax.nn.relu(nn.layer_norm(p["ln"], nn.linear(p["fc"], h)))
    return h.max(axis=2)


def mr_conv(p: Params, x: jnp.ndarray, edge_index: jnp.ndarray) -> jnp.ndarray:
    """Max-Relative graph conv: MLP([x_i, max_k (x_j - x_i)])."""
    x_j = pointops.index_points(x, edge_index)
    rel = (x_j - x[:, :, None, :]).max(axis=2)
    h = jnp.concatenate([x, rel], axis=-1)
    return jax.nn.relu(nn.layer_norm(p["ln"], nn.linear(p["fc"], h)))


GCN_LAYERS = Registry("gcn_layers")
GCN_LAYERS.register(edge_conv, name="edgeconv")
GCN_LAYERS.register(edge_conv, name="edge")
GCN_LAYERS.register(mr_conv, name="mrconv")


# --------------------------------------------------------------------------- #
# Upsampling / feature propagation (reference layers/upsampling.py)
# --------------------------------------------------------------------------- #


def three_interpolate(
    unknown_xyz: jnp.ndarray,  # [B, N, 3] target positions
    known_xyz: jnp.ndarray,    # [B, M, 3] source positions
    known_feats: jnp.ndarray,  # [B, M, C] source features
) -> jnp.ndarray:
    """Inverse-distance weighted 3-NN interpolation [B, N, C]
    (ThreeNN + three_interpolate; shares ops/pointops' implementation)."""
    return pointops.three_nn_interpolate(unknown_xyz, known_xyz, known_feats)


# --------------------------------------------------------------------------- #
# Stochastic depth (reference layers/drop.DropPath)
# --------------------------------------------------------------------------- #


def drop_path(key, x: jnp.ndarray, rate: float, training: bool = True) -> jnp.ndarray:
    """Per-sample residual-branch drop with 1/(1-rate) rescale."""
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0)


# --------------------------------------------------------------------------- #
# PEFT bottleneck adapter (reference peft_module/adapter.AdapterSuper)
# --------------------------------------------------------------------------- #


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def adapter_init(key, embed_dims: int, reduction_dims: int) -> Params:
    """Xavier weights, bias ~ N(0, 1e-6) (adapter.py init_weights)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "ln1": nn.linear_init(k1, embed_dims, reduction_dims, w_init="xavier"),
        "ln2": nn.linear_init(k2, reduction_dims, embed_dims, w_init="xavier"),
    }
    p["ln1"]["b"] = 1e-6 * jax.random.normal(k3, (reduction_dims,))
    p["ln2"]["b"] = 1e-6 * jax.random.normal(k4, (embed_dims,))
    return p


def adapter(
    p: Params,
    x: jnp.ndarray,
    identity: Optional[jnp.ndarray] = None,
    *,
    drop_rate: float = 0.0,
    key=None,
    training: bool = False,
) -> jnp.ndarray:
    """identity + ln2(dropout(quick_gelu(ln1(x))))."""
    out = quick_gelu(nn.linear(p["ln1"], x))
    if training and drop_rate > 0.0:
        if key is None:
            raise ValueError("dropout requires a PRNG key")
        keep = 1.0 - drop_rate
        out = jnp.where(jax.random.bernoulli(key, keep, out.shape), out / keep, 0.0)
    out = nn.linear(p["ln2"], out)
    return (x if identity is None else identity) + out


# --------------------------------------------------------------------------- #
# Multi-view projection utilities (reference peft_module/mv_utils.py)
# --------------------------------------------------------------------------- #

MV_TRANS = -1.6  # camera z-translation (mv_utils.py:6)


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """[3] or [B, 3] euler angles -> rotation matrix [3,3] / [B,3,3]
    (R = Rx @ Ry @ Rz, mv_utils.py:8-55)."""
    squeeze = angle.ndim == 1
    a = angle[None] if squeeze else angle
    x, y, z = a[:, 0], a[:, 1], a[:, 2]
    zero, one = jnp.zeros_like(x), jnp.ones_like(x)
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zmat = jnp.stack([cz, -sz, zero, sz, cz, zero, zero, zero, one], -1).reshape(-1, 3, 3)
    ymat = jnp.stack([cy, zero, sy, zero, one, zero, -sy, zero, cy], -1).reshape(-1, 3, 3)
    xmat = jnp.stack([one, zero, zero, zero, cx, -sx, zero, sx, cx], -1).reshape(-1, 3, 3)
    rot = xmat @ ymat @ zmat
    return rot[0] if squeeze else rot


def point_transform(points: jnp.ndarray, rot_mat: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """points @ rot - translation (mv_utils.PCViews.point_transform)."""
    return points @ rot_mat - translation


def points2depth(
    points: jnp.ndarray,  # [B, N, 3] camera-frame points (z < 0 toward camera)
    image_height: int,
    image_width: int,
    size_x: int = 4,
    size_y: int = 4,
) -> jnp.ndarray:
    """Project to an inverse-depth-weighted depth image [B, H, W]
    (mv_utils.points2depth + distribute). Each point splats its depth over
    a size_x x size_y pixel footprint, weighted by 1/depth; out-of-canvas
    or negative-depth samples are masked. scatter_add is realized as
    jnp.zeros(...).at[].add (XLA scatter), matching torch semantics."""
    assert size_x % 2 == 0 or size_x == 1
    assert size_y % 2 == 0 or size_y == 1
    eps = 1e-12
    coord_x = (points[:, :, 0] / (points[:, :, 2] + eps)) * (image_width / image_height)
    coord_y = points[:, :, 1] / (points[:, :, 2] + eps)
    depth = points[:, :, 2]
    _x = (coord_x + 1) * image_height / 2
    _y = (coord_y + 1) * image_width / 2

    B, N = depth.shape
    _i = jnp.linspace(-size_x / 2, size_x / 2 - 1, size_x)
    _j = jnp.linspace(-size_y / 2, size_y / 2 - 1, size_y)
    ex = jnp.ceil(_x[:, :, None, None] + _i[None, None, :, None])  # [B,N,sx,1]
    ey = jnp.ceil(_y[:, :, None, None] + _j[None, None, None, :])  # [B,N,1,sy]
    ex = jnp.broadcast_to(ex, (B, N, size_x, size_y))
    ey = jnp.broadcast_to(ey, (B, N, size_x, size_y))
    value = jnp.broadcast_to(depth[:, :, None, None], ex.shape)

    masked = (
        (ex >= 0) & (ex <= image_height - 1) & (ey >= 0) & (ey <= image_width - 1)
        & (value >= 0)
    )
    ex = ex % image_height
    ey = ey % image_width
    weight = masked.astype(points.dtype) / (value + eps)
    weighted_value = value * weight

    coords = (ex * image_width + ey).astype(jnp.int32).reshape(B, -1)
    w_flat = weight.reshape(B, -1)
    wv_flat = weighted_value.reshape(B, -1)
    HW = image_height * image_width
    w_scat = jnp.zeros((B, HW), points.dtype).at[
        jnp.arange(B)[:, None], coords
    ].add(w_flat)
    wv_scat = jnp.zeros((B, HW), points.dtype).at[
        jnp.arange(B)[:, None], coords
    ].add(wv_flat)
    w_scat = w_scat + (w_scat == 0.0)
    return (wv_scat / w_scat).reshape(B, image_height, image_width)


# the six canonical PCViews camera poses (mv_utils.py:316-323)
_PCVIEWS = np.asarray(
    [
        [[0 * np.pi / 2, 0, np.pi / 2], [0, 0, MV_TRANS]],
        [[1 * np.pi / 2, 0, np.pi / 2], [0, 0, MV_TRANS]],
        [[2 * np.pi / 2, 0, np.pi / 2], [0, 0, MV_TRANS]],
        [[3 * np.pi / 2, 0, np.pi / 2], [0, 0, MV_TRANS]],
        [[0, -np.pi / 2, np.pi / 2], [0, 0, MV_TRANS]],
        [[0, np.pi / 2, np.pi / 2], [0, 0, MV_TRANS]],
    ]
)


class PCViews:
    """6 fixed orthogonal views; get_img projects a point cloud into the
    view depth images (mv_utils.PCViews)."""

    num_views = 6

    def __init__(self) -> None:
        angles = jnp.asarray(_PCVIEWS[:, 0, :], jnp.float32)
        self.rot_mat = jnp.swapaxes(euler2mat(angles), 1, 2)      # [V,3,3]
        self.translation = jnp.asarray(_PCVIEWS[:, 1, :], jnp.float32)[:, None, :]

    def get_img(self, points: jnp.ndarray, resolution: int = 128,
                size_x: int = 1, size_y: int = 1) -> jnp.ndarray:
        """[B, N, 3] -> [B * 6, resolution, resolution] depth images."""
        B = points.shape[0]
        V = self.num_views
        pts = jnp.repeat(points, V, axis=0)                       # [B*V, N, 3]
        rot = jnp.tile(self.rot_mat, (B, 1, 1))
        trans = jnp.tile(self.translation, (B, 1, 1))
        proj = point_transform(pts, rot, trans)
        return points2depth(proj, resolution, resolution, size_x, size_y)
