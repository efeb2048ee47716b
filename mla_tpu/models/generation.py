"""Future multisensory generation heads (post-training stage).

Parity target: reference models/mla/generation/{models.py,utils.py,
gen_loss.py} — three heads reading the LLM's final hidden states:
  * ImageGenerationModule (models.py:68-286): 128 learnable intent queries ->
    2-layer transformer decoder over LLM states -> MAE-style decoder over the
    256 patch slots (mask tokens at ROI) -> delta/alpha/offset heads ->
    warp + blend next-image 42x42 patches.
  * PointCloudGenerationModule (:289-386): project LLM states -> 1024-d,
    mean-pool -> 128 group features -> 4 transformer blocks -> Conv1d head
    -> 128x8 future points (+ optional FPS-center geometric prior).
  * TactileGenerationModule (:389-430): 1 query, 2-layer decoder -> 12-d.

TPU notes: the torch nn.TransformerDecoderLayer is rebuilt functionally
(post-norm layout, GELU, batch_first); the grid_sample patch warp is a
vectorized bilinear shift with border clamping; ROI boolean indexing in the
losses becomes masked means (identical values, static shapes). Dropout is
active only when an rng key is provided.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mla_tpu import nn
from mla_tpu.ops.chamfer import chamfer_distance_l2
from mla_tpu.ops.pointops import furthest_point_sample, index_points


# --------------------------------------------------------------------------- #
# shared pieces
# --------------------------------------------------------------------------- #


def _dropout(x, rate: float, key):
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def decoder_layer_init(key, d_model: int, ffn_dim: int) -> Dict[str, Any]:
    """torch nn.TransformerDecoderLayer params (post-norm, gelu)."""
    ks = jax.random.split(key, 4)
    return {
        "self_attn": nn.mha_init(ks[0], d_model, 1),  # head count at call time
        "cross_attn": nn.mha_init(ks[1], d_model, 1),
        "linear1": nn.linear_init(ks[2], d_model, ffn_dim, w_init="torch"),
        "linear2": nn.linear_init(ks[3], ffn_dim, d_model, w_init="torch"),
        "norm1": nn.layer_norm_init(d_model),
        "norm2": nn.layer_norm_init(d_model),
        "norm3": nn.layer_norm_init(d_model),
    }


def decoder_layer(p, tgt, memory, num_heads: int, dropout: float = 0.1, key=None):
    k1, k2, k3, k4 = (jax.random.split(key, 4) if key is not None else (None,) * 4)
    x = tgt
    x = nn.layer_norm(p["norm1"], x + _dropout(nn.mha(p["self_attn"], x, num_heads), dropout, k1))
    x = nn.layer_norm(
        p["norm2"], x + _dropout(nn.mha(p["cross_attn"], x, num_heads, kv=memory), dropout, k2)
    )
    # torch TransformerDecoderLayer: norm3(x + dropout3(linear2(dropout(act(linear1(x))))))
    ff = nn.linear(p["linear2"], _dropout(nn.gelu_exact(nn.linear(p["linear1"], x)), dropout, k3))
    return nn.layer_norm(p["norm3"], x + _dropout(ff, dropout, k4))


def transformer_decoder_init(key, num_layers: int, d_model: int, ffn_dim: int):
    return [decoder_layer_init(k, d_model, ffn_dim) for k in jax.random.split(key, num_layers)]


def transformer_decoder(layers, tgt, memory, num_heads, dropout=0.1, key=None):
    x = tgt
    for i, lp in enumerate(layers):
        lk = None if key is None else jax.random.fold_in(key, i)
        x = decoder_layer(lp, x, memory, num_heads, dropout, lk)
    return x


# pre-norm self-attn block used by the PC head (reference TransformerBlock:39-65)
def pc_block_init(key, dim: int, mlp_ratio: float = 4.0):
    ks = jax.random.split(key, 3)
    return {
        "attn": nn.mha_init(ks[0], dim, 1, qkv_bias=True),
        "norm1": nn.layer_norm_init(dim),
        "norm2": nn.layer_norm_init(dim),
        "fc1": nn.linear_init(ks[1], dim, int(dim * mlp_ratio), w_init="trunc_normal"),
        "fc2": nn.linear_init(ks[2], int(dim * mlp_ratio), dim, w_init="trunc_normal"),
    }


def pc_block(p, x, pos, num_heads, dropout=0.1, key=None):
    k1, k2 = (jax.random.split(key) if key is not None else (None, None))
    x_norm = nn.layer_norm(p["norm1"], x + pos if pos is not None else x)
    x = x + _dropout(nn.mha(p["attn"], x_norm, num_heads), dropout, k1)
    h = nn.linear(p["fc2"], _dropout(nn.gelu_exact(nn.linear(p["fc1"], nn.layer_norm(p["norm2"], x))), dropout, k2))
    return x + h


# --------------------------------------------------------------------------- #
# patch <-> image utilities (reference generation/utils.py)
# --------------------------------------------------------------------------- #


def images_to_patches(images: jnp.ndarray, patch_size: int = 42) -> jnp.ndarray:
    """[B, 3, 672, 672] -> [B, 256, 3*42*42], channel-major flatten per patch
    (utils.py:7-18)."""
    B, C, H, W = images.shape
    g = H // patch_size
    x = images.reshape(B, C, g, patch_size, g, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, p, p]
    return x.reshape(B, g * g, C * patch_size * patch_size)


def patches_to_images(patches: jnp.ndarray, patch_size: int = 42) -> jnp.ndarray:
    B, num_patches, patch_dim = patches.shape
    g = int(math.isqrt(num_patches))
    C = patch_dim // (patch_size * patch_size)
    x = patches.reshape(B, g, g, C, patch_size, patch_size)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, C, g * patch_size, g * patch_size)


def dilate_mask(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Boolean [B, H, W] max-pool dilation, same padding (utils.py:35-44)."""
    pad = (kernel_size - 1) // 2
    out = jax.lax.reduce_window(
        mask.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        (1, kernel_size, kernel_size),
        (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)],
    )
    return out > 0.0


def create_roi_mask_from_indices(patch_indices: jnp.ndarray, grid: int = 16) -> jnp.ndarray:
    """[B, N, 2] (row, col) -> [B, 16, 16] bool scatter (utils.py:46-64)."""
    B, N, _ = patch_indices.shape
    b = jnp.repeat(jnp.arange(B), N)
    y = patch_indices[..., 0].reshape(-1)
    x = patch_indices[..., 1].reshape(-1)
    return jnp.zeros((B, grid, grid), bool).at[b, y, x].set(True)


def translate_patches(patches_img: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Bilinear translation warp with border clamping.

    patches_img: [P, C, ps, ps]; offsets: [P, 2] (tx, ty) in pixels.
    Equivalent to torch affine_grid+grid_sample with a pure-translation theta
    (reference models.py:244-260): out(y, x) = in(y + ty, x + tx)."""
    P, C, ps, _ = patches_img.shape
    yy = jnp.arange(ps, dtype=jnp.float32)[:, None]
    xx = jnp.arange(ps, dtype=jnp.float32)[None, :]
    src_y = yy[None] + offsets[:, 1][:, None, None]  # [P, ps, ps]
    src_x = xx[None] + offsets[:, 0][:, None, None]

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0

    def clampi(v):
        return jnp.clip(v, 0, ps - 1).astype(jnp.int32)

    y0i, y1i = clampi(y0), clampi(y0 + 1)
    x0i, x1i = clampi(x0), clampi(x0 + 1)

    pidx = jnp.arange(P)[:, None, None]

    def gather(yi, xi):
        return patches_img[pidx, :, yi, xi]  # [P, ps, ps, C]

    v00, v01 = gather(y0i, x0i), gather(y0i, x1i)
    v10, v11 = gather(y1i, x0i), gather(y1i, x1i)
    wy_, wx_ = wy[..., None], wx[..., None]
    out = (
        v00 * (1 - wy_) * (1 - wx_)
        + v01 * (1 - wy_) * wx_
        + v10 * wy_ * (1 - wx_)
        + v11 * wy_ * wx_
    )
    return out.transpose(0, 3, 1, 2)  # [P, C, ps, ps]


# --------------------------------------------------------------------------- #
# Image generation module
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class ImageGenConfig:
    token_size: int = 4096
    num_gen_queries: int = 128
    decoder_layers: int = 3
    decoder_heads: int = 8
    image_patch_size: int = 42
    use_roi: bool = True
    roi_dilation_kernel_size: int = 3
    gen_delta_clip: float = 5.0
    max_patch_shift_pixels: int = 8
    use_patch_offset: bool = True
    num_patches: int = 256
    dropout: float = 0.1

    @property
    def patch_dim(self) -> int:
        return self.image_patch_size**2 * 3


def image_gen_init(key, cfg: ImageGenConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    D = cfg.token_size
    p = {
        "image_gen_queries": nn.normal_init(ks[0], (1, cfg.num_gen_queries, D), 0.02),
        "mae_mask_token": nn.normal_init(ks[1], (1, 1, D), 0.02),
        "mae_pos_embed": nn.normal_init(ks[2], (1, cfg.num_patches, D), 0.02),
        "intent_decoder": transformer_decoder_init(ks[3], 2, D, D * 2),
        "mae_decoder": transformer_decoder_init(ks[4], cfg.decoder_layers, D, D * 4),
        "mae_patch_norm": nn.layer_norm_init(D),
        "mae_delta_head": nn.linear_init(ks[5], D, cfg.patch_dim, w_init="normal"),
        "mae_alpha_head": nn.linear_init(ks[6], D, 1, w_init="normal"),
        "mae_offset_head": nn.linear_init(ks[7], D, 2, w_init="normal", w_std=0.001),
    }
    # alpha bias -3 (prefer copying current patch initially, models.py:148)
    p["mae_alpha_head"]["b"] = jnp.full_like(p["mae_alpha_head"]["b"], -3.0)
    return p


def image_gen_forward(
    params: Dict[str, Any],
    cfg: ImageGenConfig,
    llm_hidden_states: jnp.ndarray,       # [B, S, D]
    current_image_features: jnp.ndarray,  # [B, 256, D] projected img tokens
    current_images_patches: jnp.ndarray,  # [B, 256, patch_dim]
    roi_mask_2d: jnp.ndarray,             # [B, 16, 16] bool
    *,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    B = llm_hidden_states.shape[0]
    D = cfg.token_size
    k1, k2 = (jax.random.split(key) if key is not None else (None, None))

    intent_q = jnp.broadcast_to(params["image_gen_queries"], (B, cfg.num_gen_queries, D))
    intent = transformer_decoder(
        params["intent_decoder"], intent_q, llm_hidden_states, cfg.decoder_heads,
        cfg.dropout, k1,
    )

    if cfg.use_roi:
        roi = dilate_mask(roi_mask_2d, cfg.roi_dilation_kernel_size).reshape(B, -1)
    else:
        roi = jnp.ones((B, cfg.num_patches), bool)

    mask_tok = params["mae_mask_token"].reshape(1, 1, D)
    dec_in = jnp.where(roi[..., None], mask_tok, current_image_features)
    dec_in = dec_in + params["mae_pos_embed"]
    feats = transformer_decoder(
        params["mae_decoder"], dec_in, intent, cfg.decoder_heads, cfg.dropout, k2
    )

    fn = nn.layer_norm(params["mae_patch_norm"], feats)
    delta = jnp.tanh(nn.linear(params["mae_delta_head"], fn)) * cfg.gen_delta_clip
    alpha = jax.nn.sigmoid(nn.linear(params["mae_alpha_head"], fn)[..., 0])
    offset = jnp.tanh(nn.linear(params["mae_offset_head"], fn)) * float(cfg.max_patch_shift_pixels)

    generated = _compose_patches(cfg, current_images_patches, delta, alpha, offset, roi)
    return {
        "image_generation": generated,
        "generation_roi_mask": roi,
        "delta_all": delta,
        "alpha_all": alpha,
        "offset_all": offset,
    }


def _compose_patches(cfg, curr_patches, delta, alpha, offset, roi):
    """Warp + blend (reference _generate_generated_patches, models.py:226-286)."""
    B, P, _ = curr_patches.shape
    ps = cfg.image_patch_size
    curr_img = curr_patches.reshape(B * P, 3, ps, ps)
    if cfg.use_patch_offset:
        warped = translate_patches(curr_img.astype(jnp.float32), offset.reshape(B * P, 2))
        warped = warped.astype(curr_img.dtype)
    else:
        warped = curr_img
    delta_img = delta.reshape(B * P, 3, ps, ps)
    gen_weight = 0.95
    roi_pred = (1 - gen_weight) * (curr_img + delta_img) + gen_weight * delta_img
    non_roi_pred = warped + delta_img
    roi_flat = roi.reshape(B * P, 1, 1, 1)
    pred = jnp.where(roi_flat, roi_pred, non_roi_pred)
    alpha_eff = jnp.where(roi, jnp.ones_like(alpha), alpha).reshape(B * P, 1, 1, 1)
    blended = alpha_eff * pred + (1.0 - alpha_eff) * curr_img
    return blended.reshape(B, P, -1)


# --------------------------------------------------------------------------- #
# Point-cloud generation module
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class PointGenConfig:
    token_size: int = 4096
    trans_dim: int = 1024
    decoder_layers: int = 4
    decoder_heads: int = 8
    group_size: int = 8
    num_groups: int = 128
    use_geometric_prior: bool = True
    dropout: float = 0.1


def point_gen_init(key, cfg: PointGenConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    return {
        "feature_projector": nn.linear_init(ks[0], cfg.token_size, cfg.trans_dim, w_init="trunc_normal"),
        "seq_to_patch": nn.linear_init(ks[1], cfg.trans_dim, cfg.num_groups * cfg.trans_dim, w_init="trunc_normal"),
        "pos_embed": nn.trunc_normal_init(ks[2], (1, cfg.num_groups, cfg.trans_dim), 0.02),
        "blocks": [pc_block_init(k, cfg.trans_dim) for k in jax.random.split(ks[3], cfg.decoder_layers)],
        # future_predictor: Conv1d(t,t,1)+BN+ReLU, Conv1d(t, 3*group_size, 1)
        "pred_conv1": nn.linear_init(ks[4], cfg.trans_dim, cfg.trans_dim, w_init="torch"),
        "pred_bn": nn.batch_norm_init(cfg.trans_dim)[0],
        "pred_conv2": nn.linear_init(ks[5], cfg.trans_dim, 3 * cfg.group_size, w_init="torch"),
    }


def point_gen_state(cfg: PointGenConfig) -> Dict[str, Any]:
    return {"pred_bn": nn.batch_norm_init(cfg.trans_dim)[1]}


def point_gen_forward(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: PointGenConfig,
    last_hidden: jnp.ndarray,                    # [B, S, token_size]
    current_pointcloud: Optional[jnp.ndarray] = None,
    *,
    training: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    B = last_hidden.shape[0]
    proj = nn.linear(params["feature_projector"], last_hidden)  # [B,S,t]
    agg = proj.mean(axis=1)  # [B,t]
    patch = nn.linear(params["seq_to_patch"], agg).reshape(B, cfg.num_groups, cfg.trans_dim)

    pos = jnp.broadcast_to(params["pos_embed"], (B, cfg.num_groups, cfg.trans_dim))
    x = patch
    for i, bp in enumerate(params["blocks"]):
        bk = None if key is None else jax.random.fold_in(key, i)
        x = pc_block(bp, x, pos, cfg.decoder_heads, cfg.dropout, bk)

    h, new_bn = nn.batch_norm(
        params["pred_bn"], state["pred_bn"], nn.linear(params["pred_conv1"], x), training
    )
    h = jax.nn.relu(h)
    deltas = nn.linear(params["pred_conv2"], h)  # [B, G, 3*M]
    deltas = deltas.reshape(B, cfg.num_groups, cfg.group_size, 3)

    if cfg.use_geometric_prior and current_pointcloud is not None:
        fps_idx = furthest_point_sample(current_pointcloud, cfg.num_groups)
        centers = index_points(current_pointcloud, fps_idx)  # [B,G,3]
        points = deltas + centers[:, :, None, :]
    else:
        points = deltas
    out = points.reshape(B, cfg.num_groups * cfg.group_size, 3)
    return {"pointcloud_coord_generation": out}, {"pred_bn": new_bn}


# --------------------------------------------------------------------------- #
# Tactile generation module
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class TactileGenConfig:
    token_size: int = 4096
    tactile_dim: int = 12
    decoder_layers: int = 2
    decoder_heads: int = 4
    dropout: float = 0.1


def tactile_gen_init(key, cfg: TactileGenConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    return {
        "feature_projector": nn.linear_init(ks[0], cfg.token_size, cfg.token_size, w_init="torch"),
        "tactile_query": nn.normal_init(ks[1], (1, 1, cfg.token_size), 0.02),
        "decoder": transformer_decoder_init(ks[2], cfg.decoder_layers, cfg.token_size, cfg.token_size * 2),
        "output_head": nn.linear_init(jax.random.fold_in(key, 9), cfg.token_size, cfg.tactile_dim, w_init="torch"),
    }


def tactile_gen_forward(
    params: Dict[str, Any],
    cfg: TactileGenConfig,
    llm_hidden_states: jnp.ndarray,
    *,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    B = llm_hidden_states.shape[0]
    query = jnp.broadcast_to(params["tactile_query"], (B, 1, cfg.token_size))
    memory = nn.linear(params["feature_projector"], llm_hidden_states)
    dec = transformer_decoder(params["decoder"], query, memory, cfg.decoder_heads, cfg.dropout, key)
    return {"tactile_generation": nn.linear(params["output_head"], dec[:, 0])}


# --------------------------------------------------------------------------- #
# Manager + losses
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class GenerationConfig:
    token_size: int = 4096
    use_image: bool = False
    use_pointcloud: bool = False
    use_tactile: bool = False
    image: ImageGenConfig = field(default_factory=ImageGenConfig)
    point: PointGenConfig = field(default_factory=PointGenConfig)
    tactile: TactileGenConfig = field(default_factory=TactileGenConfig)


def generation_manager_init(key, cfg: GenerationConfig):
    ks = jax.random.split(key, 3)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    if cfg.use_image:
        params["image_gen_module"] = image_gen_init(ks[0], cfg.image)
    if cfg.use_pointcloud:
        params["pointcloud_gen_module"] = point_gen_init(ks[1], cfg.point)
        state["pointcloud_gen_module"] = point_gen_state(cfg.point)
    if cfg.use_tactile:
        params["tactile_gen_module"] = tactile_gen_init(ks[2], cfg.tactile)
    return params, state


def generation_manager_forward(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: GenerationConfig,
    llm_hidden_states: jnp.ndarray,
    current_image_features: Optional[jnp.ndarray] = None,
    current_images_patches: Optional[jnp.ndarray] = None,
    current_point_cloud: Optional[jnp.ndarray] = None,
    roi_mask_2d: Optional[jnp.ndarray] = None,
    *,
    training: bool = False,
    key: Optional[jax.Array] = None,
):
    outs: Dict[str, jnp.ndarray] = {}
    new_state: Dict[str, Any] = {}
    ks = jax.random.split(key, 3) if key is not None else [None] * 3
    if cfg.use_image:
        outs.update(
            image_gen_forward(
                params["image_gen_module"], cfg.image, llm_hidden_states,
                current_image_features, current_images_patches, roi_mask_2d, key=ks[0],
            )
        )
    if cfg.use_pointcloud:
        pc_out, pc_state = point_gen_forward(
            params["pointcloud_gen_module"], state["pointcloud_gen_module"], cfg.point,
            llm_hidden_states, current_point_cloud, training=training, key=ks[1],
        )
        outs.update(pc_out)
        new_state["pointcloud_gen_module"] = pc_state
    if cfg.use_tactile:
        outs.update(
            tactile_gen_forward(params["tactile_gen_module"], cfg.tactile, llm_hidden_states, key=ks[2])
        )
    return outs, new_state


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of err rows selected by mask (static-shape form of x[mask].mean()).
    err [B, P, D], mask [B, P]."""
    w = mask.astype(err.dtype)[..., None]
    denom = jnp.maximum(w.sum() * err.shape[-1], 1.0)
    return (err * w).sum() / denom


def compute_generation_losses(
    cfg: GenerationConfig,
    generation_outputs: Dict[str, jnp.ndarray],
    next_images: Optional[jnp.ndarray] = None,       # [B, 3, 672, 672]
    next_point_cloud: Optional[jnp.ndarray] = None,  # [B, M, 3]
    next_tactile: Optional[jnp.ndarray] = None,      # [B, tactile_dim]
) -> Dict[str, jnp.ndarray]:
    """Reference compute_generation_losses (prismatic.py:771-838): ROI
    MSE + 0.5*L1, 0.01*background L1, -0.1*|delta| reward, chamfer-L2,
    tactile MSE."""
    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)

    if cfg.use_image and next_images is not None and "image_generation" in generation_outputs:
        gen = generation_outputs["image_generation"].astype(jnp.float32)
        roi = generation_outputs["generation_roi_mask"]
        gt = images_to_patches(next_images, cfg.image.image_patch_size).astype(jnp.float32)
        diff = gen - gt
        img_total = jnp.asarray(0.0, jnp.float32)

        roi_mse = _masked_mean(diff**2, roi)
        roi_l1 = _masked_mean(jnp.abs(diff), roi)
        roi_loss = roi_mse + 0.5 * roi_l1
        losses["image_roi_generation_loss"] = roi_loss
        total = total + roi_loss
        img_total = img_total + roi_loss

        bg_l1 = 0.01 * _masked_mean(jnp.abs(diff), ~roi)
        losses["bg_consistency_loss"] = bg_l1
        total = total + bg_l1
        img_total = img_total + bg_l1

        delta_reward = -0.1 * jnp.abs(generation_outputs["delta_all"].astype(jnp.float32)).mean()
        losses["delta_magnitude_reward"] = delta_reward
        total = total + delta_reward
        img_total = img_total + delta_reward
        losses["image_gen_loss"] = img_total

    if cfg.use_pointcloud and next_point_cloud is not None and "pointcloud_coord_generation" in generation_outputs:
        pc_loss = chamfer_distance_l2(
            generation_outputs["pointcloud_coord_generation"].astype(jnp.float32),
            next_point_cloud.astype(jnp.float32),
        )
        losses["point_cloud_gen_loss"] = pc_loss
        total = total + pc_loss

    if cfg.use_tactile and next_tactile is not None and "tactile_generation" in generation_outputs:
        t_loss = jnp.mean(
            (generation_outputs["tactile_generation"].astype(jnp.float32) - next_tactile.astype(jnp.float32)) ** 2
        )
        losses["tactile_gen_loss"] = t_loss
        total = total + t_loss

    losses["total_generation_loss"] = total
    return losses
