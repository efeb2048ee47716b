"""Positional-correspondence contrastive losses, static-shape TPU form.

Parity targets (reference models/mla/fuser/contrastive.py):
  * CoordinateAwareContrastiveLoss (:170-215) — InfoNCE between each VALID
    point-cloud token (at LLM hidden layer 8) and its 3D->2D-projected image
    patch token; symmetric CE over an [M, M] matrix of valid pairs across
    the flattened batch.
  * TactileContrastiveLoss (:219-258) — tactile token vs nearest-PC token
    (over that sample's 256 PC tokens) and vs the corresponding image patch.
  * SceneLevelContrastiveLoss (:133-166) — defined-but-unused in the
    reference; provided for completeness.

TPU-first redesign: the reference boolean-indexes the M valid rows into a
dynamic [M, M] matrix. Here we keep the full [B*N, B*N] logits and realize
the *same* objective with masking: invalid columns get -inf before the
row-logsumexp and invalid rows are dropped from the mean. This is exactly
equal to CE over the compacted [M, M] matrix (row/col restriction of the
same Gram matrix) but every shape is static.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mla_tpu import nn

NEG_INF = -1e9


def coordinate_contrastive_init(key, feature_dim: int, projection_dim: int = 256) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "image_head": nn.proj_head_init(k1, feature_dim, feature_dim, projection_dim),
        "pointcloud_head": nn.proj_head_init(k2, feature_dim, feature_dim, projection_dim),
    }


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _masked_infonce(logits: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """CE(logits, diag labels) restricted to valid rows/cols. logits [M, M]
    fp32, valid [M] bool. Returns mean over valid rows (0 if none)."""
    logits = jnp.where(valid[None, :], logits, NEG_INF)  # mask columns
    logz = jax.nn.logsumexp(logits, axis=-1)
    diag = jnp.diagonal(logits)
    per_row = logz - diag
    count = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, per_row, 0.0).sum() / count


def coordinate_contrastive_loss(
    params: Dict[str, Any],
    image_features: jnp.ndarray,       # [B, 256, D] hidden-layer-8 img tokens
    pointcloud_features: jnp.ndarray,  # [B, 256, D] hidden-layer-8 pc tokens
    patch_indices: jnp.ndarray,        # [B, 256, 2] (row, col) on 16x16 grid
    valid_mask: jnp.ndarray,           # [B, 256] bool
    temperature: float = 0.07,
) -> jnp.ndarray:
    B, N, D = image_features.shape
    patch_w = int(N**0.5)

    img_proj = _l2norm(nn.proj_head(params["image_head"], image_features).astype(jnp.float32))
    pc_proj = _l2norm(nn.proj_head(params["pointcloud_head"], pointcloud_features).astype(jnp.float32))

    linear_idx = patch_indices[..., 0] * patch_w + patch_indices[..., 1]  # [B,N]
    target_img = jnp.take_along_axis(img_proj, linear_idx[..., None], axis=1)  # [B,N,P]

    pc_flat = pc_proj.reshape(B * N, -1)
    tgt_flat = target_img.reshape(B * N, -1)
    valid = valid_mask.reshape(B * N)

    logits = (pc_flat @ tgt_flat.T) / temperature  # [BN, BN] fp32
    # pc->img: rows = pc, cols = img targets; both row/col i correspond to
    # the same pair, so validity masks rows and columns identically
    loss_pc2img = _masked_infonce(logits, valid)
    loss_img2pc = _masked_infonce(logits.T, valid)
    return jnp.where(valid.sum() > 0, (loss_pc2img + loss_img2pc) / 2.0, 0.0)


def tactile_contrastive_init(key, feature_dim: int, projection_dim: int = 256) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "tactile_head": nn.proj_head_init(k1, feature_dim, feature_dim, projection_dim),
        "pointcloud_head": nn.proj_head_init(k2, feature_dim, feature_dim, projection_dim),
        "image_head": nn.proj_head_init(k3, feature_dim, feature_dim, projection_dim),
    }


def tactile_contrastive_loss(
    params: Dict[str, Any],
    tac_features: jnp.ndarray,          # [B, n_arms, D]
    pc_features: jnp.ndarray,           # [B, 256, D]
    img_features: jnp.ndarray,          # [B, 256, D]
    positive_pc_indices: jnp.ndarray,   # [B, n_arms, 1] nearest-PC index
    positive_img_indices: jnp.ndarray,  # [B, n_arms, 1] linear patch index
    temperature: float = 0.07,
) -> jnp.ndarray:
    tac = _l2norm(nn.proj_head(params["tactile_head"], tac_features).astype(jnp.float32))
    pc = _l2norm(nn.proj_head(params["pointcloud_head"], pc_features).astype(jnp.float32))
    img = _l2norm(nn.proj_head(params["image_head"], img_features).astype(jnp.float32))

    def ce(logits, labels):
        # logits [B, n, N]; labels [B, n]
        logz = jax.nn.logsumexp(logits, axis=-1)
        pos = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        return (logz - pos).mean()

    logits_pc = jnp.einsum("bnd,bmd->bnm", tac, pc) / temperature
    logits_img = jnp.einsum("bnd,bmd->bnm", tac, img) / temperature
    loss_pc = ce(logits_pc, positive_pc_indices[..., 0])
    loss_img = ce(logits_img, positive_img_indices[..., 0])
    return (loss_pc + loss_img) / 2.0


def scene_contrastive_init(key, token_dim: int, embedding_dim: int = 256) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": nn.linear_init(k1, token_dim, token_dim // 2),
        "fc2": nn.linear_init(k2, token_dim // 2, embedding_dim),
    }


def scene_contrastive_loss(
    params: Dict[str, Any],
    image_tokens: jnp.ndarray,
    pointcloud_tokens: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Mean-pooled scene-level CLIP loss (reference :133-166; unused on the
    active path, kept for API completeness)."""

    def head(x):
        return nn.linear(params["fc2"], jax.nn.relu(nn.linear(params["fc1"], x)))

    img = _l2norm(head(image_tokens.mean(axis=1)).astype(jnp.float32))
    pc = _l2norm(head(pointcloud_tokens.mean(axis=1)).astype(jnp.float32))
    logits = img @ pc.T / temperature
    B = logits.shape[0]
    labels = jnp.arange(B)
    logp_i = jax.nn.log_softmax(logits, axis=-1)
    logp_p = jax.nn.log_softmax(logits.T, axis=-1)
    loss_i = -jnp.take_along_axis(logp_i, labels[:, None], axis=-1).mean()
    loss_p = -jnp.take_along_axis(logp_p, labels[:, None], axis=-1).mean()
    return (loss_i + loss_p) / 2.0
