"""Action/timestep/condition embedders + projectors for the diffusion head.

Parity targets:
  * TimestepEmbedder / ActionEmbedder / LabelEmbedder / FinalLayer —
    reference models/diffusion/models.py:28-189.
  * MLPProjector (gelu-mlp) — reference util/nn_utils.py:21-34 (used as the
    768->4096 point-token projector, models/vlm/prismatic.py:232).
  * MLP_GELU image projector lives in mla_tpu.nn (mlp_gelu).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mla_tpu import nn


# --------------------------------------------------------------------------- #
# TimestepEmbedder: sinusoidal(256) -> Linear -> SiLU -> Linear
# --------------------------------------------------------------------------- #


def timestep_embedder_init(key, hidden_size: int, freq_dim: int = 256) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": nn.linear_init(k1, freq_dim, hidden_size, w_init="normal", w_std=0.02),
        "fc2": nn.linear_init(k2, hidden_size, hidden_size, w_init="normal", w_std=0.02),
    }


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """DiT sinusoidal embedding: [cos | sin] blocks (models.py:42-60)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedder(p: Dict[str, Any], t: jnp.ndarray, freq_dim: int = 256) -> jnp.ndarray:
    """t: [B] -> [B, hidden]."""
    emb = timestep_embedding(t, freq_dim)
    return nn.linear(p["fc2"], nn.silu(nn.linear(p["fc1"], emb)))


# --------------------------------------------------------------------------- #
# ActionEmbedder: timm Mlp(action_dim -> hidden -> hidden), GELU(tanh)
# --------------------------------------------------------------------------- #


def action_embedder_init(key, action_size: int, hidden_size: int) -> Dict[str, Any]:
    return nn.mlp_init(key, action_size, hidden_size, hidden_size, w_init="normal")


def action_embedder(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    return nn.mlp(p, x, act=nn.gelu_tanh)


# --------------------------------------------------------------------------- #
# LabelEmbedder: CFG condition dropout with a zero `uncondition` vector
# --------------------------------------------------------------------------- #


def label_embedder_init(token_size: int = 4096) -> Dict[str, Any]:
    """The reference keeps a zeros buffer of shape (1, token_size)
    (models.py:76, conditions_shape[1:])."""
    return {"uncondition": jnp.zeros((1, token_size))}


def label_embedder(
    p: Dict[str, Any],
    conditions: jnp.ndarray,
    *,
    dropout_prob: float = 0.0,
    training: bool = False,
    key: Optional[jax.Array] = None,
    force_drop_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """conditions [B, S, D]. During training with dropout_prob > 0, whole
    samples' condition sequences are replaced by the broadcast uncondition
    vector (models.py:79-97)."""
    use_dropout = dropout_prob > 0
    if not ((training and use_dropout) or force_drop_ids is not None):
        return conditions
    if force_drop_ids is not None:
        drop = force_drop_ids == 1
    else:
        drop = jax.random.uniform(key, (conditions.shape[0],)) < dropout_prob
    uncond = p["uncondition"].astype(conditions.dtype)  # [1, D]
    return jnp.where(drop[:, None, None], uncond[None], conditions)


# --------------------------------------------------------------------------- #
# FinalLayer: RmsNorm -> Mlp(hidden -> hidden -> out), GELU(tanh)
# --------------------------------------------------------------------------- #


def final_layer_init(key, hidden_size: int, out_dim: int) -> Dict[str, Any]:
    p = {
        "norm": nn.rms_norm_init(hidden_size),
        "mlp": nn.mlp_init(key, hidden_size, hidden_size, out_dim, w_init="xavier"),
    }
    # reference zero-inits fc2 (prismatic.py:320-321)
    p["mlp"]["fc2"]["w"] = jnp.zeros_like(p["mlp"]["fc2"]["w"])
    return p


def final_layer(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    # timm RmsNorm eps=1e-6
    return nn.mlp(p["mlp"], nn.rms_norm(p["norm"], x, 1e-6), act=nn.gelu_tanh)


# --------------------------------------------------------------------------- #
# Projectors
# --------------------------------------------------------------------------- #


def mlp_projector_init(key, in_dim: int, out_dim: int) -> Dict[str, Any]:
    """gelu-mlp projector: Linear -> GELU(exact) -> Linear."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": nn.linear_init(k1, in_dim, out_dim),
        "fc2": nn.linear_init(k2, out_dim, out_dim),
    }


def mlp_projector(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    return nn.linear(p["fc2"], nn.gelu_exact(nn.linear(p["fc1"], x)))
