"""Encoder-free 2D vision tokenizer.

Parity target: reference models/mla/image/vision_tokenizer.py — 672x672 RGB
(+1 mask channel) -> 14x14-stride patchify (48x48 grid @ C=1024) ->
windowed 3x3 LocalAttention pooling -> 16x16 = 256 tokens, projected to the
LLM width by an external MLP_GELU projector.

TPU-first redesign:
  * The reference loops over the batch in python with per-image variable
    crops (vision_tokenizer.py:128-151). On the active path the mask channel
    is always all-ones (RLDSBatchTransform, vla/datasets/datasets.py:68) so
    the crop is always the full 48x48 grid; we implement that case as one
    static batched graph (patchify as reshape+matmul on the MXU, windowed
    attention as einsum over [B,256,9] windows).
  * The class-token GlobalAttention branch (:50-77,141-142) is computed but
    discarded by the reference ("drop class_embed", :149); its parameters
    are kept for checkpoint compatibility but the compute is skipped.

Params (converter maps reference keys; see models/convert.py):
  patch_embedding: {'w': [3*14*14, C]}  (conv kernel flattened, (in,kh,kw))
  class_embedding / split_embedding: [C] (ckpt-compat, unused on hot path)
  local_attention: {q_ln, q, kv_ln, kv, proj}
  global_attention: {q_ln, q, kv_ln, kv, proj}  (ckpt-compat, unused)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mla_tpu import nn


@dataclass(frozen=True)
class VisionTokenizerConfig:
    image_size: int = 672
    patch_stride: int = 14
    conv_stride: int = 3
    hidden_dim: int = 1024
    num_heads: int = 8

    @property
    def grid(self) -> int:  # 48
        return self.image_size // self.patch_stride

    @property
    def out_grid(self) -> int:  # 16
        return self.grid // self.conv_stride

    @property
    def num_tokens(self) -> int:  # 256
        return self.out_grid**2


def _attn_block_init(key, dim: int) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "q_ln": nn.layer_norm_init(dim),
        "q": nn.linear_init(k1, dim, dim, bias=False),
        "kv_ln": nn.layer_norm_init(dim),
        "kv": nn.linear_init(k2, dim, 2 * dim, bias=False),
        "proj": nn.linear_init(k3, dim, dim),
    }


def vision_tokenizer_init(key, cfg: VisionTokenizerConfig = VisionTokenizerConfig()) -> Dict[str, Any]:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    C = cfg.hidden_dim
    in_dim = 3 * cfg.patch_stride * cfg.patch_stride
    return {
        "patch_embedding": {"w": nn.kaiming_uniform(k1, (in_dim, C))},
        "class_embedding": jax.random.normal(k2, (C,)),
        "split_embedding": jax.random.normal(k3, (C,)),
        "local_attention": _attn_block_init(k4, C),
        "global_attention": _attn_block_init(k5, C),
    }


def patchify(images: jnp.ndarray, cfg: VisionTokenizerConfig) -> jnp.ndarray:
    """[B, 3, 672, 672] -> [B, 48, 48, 3*14*14] with (c, kh, kw) flattening
    order matching a torch Conv2d kernel."""
    B = images.shape[0]
    g, p = cfg.grid, cfg.patch_stride
    x = images.reshape(B, 3, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, 3, p, p]
    return x.reshape(B, g, g, 3 * p * p)


def local_attention(p: Dict[str, Any], feats: jnp.ndarray, cfg: VisionTokenizerConfig) -> jnp.ndarray:
    """Windowed cross-attention pooling (reference LocalAttention:14-47).

    feats: [B, 48, 48, C] -> [B, 256, C]. Queries are 3x3 average-pooled
    features; keys/values are the 9 window elements; attention is per
    (patch, head) over the 9 positions. Scale is C**-0.5 (the reference
    scales by input_size, not head_dim)."""
    B, G, _, C = feats.shape
    s = cfg.conv_stride
    og = cfg.out_grid
    H = cfg.num_heads
    hd = C // H

    win = feats.reshape(B, og, s, og, s, C).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(B, og * og, s * s, C)  # [B,256,9,C]
    reduced = jnp.mean(win, axis=2)  # [B,256,C] == avg_pool2d(k=3,s=3)

    q = nn.linear(p["q"], nn.layer_norm(p["q_ln"], reduced))
    kv = nn.linear(p["kv"], nn.layer_norm(p["kv_ln"], win))
    k, v = kv[..., :C], kv[..., C:]

    q = q.reshape(B, og * og, H, hd)
    k = k.reshape(B, og * og, s * s, H, hd)
    v = v.reshape(B, og * og, s * s, H, hd)

    scale = C**-0.5
    scores = jnp.einsum("bphd,bpnhd->bphn", q * scale, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    agg = jnp.einsum("bphn,bpnhd->bphd", attn, v)
    agg = agg.reshape(B, og * og, C)
    return reduced + nn.linear(p["proj"], agg)


def vision_tokenizer(
    params: Dict[str, Any],
    pixel_values: jnp.ndarray,
    cfg: VisionTokenizerConfig = VisionTokenizerConfig(),
) -> jnp.ndarray:
    """pixel_values: [B, 4, 672, 672] (RGB + mask channel; mask must be the
    full frame — variable crops are a non-static reference path not used by
    the RLDS pipeline). Returns [B, 256, 1024] tokens in row-major grid order
    (matching the reference's flatten order, vision_tokenizer.py:144-148).
    The LLM-width projection (MLP_GELU 1024->4096) is applied by the caller."""
    rgb = pixel_values[:, :3]
    patches = patchify(rgb, cfg)  # [B,48,48,588]
    embeds = patches @ params["patch_embedding"]["w"].astype(patches.dtype)  # [B,48,48,C]
    return local_attention(params["local_attention"], embeds, cfg)
