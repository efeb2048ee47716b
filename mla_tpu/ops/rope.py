"""Rotary position embeddings, HF-Llama convention.

Parity target: reference transformers/models/llama/modeling_llama.py
LlamaRotaryEmbedding / apply_rotary_pos_emb — the "rotate_half" (block, not
interleaved) layout with inv_freq = theta^(-2i/d) and fp32 cos/sin tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_tables(head_dim: int, max_len: int, theta: float = 10000.0):
    """Precompute cos/sin tables [max_len, head_dim] (fp32, host-side)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [L, head_dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [L, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos_table, sin_table, positions):
    """Apply RoPE to q, k of shape [B, H, S, hd] using positions [B, S] or [S].

    cos/sin math is done in fp32 and cast back (matching HF's fp32 rotary)."""
    cos = jnp.take(cos_table, positions, axis=0)  # [B,S,hd] or [S,hd]
    sin = jnp.take(sin_table, positions, axis=0)
    if cos.ndim == 2:  # [S, hd] -> broadcast over batch
        cos, sin = cos[None], sin[None]
    cos = cos[:, None, :, :]  # [B,1,S,hd]
    sin = sin[:, None, :, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
