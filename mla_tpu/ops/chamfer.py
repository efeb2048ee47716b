"""Chamfer distance — XLA-fused replacement for the reference CUDA kernel.

The reference ships a CUDA chamfer extension (vla/datasets/cpp/chamfer_dist)
but its active generation loss uses the torch-native cdist version
(models/mla/generation/gen_loss.py:12-18); this module is that math on TPU:
one MXU distance matrix + two min-reductions, fully fused under jit, and
differentiable (so it also replaces the CUDA backward kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

from mla_tpu.ops.pointops import square_distance


def chamfer_distance_l2(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """pred [B,N,3], gt [B,M,3] -> scalar. Matches gen_loss.chamfer_distance_l2:
    mean over batch of (mean min-dist forward + mean min-dist backward),
    distances are *euclidean* (sqrt), not squared."""
    d2 = jnp.maximum(square_distance(pred, gt), 0.0)
    d = jnp.sqrt(d2 + 1e-12)
    fwd = jnp.min(d, axis=2).mean(axis=1)
    bwd = jnp.min(d, axis=1).mean(axis=1)
    return (fwd + bwd).mean()


def chamfer_distance_sq(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Squared-distance chamfer (the CUDA kernel's variant,
    vla/datasets/cpp/chamfer_dist/chamfer.cu)."""
    d2 = jnp.maximum(square_distance(pred, gt), 0.0)
    fwd = jnp.min(d2, axis=2).mean(axis=1)
    bwd = jnp.min(d2, axis=1).mean(axis=1)
    return (fwd + bwd).mean()
