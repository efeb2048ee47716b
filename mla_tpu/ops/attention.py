"""Scaled-dot-product attention for the LLM path.

Two implementations with one contract:
  * `sdpa_reference` — jnp einsum softmax (XLA-fused); numerically the
    yardstick and the CPU-test path.
  * `mla_tpu.ops.flash_attention.flash_attention` — Pallas TPU flash kernel
    (used on TPU for long-sequence training; see that module).

The reference uses FlashAttention-2 through LlamaFlashAttention2
(transformers/models/llama/modeling_llama.py:405); on TPU the same role is
played by the Pallas kernel + XLA fusion.

Mask convention: `mask` is boolean [B, 1, Sq, Sk] or [B, Sq, Sk] where True
means "may attend". Causal masking is composed in here so callers only pass
padding masks.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.3819763e38  # most negative bf16-representable


def make_causal_mask(sq: int, sk: int, offset: int = 0) -> jnp.ndarray:
    """[sq, sk] boolean causal mask. `offset` is the absolute position of
    query 0 relative to key 0 (for KV-cache decoding, offset = cache_len)."""
    q_pos = jnp.arange(sq)[:, None] + offset
    k_pos = jnp.arange(sk)[None, :]
    return k_pos <= q_pos


def sdpa_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    causal_offset: int = 0,
    scores_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """q: [B,H,Sq,hd], k/v: [B,H,Sk,hd] -> [B,H,Sq,hd].

    Softmax in fp32 (matches torch SDPA / flash-attn numerics contract).

    scores_dtype=bfloat16 materializes the [B,H,Sq,Sk] score tensor in bf16
    (softmax itself still reduces in fp32) — the serving-prefill bandwidth
    lever: at S=534 the fp32 score tensor is the dominant HBM write of the
    XLA attention block, and halving it cuts the measured 32-layer attention
    chain 13.1 -> 2.3 ms at B=4 (scripts/profile_prefill_ops.py, real chip).
    Default None keeps the fp32-exact path (training, goldens)."""
    B, H, Sq, hd = q.shape
    Sk = k.shape[2]
    if scores_dtype is not None:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=scores_dtype
        ) * jnp.asarray(1.0 / math.sqrt(hd), scores_dtype)
        neg = jnp.asarray(jnp.finfo(scores_dtype).min, scores_dtype)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd)
        neg = NEG_INF
    if causal:
        cm = make_causal_mask(Sq, Sk, causal_offset)
        scores = jnp.where(cm[None, None], scores, neg)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        scores = jnp.where(mask, scores, neg)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    causal_offset: int = 0,
    use_flash: Optional[bool] = None,
    scores_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU when shapes allow, reference
    einsum path otherwise. `use_flash=None` -> auto. scores_dtype only
    affects the einsum path (the flash kernel never materializes scores —
    they live in VMEM with fp32 accumulation regardless)."""
    if use_flash is None:
        # causal_offset may be a tracer (KV-cache decode); only a static 0
        # qualifies for the flash kernel
        static_zero_offset = isinstance(causal_offset, int) and causal_offset == 0
        use_flash = (
            jax.default_backend() == "tpu"
            and causal
            and static_zero_offset
            and q.shape[2] == k.shape[2]
            and q.shape[2] >= 256
            and q.shape[3] in (64, 128)
        )
    if use_flash:
        from mla_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    return sdpa_reference(q, k, v, mask=mask, causal=causal, causal_offset=causal_offset,
                          scores_dtype=scores_dtype)
