"""Causal flash attention — Pallas TPU kernel with custom VJP.

Role: the TPU-native replacement for the reference's FlashAttention-2
dependency (flash-attn==2.5.5 wired through LlamaFlashAttention2,
transformers/models/llama/modeling_llama.py:405,690; SURVEY.md section 2.9).

Design (online-softmax tiling, FlashAttention-2 schedule):
  * grid = (B*H, S/BQ); each program streams K/V blocks for one query block,
    carrying running max m and normalizer l in fp32 (VPU), with the QK^T and
    PV matmuls on the MXU at preferred fp32 accumulation.
  * causal structure is exploited at the BLOCK level: key blocks strictly
    above the diagonal are skipped (≈2x FLOP saving vs dense), and only the
    diagonal block applies the triangular mask elementwise.
  * key-padding is a [B, S] validity mask streamed as int32.
  * backward = recompute strategy: forward saves (O, logsumexp); dq kernel
    loops K blocks, dk/dv kernel loops Q blocks; D = rowsum(dO*O) is a
    cheap fused XLA op outside the kernels.

The einsum path (ops/attention.py sdpa_reference) is the numerics yardstick;
tests compare both in interpret mode on CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q, block_k, sm_scale, causal):
    qi = pl.program_id(1)
    # dots take the INPUT dtype (bf16 on the model path) with fp32
    # accumulation — fp32 MXU operands run at a fraction of bf16 rate and
    # measured ~0.3 ms/layer slower at the 534-token serving prefill; this
    # is also exactly sdpa_reference's einsum numerics (bf16 in, fp32 acc)
    q = q_ref[0]  # [BQ, hd]
    S = k_ref.shape[1]
    nk = S // block_k
    q_offset = qi * block_q

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    # CEIL-div: the diagonal key block may only partially overlap this query
    # block (block_q < block_k, or block_k not dividing the q extent) — a
    # floor here would skip it entirely and silently zero the output rows;
    # the element-wise causal mask below handles the overhang
    num_kblocks = -((qi + 1) * block_q // -block_k) if causal else nk

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [BQ, BK] fp32

        kmask = mask_ref[0, 0, pl.ds(ki * block_k, block_k)] > 0  # [BK]
        s = jnp.where(kmask[None, :], s, NEG_INF)
        if causal:
            q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        # PV in the value dtype (sdpa_reference: probs.astype(v.dtype)),
        # accumulated fp32 by the MXU
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kblocks, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l_safe)


def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, block_q, block_k, sm_scale, causal):
    qi = pl.program_id(1)
    q = q_ref[0]  # input dtype; MXU accumulates fp32 (see _fwd_kernel note)
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    S = k_ref.shape[1]
    nk = S // block_k
    q_offset = qi * block_q
    # ceil-div — see _fwd_kernel: a floor would skip a partially-overlapping
    # diagonal key block
    num_kblocks = -((qi + 1) * block_q // -block_k) if causal else nk

    def body(ki, dq):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * sm_scale
        kmask = mask_ref[0, 0, pl.ds(ki * block_k, block_k)] > 0
        s = jnp.where(kmask[None, :], s, NEG_INF)
        if causal:
            q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])  # [BQ, BK]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None]) * sm_scale).astype(k.dtype)
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_kblocks, body, jnp.zeros(q.shape, jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    *, block_q, block_k, sm_scale, causal):
    ki = pl.program_id(1)
    k = k_ref[0]  # [BK, hd] input dtype; MXU accumulates fp32
    v = v_ref[0]
    kmask = mask_ref[0, 0] > 0  # [BK]
    S = q_ref.shape[1]
    nq = S // block_q
    k_offset = ki * block_k
    start_qblock = k_offset // block_q if causal else 0

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(kmask[None, :], s, NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            k_pos = k_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])  # [BQ, BK]
        dv_new = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None]) * sm_scale).astype(q.dtype)
        dk_new = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk0 = jnp.zeros((block_k, k.shape[-1]), jnp.float32)
    dv0 = jnp.zeros((block_k, v.shape[-1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_qblock, nq, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_len(s: int, block: int) -> int:
    return (s + block - 1) // block * block


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, mask_i32, causal, sm_scale, block_q, block_k):
    o, _ = _flash_fwd_impl(q, k, v, mask_i32, causal, sm_scale, block_q, block_k)
    return o


def _flash_fwd_impl(q, k, v, mask_i32, causal, sm_scale, block_q, block_k):
    BH, S, hd = q.shape
    grid = (BH, S // block_q)
    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, block_k=block_k, sm_scale=sm_scale, causal=causal
    )
    interpret = jax.default_backend() != "tpu"
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),     # mask [BH,1,S]
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),  # q
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),    # k
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),    # v
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, hd), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, S), jnp.float32),
        ],
        interpret=interpret,
    )(mask_i32[:, None, :], q, k, v)
    return o, lse


def _flash_fwd(q, k, v, mask_i32, causal, sm_scale, block_q, block_k):
    o, lse = _flash_fwd_impl(q, k, v, mask_i32, causal, sm_scale, block_q, block_k)
    return o, (q, k, v, mask_i32, o, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, res, do):
    q, k, v, mask_i32, o, lse = res
    BH, S, hd = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[:, None, :]  # [BH, 1, S]
    interpret = jax.default_backend() != "tpu"

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, block_k=block_k,
                          sm_scale=sm_scale, causal=causal),
        grid=(BH, S // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, hd), q.dtype),
        interpret=interpret,
    )(mask_i32[:, None, :], q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, block_k=block_k,
                          sm_scale=sm_scale, causal=causal),
        grid=(BH, S // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, hd), k.dtype),
            jax.ShapeDtypeStruct((BH, S, hd), v.dtype),
        ],
        interpret=interpret,
    )(mask_i32[:, None, :], q, k, v, do, lse, delta)

    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """q/k/v: [B, H, S, hd] -> [B, H, S, hd]. `mask` is a boolean key-padding
    mask, accepted as [B, S], [B, 1, 1, S] or [B, 1, Sq, Sk] (row-constant).
    Sequences are padded to the block size internally."""
    B, H, S, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)

    if mask is None:
        key_mask = jnp.ones((B, S), jnp.int32)
    else:
        if mask.ndim == 4:
            mask = mask[:, 0, 0, :] if mask.shape[2] == 1 else mask[:, 0, -1, :]
        elif mask.ndim == 3:
            mask = mask[:, -1, :]
        key_mask = mask.astype(jnp.int32)

    # pad to a common multiple of BOTH block sizes: nk = Sp//block_k must
    # cover every key (padding to max(bq, bk) loses keys when the larger
    # block is not a multiple of the smaller)
    Sp = _pad_len(S, math.lcm(block_q, block_k))
    if Sp != S:
        pad = Sp - S
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))

    qf = q.reshape(B * H, Sp, hd)
    kf = k.reshape(B * H, Sp, hd)
    vf = v.reshape(B * H, Sp, hd)
    mask_bh = jnp.repeat(key_mask, H, axis=0)  # [B*H, Sp]

    o = _flash(qf, kf, vf, mask_bh, causal, sm_scale, block_q, block_k)
    o = o.reshape(B, H, Sp, hd)
    return o[:, :, :S]
