"""Weight-only int8 quantization for single-chip serving.

Motivation: the 7B flagship in bf16 (13.4 GB) does not fit comfortably on
one 16 GB v5e chip (the reference serves from a 40 GB A100); per-channel
int8 weights halve storage AND HBM read bandwidth with near-lossless
serving quality. Activations stay bf16; dequant (int8 -> bf16 * scale)
fuses into the consuming matmul under XLA.

Representation: a quantized linear leaf dict {'w_q': int8 [..., in, out],
'w_scale': f32 [..., 1, out]} is understood transparently by nn.linear;
quantized embeddings are {'table_q': int8 [V, D], 'table_scale': f32 [V, 1]}
handled by llama.embed_tokens.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: jnp.ndarray, axis: int = -2) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: scale over the reduction axis
    (default -2 = the `in` dim of our [in, out] layout)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": q, "w_scale": scale}


def dequantize_weight(p: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return p["w_q"].astype(dtype) * p["w_scale"].astype(dtype)


def quantize_embedding(table: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    tf_ = table.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf_), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(tf_ / scale), -127, 127).astype(jnp.int8)
    return {"table_q": q, "table_scale": scale}


def quantize_llama(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every big matmul of a models/llama.py param tree (q/k/v/o,
    gate/up/down, lm_head, embedding). Norm scales stay fp."""
    lp = params["layers"]
    out = {
        "embed": quantize_embedding(params["embed"]["table"]),
        "layers": {
            "attn": {k: quantize_weight(lp["attn"][k]["w"]) for k in ("q", "k", "v", "o")},
            "mlp": {k: quantize_weight(lp["mlp"][k]["w"]) for k in ("gate", "up", "down")},
            "input_ln": lp["input_ln"],
            "post_ln": lp["post_ln"],
        },
        "final_ln": params["final_ln"],
        "lm_head": quantize_weight(params["lm_head"]["w"]),
    }
    return out


def quantize_model(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the LLM backbone of a full MLA param tree; the small
    front-end/head modules (< 2% of bytes) stay in their original dtype."""
    out = dict(params)
    out["llm_backbone"] = quantize_llama(params["llm_backbone"])
    return out


def quantize_model_host(params: Dict[str, Any]) -> Dict[str, Any]:
    """Host-side (numpy) variant for quantizing REAL checkpoints before
    device_put — avoids materializing fp32 transients in HBM."""
    import numpy as np

    def qw(w):
        wf = np.asarray(w, np.float32)
        amax = np.max(np.abs(wf), axis=-2, keepdims=True)
        scale = np.maximum(amax, 1e-8) / 127.0
        q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        return {"w_q": q, "w_scale": scale.astype(np.float32)}

    def qe(table):
        tf_ = np.asarray(table, np.float32)
        amax = np.max(np.abs(tf_), axis=-1, keepdims=True)
        scale = np.maximum(amax, 1e-8) / 127.0
        q = np.clip(np.round(tf_ / scale), -127, 127).astype(np.int8)
        return {"table_q": q, "table_scale": scale.astype(np.float32)}

    llama = params["llm_backbone"]
    lp = llama["layers"]
    out = dict(params)
    out["llm_backbone"] = {
        "embed": qe(llama["embed"]["table"]),
        "layers": {
            "attn": {k: qw(lp["attn"][k]["w"]) for k in ("q", "k", "v", "o")},
            "mlp": {k: qw(lp["mlp"][k]["w"]) for k in ("gate", "up", "down")},
            "input_ln": lp["input_ln"],
            "post_ln": lp["post_ln"],
        },
        "final_ln": llama["final_ln"],
        "lm_head": qw(llama["lm_head"]["w"]),
    }
    return out


# --------------------------------------------------------------------------- #
# int4 weight-only quantization (W4A8 serving)
# --------------------------------------------------------------------------- #
#
# Nibble-packed int4 weights halve weight STORAGE vs int8 (3.4 GB for the
# 7B backbone). On the current toolchain this is a MEMORY mode, not a
# latency mode: XLA lowers the s4-operand dot through a slow VPU path on
# the target chip (~113 ms/decode-step vs int8's ~10.7, measured in the
# integrated 7B graph across per-channel/grouped and K-/N-packed layouts),
# and a Pallas kernel cannot beat it either — VPU converts run at ~1e12
# elem/s, so any in-VMEM unpack/dequant of 6.7e9 weights costs more than
# the int8 bandwidth it saves (docs/kernels.md "Round-2 updates").
# Environment quirk: jnp.int4 arrays cannot cross this box's host->device
# transfer layer, so weights are STORED as packed int8 and bitcast to int4
# inside the consuming jit program.
#
# Scales are per-(group, out-channel) with `group_size` rows per group
# (int4 per-channel-only is too lossy; group-128 is the standard operating
# point).


def pack_int4(q) -> jnp.ndarray:
    """[..., K, N] int4-valued array -> packed int8 [..., K, N/2].

    Packing runs along the OUT dim (adjacent output channels share a byte,
    even channel in the low nibble): `bitcast_convert_type(int8 -> int4)`
    appends the nibble pair as a minor-most axis, so unpacking is bitcast +
    a layout-preserving reshape — no transpose. (Packing along K needs a
    transpose whose s4 materialization XLA lowers to a slow VPU loop —
    measured ~0.8 ms/matmul, 20x the read floor.)"""
    lo = q[..., :, 0::2].astype(jnp.uint8) & 0xF
    hi = q[..., :, 1::2].astype(jnp.uint8) & 0xF
    return jax.lax.bitcast_convert_type((hi << 4) | lo, jnp.int8)


def unpack_int4_reference(packed) -> jnp.ndarray:
    """int8-arithmetic unpack (no int4 dtype) — the master/CPU path and the
    numerics yardstick for the native-int4 dot. Arithmetic shifts recover the
    signed nibbles: low = (b << 4) >> 4, high = b >> 4."""
    b = packed.astype(jnp.int8)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(b, jnp.int8(4))
    return jnp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (2 * packed.shape[-1],))


def unpack_int4_native(packed) -> jnp.ndarray:
    """Packed int8 [..., K, N/2] -> int4 [..., K, N] via bitcast + free
    reshape; the consuming dot reads nibble bytes straight from HBM."""
    w4 = jax.lax.bitcast_convert_type(packed, jnp.int4)  # [..., K, N/2, 2]
    return w4.reshape(packed.shape[:-1] + (2 * packed.shape[-1],))


def quantize_weight_int4(w, group_size: int = 128):
    """Symmetric int4 with per-(group, out-channel) scales over the `in` dim.
    Returns {'w_q4': int8 packed [..., K, N/2], 'w_scale4': f32 [..., K/gs, N]}.
    jnp-traceable (usable under eval_shape); leading dims are batch (stacked
    layers)."""
    wf = jnp.asarray(w, jnp.float32)
    K, N = wf.shape[-2:]
    lead = wf.shape[:-2]
    gs = group_size if group_size else K
    assert K % gs == 0 and N % 2 == 0, (K, gs, N)
    g = wf.reshape(lead + (K // gs, gs, N))
    amax = jnp.abs(g).max(axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8).reshape(lead + (K, N))
    return {"w_q4": pack_int4(q), "w_scale4": scale[..., 0, :].astype(jnp.float32)}


def dequantize_weight_int4(p, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of quantize_weight_int4; handles the same leading batch dims
    (stacked [L, K, N] layer leaves) as pack/unpack do."""
    q = unpack_int4_reference(p["w_q4"])
    lead = q.shape[:-2]
    K, N = q.shape[-2:]
    G = p["w_scale4"].shape[-2]
    w = q.astype(jnp.float32).reshape(lead + (G, K // G, N)) * p["w_scale4"][..., :, None, :]
    return w.reshape(lead + (K, N)).astype(dtype)


def int4_linear(p: Dict[str, Any], x: jnp.ndarray, *, native: bool = True) -> jnp.ndarray:
    """x @ dequant(w4) with W8A8-style per-token activation quantization and
    the group-scale rescale applied on int32 partial sums. `native=False`
    uses the int8-arithmetic unpack (CPU tests / numerics yardstick)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    xf = x.reshape(-1, K).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    w = unpack_int4_native(p["w_q4"]) if native else unpack_int4_reference(p["w_q4"])
    scales = p["w_scale4"]  # [G, N]
    G = scales.shape[0]
    N = w.shape[1]
    if G == 1:
        acc = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * scales[0]
    else:
        gs = K // G
        xg = xq.reshape(-1, G, gs)
        wg = w.reshape(G, gs, N)
        # batched-over-groups int8 x int4 dot -> [G, M, N] int32 partials
        acc = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((1,), (0,))), preferred_element_type=jnp.int32
        )
        y = (acc.astype(jnp.float32) * scales[:, None, :]).sum(0) * sx
    y = y.astype(x.dtype).reshape(lead + (N,))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def quantize_llama_int4(params: Dict[str, Any], group_size: int = 128) -> Dict[str, Any]:
    """int4-quantize the big matmuls of a models/llama.py tree (jnp-traceable,
    so it works under eval_shape; stacked [L, K, N] leaves quantize per layer
    via the leading-dim support). Embedding stays int8 (gather reads are
    row-sparse; nibble packing buys nothing there)."""
    lp = params["layers"]
    qw4 = lambda leaf: quantize_weight_int4(leaf["w"], group_size)
    return {
        "embed": quantize_embedding(params["embed"]["table"]),
        "layers": {
            "attn": {k: qw4(lp["attn"][k]) for k in ("q", "k", "v", "o")},
            "mlp": {k: qw4(lp["mlp"][k]) for k in ("gate", "up", "down")},
            "input_ln": lp["input_ln"],
            "post_ln": lp["post_ln"],
        },
        "final_ln": params["final_ln"],
        "lm_head": qw4(params["lm_head"]),
    }


def quantize_model_int4(params: Dict[str, Any], group_size: int = 128) -> Dict[str, Any]:
    """int4-quantize the LLM backbone of a full MLA param tree (host-side)."""
    out = dict(params)
    out["llm_backbone"] = quantize_llama_int4(params["llm_backbone"], group_size)
    return out


# --------------------------------------------------------------------------- #
# Pallas int8-weight matmul (serving hot path)
# --------------------------------------------------------------------------- #
#
# XLA materializes `convert(int8->bf16)` of a weight operand to HBM before
# the dot (measured: 34 ms vs the ~9 ms bandwidth bound per 7B decode step).
# This kernel streams int8 weight tiles into VMEM, dequantizes on-chip, and
# feeds the MXU — HBM traffic is the int8 bytes only.

import functools as _functools

from jax.experimental import pallas as _pl


def _int8_mm_kernel(x_ref, wq_ref, scale_ref, o_ref):
    x = x_ref[0]                               # [M, K] (bf16/f32 as given)
    w = wq_ref[0].astype(x.dtype)              # [K, BN] dequant in VMEM
    s = scale_ref[0][0].astype(jnp.float32)    # [BN]
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (acc * s[None, :]).astype(o_ref.dtype)


def int8_matmul(
    x: jnp.ndarray,        # [M, K] activations
    w_q: jnp.ndarray,      # [K, N] int8
    w_scale: jnp.ndarray,  # [1, N] or [N]
    *,
    block_n: int = 256,
    interpret=None,
) -> jnp.ndarray:
    """x @ dequant(w) with tile-wise on-chip dequantization. M is padded to
    the sublane multiple internally."""
    M, K = x.shape
    N = w_q.shape[1]
    scale = w_scale.reshape(1, N)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    sub = 8
    Mp = (M + sub - 1) // sub * sub
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    bn = min(block_n, N)
    while N % bn:  # grid = N // bn must COVER N, or trailing cols stay unwritten
        bn //= 2

    out = _pl.pallas_call(
        _int8_mm_kernel,
        grid=(N // bn,),
        in_specs=[
            _pl.BlockSpec((1, Mp, K), lambda j: (0, 0, 0)),
            _pl.BlockSpec((1, K, bn), lambda j: (0, 0, j)),
            _pl.BlockSpec((1, 1, bn), lambda j: (0, 0, j)),
        ],
        out_specs=_pl.BlockSpec((1, Mp, bn), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((1, Mp, N), x.dtype),
        interpret=interpret,
    )(x[None], w_q[None], scale[None])
    return out[0, :M]


def int8_linear(p: Dict[str, Any], x: jnp.ndarray, *, block_n: int = 256) -> jnp.ndarray:
    """nn.linear-compatible entry: x [..., K] with {'w_q','w_scale'(,'b')}."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    y = int8_matmul(x.reshape(-1, K), p["w_q"], p["w_scale"].reshape(1, -1), block_n=block_n)
    y = y.reshape(lead + (y.shape[-1],))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# --------------------------------------------------------------------------- #
# Pallas fused W8A8 matmul (decode hot path)
# --------------------------------------------------------------------------- #
#
# Round-3 finding (scripts/profile_suffix_ops.py, real v5e): the XLA W8A8
# decode path runs the per-token activation quantization as a SEPARATE VPU
# op between consecutive int8 dots — HBM sits idle for ~13 us per matmul
# while it runs, costing ~1.7 ms of the ~10.7 ms suffix step (the chained
# dots alone measure 9.19 ms vs the 7.2 ms achievable weight-read floor;
# with the quant hoisted out they measure 7.48 ms). This kernel fuses
# [activation quant -> int8xint8 MXU dot -> fp32 rescale] into ONE program:
# the tiny quant recomputes per weight block inside the kernel (VPU work
# « per-block DMA, so it hides completely behind the weight stream), and
# the int8 weights feed the MXU directly — no VPU dequant (the mistake that
# sank the round-1 int8 Pallas kernel, which converted 6.7e9 weights at
# ~1e12 elem/s).
#
# Numerics: identical quantization + exact int32 dot as the XLA w8a8 path;
# the final fp32 rescale agrees to ~1 ulp (XLA folds the two scale
# broadcasts into one multiply, reassociating the rounding) — asserted in
# tests/test_quantization.py against an exact integer numpy reference.


def _w8a8_kernel(x_ref, wq_ref, scale_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)                      # [Mp, K]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    ws = scale_ref[0][0].astype(jnp.float32)               # [BN]
    o_ref[0] = (acc.astype(jnp.float32) * sx * ws[None, :]).astype(o_ref.dtype)


def w8a8_matmul(
    x: jnp.ndarray,        # [M, K] activations (bf16/f32)
    w_q: jnp.ndarray,      # [K, N] int8
    w_scale: jnp.ndarray,  # [1, N] or [N] fp32 per-out-channel scales
    *,
    block_n: int = 512,
    interpret=None,
) -> jnp.ndarray:
    """Fused per-token-quant + native int8 dot + rescale. M is padded to the
    32-sublane int8 tile internally; K and N must be multiples of (32, 128)
    (every 7B decode matmul is)."""
    M, K = x.shape
    N = w_q.shape[1]
    scale = w_scale.reshape(1, N)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Mp = max((M + 31) // 32 * 32, 32)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    bn = min(block_n, N)
    while N % bn:
        bn //= 2

    out = _pl.pallas_call(
        _w8a8_kernel,
        grid=(N // bn,),
        in_specs=[
            _pl.BlockSpec((1, Mp, K), lambda j: (0, 0, 0)),
            _pl.BlockSpec((1, K, bn), lambda j: (0, 0, j)),
            _pl.BlockSpec((1, 1, bn), lambda j: (0, 0, j)),
        ],
        out_specs=_pl.BlockSpec((1, Mp, bn), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((1, Mp, N), x.dtype),
        interpret=interpret,
    )(x[None], w_q[None], scale[None])
    return out[0, :M]


def w8a8_linear(p: Dict[str, Any], x: jnp.ndarray, *, block_n: int = 512) -> jnp.ndarray:
    """nn.linear-compatible fused W8A8 entry for 2-D {'w_q','w_scale'} leaves."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    y = w8a8_matmul(x.reshape(-1, K), p["w_q"], p["w_scale"].reshape(1, -1), block_n=block_n)
    y = y.reshape(lead + (y.shape[-1],))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def w8a8_pallas_eligible(p: Dict[str, Any], x: jnp.ndarray, max_m: int = 64) -> bool:
    """The fused kernel targets DECODE shapes: small M (the quant stall it
    removes only matters when dots are bandwidth-bound), 2-D weight leaves,
    tile-aligned K/N."""
    if "w_q" not in p or p["w_q"].ndim != 2:
        return False
    K, N = p["w_q"].shape
    M = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    return M <= max_m and K % 128 == 0 and N % 128 == 0



