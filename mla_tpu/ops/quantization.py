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
