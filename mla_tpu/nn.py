"""Functional neural-net layer library.

Everything is (init, apply) pairs over plain-dict param pytrees:

  params = linear_init(key, 4, 8)
  y = linear(params, x)

Design notes (TPU-first):
  * No module objects — params are pytrees, so every composed model is
    directly jit/pjit/scan/vmap-able and trivially shardable with
    `jax.sharding` PartitionSpecs addressed by dict path.
  * Weights are stored as `[in_dim, out_dim]` (JAX convention, i.e. the
    transpose of torch's `nn.Linear.weight`); checkpoint converters
    transpose when importing reference weights.
  * Norm math runs in float32 regardless of input dtype and casts back
    (matches torch mixed-precision semantics on the reference path).
  * BatchNorm (used by the point tokenizer's Point_PN stages, reference
    models/mla/pointcloud/backbone/Point_PN.py:173-219) is functional:
    `batch_norm(p, s, x, training)` returns `(y, new_state)`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# --------------------------------------------------------------------------- #
# Initializers
# --------------------------------------------------------------------------- #


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform over the last two dims (fan_in, fan_out)."""
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def trunc_normal_init(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal (±2σ), matching timm's trunc_normal_."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch nn.Linear / nn.Conv default weight init: U(-1/sqrt(fan_in), ...)
    with a = sqrt(5), which reduces to bound = 1/sqrt(fan_in)."""
    fan_in = shape[-2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# --------------------------------------------------------------------------- #
# Linear
# --------------------------------------------------------------------------- #


def linear_init(
    key,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    w_init: str = "xavier",
    w_std: float = 0.02,
    dtype=jnp.float32,
) -> Params:
    wkey, bkey = jax.random.split(key)
    if w_init == "xavier":
        w = xavier_uniform(wkey, (in_dim, out_dim), dtype)
    elif w_init == "normal":
        w = normal_init(wkey, (in_dim, out_dim), w_std, dtype)
    elif w_init == "trunc_normal":
        w = trunc_normal_init(wkey, (in_dim, out_dim), w_std, dtype)
    elif w_init == "torch":
        w = kaiming_uniform(wkey, (in_dim, out_dim), dtype)
    elif w_init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
    else:
        raise ValueError(f"unknown w_init {w_init!r}")
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p: Params, x):
    if "w_q4" in p:
        # int4 weight-only leaf (ops/quantization.quantize_weight_int4):
        # W8A8-style activation quant + native int8 x int4 MXU dot with
        # group-scale rescale — HBM reads the nibble bytes only. The
        # int8-arithmetic unpack path serves as the CPU/master yardstick.
        from mla_tpu.ops.quantization import int4_linear

        return int4_linear(p, x, native=jax.default_backend() == "tpu")
    if "w_q" in p:
        # int8-quantized leaf (ops/quantization.py). Execution modes
        # (MLA_INT8_MODE env, default "w8a8" on TPU, "dequant" elsewhere):
        #   w8a8    — per-token dynamic activation quantization + NATIVE
        #             int8xint8 MXU dot (exact integer matmul, rescaled
        #             fp32): HBM reads the int8 weights only and the MXU
        #             runs at its int8 rate. Serving-grade numerics
        #             (per-token + per-channel scales).
        #   dequant — bf16 dot on converted weights (numerics-safe master
        #             path; XLA materializes the converted weights, ~3x
        #             decode-step traffic).
        #   pallas  — ops/quantization.int8_linear VMEM-dequant kernel
        #             (correct standalone; crashes this env's remote TPU
        #             compile helper when embedded in the scanned decoder).
        import os

        wq = p["w_q"]
        mode = os.environ.get(
            "MLA_INT8_MODE", "w8a8" if jax.default_backend() == "tpu" else "dequant"
        )
        if mode == "pallas" and wq.ndim == 2 and wq.shape[0] % 128 == 0 and wq.shape[1] % 128 == 0:
            from mla_tpu.ops.quantization import int8_linear

            return int8_linear(p, x)
        if mode == "w8a8_pallas":
            # fused [act-quant -> int8 MXU dot -> rescale] Pallas program for
            # bandwidth-bound decode shapes; bit-identical math to the w8a8
            # branch below (tests/test_quantization.py). Ineligible leaves
            # (stacked/odd-shaped/large-M) fall through to XLA w8a8.
            from mla_tpu.ops.quantization import w8a8_linear, w8a8_pallas_eligible

            if w8a8_pallas_eligible(p, x):
                return w8a8_linear(p, x)
        if mode in ("w8a8", "w8a8_pallas"):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            sx = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((xq.ndim - 1,), (wq.ndim - 2,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * sx * p["w_scale"][..., 0, :].astype(jnp.float32)
            y = y.astype(x.dtype)
        else:
            # dequant: scale after the dot (x @ (q*s) == (x @ q) * s)
            y = x @ wq.astype(x.dtype)
            y = y * p["w_scale"][..., 0, :].astype(x.dtype)
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# --------------------------------------------------------------------------- #
# Norms
# --------------------------------------------------------------------------- #


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_noaffine(x, eps: float = 1e-6):
    """LayerNorm(elementwise_affine=False) — used by DiT blocks."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rms_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p: Params, x, eps: float = 1e-6):
    """Llama-style RMSNorm (reference modeling_llama.py LlamaRMSNorm):
    fp32 variance, cast back, then scale in input dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["scale"].astype(x.dtype)


# --------------------------------------------------------------------------- #
# Activations
# --------------------------------------------------------------------------- #


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


# --------------------------------------------------------------------------- #
# MLPs
# --------------------------------------------------------------------------- #


def mlp_init(
    key,
    in_dim: int,
    hidden_dim: int,
    out_dim: Optional[int] = None,
    w_init: str = "xavier",
    dtype=jnp.float32,
) -> Params:
    """timm-style Mlp: fc1 -> act -> fc2 (reference ActionEmbedder /
    FinalLayer use this with GELU(tanh), models/diffusion/models.py:112-123,
    173-189)."""
    out_dim = out_dim if out_dim is not None else in_dim
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_dim, hidden_dim, w_init=w_init, dtype=dtype),
        "fc2": linear_init(k2, hidden_dim, out_dim, w_init=w_init, dtype=dtype),
    }


def mlp(p: Params, x, act=gelu_tanh):
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def mlp_gelu_init(key, in_dim: int, hidden_dim: int, depth: int = 2, dtype=jnp.float32) -> Params:
    """Reference MLP_GELU projector (models/mla/image/vision_tokenizer.py:79-89):
    Linear(in,hidden) then (depth-1) x [GELU, Linear(hidden,hidden)]."""
    keys = jax.random.split(key, depth)
    layers = [linear_init(keys[0], in_dim, hidden_dim, dtype=dtype)]
    for i in range(1, depth):
        layers.append(linear_init(keys[i], hidden_dim, hidden_dim, dtype=dtype))
    return {"layers": layers}


def mlp_gelu(p: Params, x):
    x = linear(p["layers"][0], x)
    for lp in p["layers"][1:]:
        x = linear(lp, gelu_exact(x))
    return x


def proj_head_init(key, in_dim: int, hidden_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """Sequential(Linear, ReLU, Linear) — the contrastive projection heads
    (reference models/mla/fuser/contrastive.py:174-183)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_dim, hidden_dim, dtype=dtype),
        "fc2": linear_init(k2, hidden_dim, out_dim, dtype=dtype),
    }


def proj_head(p: Params, x):
    return linear(p["fc2"], jax.nn.relu(linear(p["fc1"], x)))


# --------------------------------------------------------------------------- #
# Embedding
# --------------------------------------------------------------------------- #


def embedding_init(key, vocab: int, dim: int, std: float = 0.02, dtype=jnp.float32) -> Params:
    return {"table": normal_init(key, (vocab, dim), std, dtype)}


def embedding(p: Params, ids):
    return jnp.take(p["table"], ids, axis=0)


# --------------------------------------------------------------------------- #
# BatchNorm (functional, with running-stats state)
# --------------------------------------------------------------------------- #


def batch_norm_init(dim: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batch_norm(p: Params, s: Params, x, training: bool, momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over all axes except the last (channel-last layout).

    Torch's BatchNorm1d/2d normalize over channel dim 1 of NCHW; here we keep
    channel-last, so callers arrange channels last. Returns (y, new_state).
    """
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    if training:
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.var(xf, axis=reduce_axes)
        n = math.prod([x.shape[i] for i in reduce_axes]) if reduce_axes else 1
        # torch tracks unbiased var in running stats
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_s


# --------------------------------------------------------------------------- #
# Multi-head attention (reference-math path; Pallas kernels live in ops/)
# --------------------------------------------------------------------------- #


def mha_init(key, dim: int, num_heads: int, qkv_bias: bool = True, dtype=jnp.float32) -> Params:
    """Standard MHA with packed qkv (timm Attention / nn.MultiheadAttention)."""
    del num_heads  # head count is a call-time arg (params must stay pure pytrees)
    k1, k2 = jax.random.split(key)
    return {
        "qkv": linear_init(k1, dim, 3 * dim, bias=qkv_bias, dtype=dtype),
        "proj": linear_init(k2, dim, dim, dtype=dtype),
    }


def mha(p: Params, x, num_heads: int, kv: Optional[jnp.ndarray] = None):
    """Self-attention (or cross-attention when `kv` given) without masking —
    used by the small generation/DiT heads where S is tiny; the LLM uses the
    Pallas flash kernel in ops/flash_attention.py instead."""
    h = num_heads
    B, Sq, D = x.shape
    hd = D // h
    if kv is None:
        qkv = linear(p["qkv"], x).reshape(B, Sq, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        w = p["qkv"]["w"]
        bq = p["qkv"].get("b")
        q = x @ w[:, :D]
        k = kv @ w[:, D : 2 * D]
        v = kv @ w[:, 2 * D :]
        if bq is not None:
            q, k, v = q + bq[:D], k + bq[D : 2 * D], v + bq[2 * D :]
        Sk = kv.shape[1]
        q = q.reshape(B, Sq, h, hd)
        k = k.reshape(B, Sk, h, hd)
        v = v.reshape(B, Sk, h, hd)
    q = jnp.swapaxes(q, 1, 2)  # [B,h,Sq,hd]
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = jnp.swapaxes(out, 1, 2).reshape(B, Sq, D)
    return linear(p["proj"], out)
