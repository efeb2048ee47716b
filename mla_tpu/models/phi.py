"""Phi-2 decoder (the reference's third LLM backbone family).

Parity target: reference models/backbones/llm/phi.py (+ vendored HF phi
modeling): Phi-2's block differs from Llama's —
  * PARALLEL attention and MLP from one shared LayerNorm:
        h = h + attn(ln(h)) + mlp(ln(h))
  * partial rotary embeddings (rotary_dim < head_dim; default 0.4 * hd),
  * LayerNorm with bias (not RMSNorm), biases on all projections,
  * GELU(tanh) MLP without gating, final LN + biased lm_head.

Same interface contract as models/llama.py (scan-over-layers with the
contrastive-hook split, preallocated KV cache) so the composed model can
swap backbones.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mla_tpu import nn
from mla_tpu.ops import attention as attn_ops
from mla_tpu.ops import rope as rope_ops


@dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    hidden_size: int = 2560
    intermediate_size: int = 10240
    num_layers: int = 32
    num_heads: int = 32
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.4
    ln_eps: float = 1e-5
    contrastive_layer: int = 8
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)


PHI_2 = PhiConfig()
PHI_TEST = PhiConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                     num_layers=4, num_heads=4, contrastive_layer=2,
                     compute_dtype=jnp.float32)


def phi_init(key: jax.Array, cfg: PhiConfig) -> Dict[str, Any]:
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 10)
    dt = cfg.param_dtype

    def stacked(k, shape):
        return nn.normal_init(k, (L,) + shape, 0.02, dt)

    def stacked_zeros(shape):
        return jnp.zeros((L,) + shape, dt)

    return {
        "embed": {"table": nn.normal_init(ks[0], (cfg.vocab_size, D), 0.02, dt)},
        "layers": {
            "attn": {
                "q": {"w": stacked(ks[1], (D, D)), "b": stacked_zeros((D,))},
                "k": {"w": stacked(ks[2], (D, D)), "b": stacked_zeros((D,))},
                "v": {"w": stacked(ks[3], (D, D)), "b": stacked_zeros((D,))},
                "o": {"w": stacked(ks[4], (D, D)), "b": stacked_zeros((D,))},
            },
            "mlp": {
                "fc1": {"w": stacked(ks[5], (D, I)), "b": stacked_zeros((I,))},
                "fc2": {"w": stacked(ks[6], (I, D)), "b": stacked_zeros((D,))},
            },
            "ln": {"scale": jnp.ones((L, D), dt), "bias": stacked_zeros((D,))},
        },
        "final_ln": nn.layer_norm_init(D, dt),
        "lm_head": nn.linear_init(ks[7], D, cfg.vocab_size, w_init="normal", dtype=dt),
    }


def init_kv_cache(cfg: PhiConfig, batch: int, max_len: int, dtype=None):
    dtype = dtype or cfg.compute_dtype
    shape = (cfg.num_layers, batch, cfg.num_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _apply_partial_rope(q, k, cos, sin, positions, rotary_dim):
    q_rot, q_pass = q[..., :rotary_dim], q[..., rotary_dim:]
    k_rot, k_pass = k[..., :rotary_dim], k[..., rotary_dim:]
    q_rot, k_rot = rope_ops.apply_rope(q_rot, k_rot, cos, sin, positions)
    return (
        jnp.concatenate([q_rot, q_pass], -1),
        jnp.concatenate([k_rot, k_pass], -1),
    )


def _layer_fn(lp, h, cache_kv, cfg: PhiConfig, cos, sin, positions, key_mask, cache_len, use_flash,
              scores_dtype=None):
    B, S, D = h.shape
    H, hd = cfg.num_heads, cfg.head_dim

    x = nn.layer_norm(lp["ln"], h, cfg.ln_eps)
    q = nn.linear(lp["attn"]["q"], x).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = nn.linear(lp["attn"]["k"], x).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    v = nn.linear(lp["attn"]["v"], x).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    q, k = _apply_partial_rope(q, k, cos, sin, positions, cfg.rotary_dim)

    is_static_prefill = cache_kv is not None and isinstance(cache_len, int) and cache_len == 0
    if cache_kv is not None:
        k_cache, v_cache = cache_kv
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, cache_len, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, cache_len, 0))
        k_all, v_all = (k, v) if is_static_prefill else (k_cache, v_cache)
        new_cache = (k_cache, v_cache)
    else:
        k_all, v_all = k, v
        new_cache = None

    causal_offset = 0 if (cache_kv is None or is_static_prefill) else cache_len
    mask = None
    if key_mask is not None:
        km = key_mask
        if is_static_prefill and km.shape[-1] != k_all.shape[2]:
            km = km[:, : k_all.shape[2]]
        mask = km[:, None, None, :]
    attn_out = attn_ops.sdpa(q, k_all, v_all, mask=mask, causal=True,
                             causal_offset=causal_offset, use_flash=use_flash,
                             scores_dtype=scores_dtype)
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, S, D)
    attn_out = nn.linear(lp["attn"]["o"], attn_out)

    mlp_out = nn.linear(lp["mlp"]["fc2"], nn.gelu_tanh(nn.linear(lp["mlp"]["fc1"], x)))
    # parallel residual: both branches read the SAME ln(h)
    return h + attn_out + mlp_out, new_cache


def phi_forward(
    params, cfg: PhiConfig, inputs_embeds, *, positions=None, key_mask=None,
    kv_cache=None, cache_len=0, remat=False, use_flash=None, compute_logits=True,
    scan_unroll=None, cache_read_only=False, scores_dtype=None,
):  # scan_unroll/cache_read_only accepted for decoder-interface parity
    # (scan-only here: read_only falls back to the write-then-attend path,
    # whose semantics are identical)
    del cache_read_only
    B, S, D = inputs_embeds.shape
    h = inputs_embeds.astype(cfg.compute_dtype)
    if positions is None:
        positions = jnp.arange(S) + cache_len
    cos, sin = rope_ops.rope_tables(cfg.rotary_dim, cfg.max_position_embeddings, cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    layer = partial(_layer_fn, cfg=cfg, cos=cos, sin=sin, positions=positions,
                    key_mask=key_mask, cache_len=cache_len, use_flash=use_flash,
                    scores_dtype=scores_dtype)
    if remat:
        layer = jax.checkpoint(layer, prevent_cse=False)

    def slice_tree(tree, lo, hi):
        return jax.tree_util.tree_map(lambda x: x[lo:hi], tree)

    def scan_layers(h, lp_slice, cache_slice):
        if cache_slice is None:
            def step(carry, lp):
                new_h, _ = layer(lp, carry, None)
                return new_h, None

            h, _ = jax.lax.scan(step, h, lp_slice)
            return h, None

        def step(carry, xs):
            lp, ck, cv = xs
            new_h, (nk, nv) = layer(lp, carry, (ck, cv))
            return new_h, (nk, nv)

        h, (nk, nv) = jax.lax.scan(step, h, (lp_slice, cache_slice["k"], cache_slice["v"]))
        return h, {"k": nk, "v": nv}

    ksplit = cfg.contrastive_layer
    cache_lo = slice_tree(kv_cache, 0, ksplit) if kv_cache is not None else None
    cache_hi = slice_tree(kv_cache, ksplit, cfg.num_layers) if kv_cache is not None else None
    h, clo = scan_layers(h, slice_tree(params["layers"], 0, ksplit), cache_lo)
    hidden_mid = h
    h, chi = scan_layers(h, slice_tree(params["layers"], ksplit, cfg.num_layers), cache_hi)

    out = {"last_hidden": nn.layer_norm(params["final_ln"], h, cfg.ln_eps), "hidden_mid": hidden_mid}
    if kv_cache is not None:
        out["kv_cache"] = {
            "k": jnp.concatenate([clo["k"], chi["k"]], 0),
            "v": jnp.concatenate([clo["v"], chi["v"]], 0),
        }
    if compute_logits:
        out["logits"] = lm_head_logits(params, out["last_hidden"])
    return out


def lm_head_logits(params: Dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
    """fp32 logits from (final-LN'd) hidden states — phi's biased lm_head.
    Part of the canonical decoder-module interface (see models/llama.py)."""
    return (
        hidden.astype(jnp.float32) @ params["lm_head"]["w"].astype(jnp.float32)
        + params["lm_head"]["b"].astype(jnp.float32)
    )


def convert_hf_phi(sd: Dict[str, Any], num_layers: int, prefix: str = "") -> Dict[str, Any]:
    """HF PhiForCausalLM state dict -> phi pytree (model.layers.N.{self_attn.
    {q,k,v}_proj, dense}, mlp.{fc1,fc2}, input_layernorm, final_layernorm)."""
    import numpy as np

    from mla_tpu.models.convert import _t

    def k(s):
        return f"{prefix}{s}"

    def stack_lin(fmt):
        return {
            "w": np.stack([_t(sd[k(fmt.format(i=i) + ".weight")]).T for i in range(num_layers)]),
            "b": np.stack([_t(sd[k(fmt.format(i=i) + ".bias")]) for i in range(num_layers)]),
        }

    return {
        "embed": {"table": _t(sd[k("model.embed_tokens.weight")])},
        "layers": {
            "attn": {
                "q": stack_lin("model.layers.{i}.self_attn.q_proj"),
                "k": stack_lin("model.layers.{i}.self_attn.k_proj"),
                "v": stack_lin("model.layers.{i}.self_attn.v_proj"),
                "o": stack_lin("model.layers.{i}.self_attn.dense"),
            },
            "mlp": {
                "fc1": stack_lin("model.layers.{i}.mlp.fc1"),
                "fc2": stack_lin("model.layers.{i}.mlp.fc2"),
            },
            "ln": {
                "scale": np.stack([_t(sd[k(f"model.layers.{i}.input_layernorm.weight")]) for i in range(num_layers)]),
                "bias": np.stack([_t(sd[k(f"model.layers.{i}.input_layernorm.bias")]) for i in range(num_layers)]),
            },
        },
        "final_ln": {
            "scale": _t(sd[k("model.final_layernorm.weight")]),
            "bias": _t(sd[k("model.final_layernorm.bias")]),
        },
        "lm_head": {"w": _t(sd[k("lm_head.weight")]).T, "b": _t(sd[k("lm_head.bias")])},
    }


# canonical decoder-module interface (see models/llama.py)
init = phi_init
forward = phi_forward
Config = PhiConfig


def embed_tokens(params, ids):
    return jnp.take(params["embed"]["table"], ids, axis=0)
