"""Weight-only int8 quantization: accuracy + transparent wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu import nn
from mla_tpu.models import llama as llama_mod
from mla_tpu.ops import quantization as q


def test_quantize_roundtrip_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    qp = q.quantize_weight(w)
    assert qp["w_q"].dtype == jnp.int8
    back = q.dequantize_weight(qp, jnp.float32)
    # per-channel int8: relative error bounded by ~1/127 of channel max
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    assert err <= float(np.abs(np.asarray(w)).max()) / 127 + 1e-6


def test_linear_transparent_quantized():
    key = jax.random.PRNGKey(1)
    p = nn.linear_init(key, 32, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    y = nn.linear(p, x)
    pq = {**q.quantize_weight(p["w"]), "b": p["b"]}
    yq = nn.linear(pq, x)
    rel = np.abs(np.asarray(y - yq)).max() / (np.abs(np.asarray(y)).max() + 1e-9)
    assert rel < 0.02


def test_quantized_llama_matches_fp():
    cfg = llama_mod.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=32,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    params = llama_mod.llama_init(jax.random.PRNGKey(3), cfg)
    qparams = q.quantize_llama(params)
    assert qparams["layers"]["attn"]["q"]["w_q"].dtype == jnp.int8

    ids = jnp.asarray(np.array([[3, 17, 42, 9]]))
    emb_fp = llama_mod.embed_tokens(params, ids)
    emb_q = llama_mod.embed_tokens(qparams, ids).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(emb_q), np.asarray(emb_fp), atol=2e-3)

    out_fp = llama_mod.llama_forward(params, cfg, emb_fp)["logits"]
    out_q = llama_mod.llama_forward(qparams, cfg, emb_fp)["logits"]
    # logits track closely through 2 layers of int8 weights
    denom = np.abs(np.asarray(out_fp)).max()
    assert np.abs(np.asarray(out_fp - out_q)).max() / denom < 0.05


def test_memory_halved():
    cfg = llama_mod.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, contrastive_layer=1,
    )
    params = llama_mod.llama_init(jax.random.PRNGKey(4), cfg)

    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(t))

    fp = nbytes(params)
    qt = nbytes(q.quantize_llama(params))
    assert qt < 0.45 * fp  # fp32 -> int8 (+small scales)


def test_w8a8_mode_accuracy(monkeypatch):
    """Dynamic per-token activation quant + int8 dot (the TPU serving
    default) stays within ~2% of the fp path."""
    monkeypatch.setenv("MLA_INT8_MODE", "w8a8")
    key = jax.random.PRNGKey(7)
    p = nn.linear_init(key, 64, 32)
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 5, 64))
    y_fp = nn.linear(p, x)
    pq = {**q.quantize_weight(p["w"]), "b": p["b"]}
    y_q = nn.linear(pq, x)
    rel = float(jnp.abs(y_fp - y_q).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert rel < 0.03, rel


def test_w8a8_quantized_llama(monkeypatch):
    monkeypatch.setenv("MLA_INT8_MODE", "w8a8")
    cfg = llama_mod.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=32,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    params = llama_mod.llama_init(jax.random.PRNGKey(3), cfg)
    qparams = q.quantize_llama(params)
    ids = jnp.asarray(np.array([[3, 17, 42, 9]]))
    emb = llama_mod.embed_tokens(params, ids)
    out_fp = llama_mod.llama_forward(params, cfg, emb)["logits"]
    out_q = llama_mod.llama_forward(qparams, cfg, emb)["logits"]
    denom = np.abs(np.asarray(out_fp)).max()
    assert np.abs(np.asarray(out_fp - out_q)).max() / denom < 0.08
