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


def test_w8a8_pallas_fused_matches_xla(monkeypatch):
    """The fused Pallas W8A8 kernel (quant+dot+rescale in one program)
    computes the SAME quantization + exact int32 dot as the XLA w8a8
    branch; the final fp32 rescale agrees to ~1 ulp (XLA may fold the
    [M,1] x [N] scale broadcasts into one multiply, reassociating the fp32
    rounding). Runs in interpret mode on CPU; the real chip is exercised by
    scripts/profile_suffix_ops.py / bench.py."""
    rng = np.random.default_rng(11)
    K, N, M = 256, 384, 19
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.04
    x = jnp.asarray(rng.normal(size=(1, M, K)).astype(np.float32))
    pq = q.quantize_weight(jnp.asarray(w))

    # exact integer reference in numpy: same amax/scale, same int dot
    xf = np.asarray(x[0])
    sx = np.maximum(np.abs(xf).max(-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(xf / sx), -127, 127).astype(np.int64)
    acc = xq @ np.asarray(pq["w_q"], dtype=np.int64)
    y_int_ref = acc.astype(np.float32) * sx.astype(np.float32) * np.asarray(
        pq["w_scale"][0], dtype=np.float32
    )

    monkeypatch.setenv("MLA_INT8_MODE", "w8a8")
    y_xla = nn.linear(pq, x)
    monkeypatch.setenv("MLA_INT8_MODE", "w8a8_pallas")
    assert q.w8a8_pallas_eligible(pq, x)
    y_pl = nn.linear(pq, x)
    np.testing.assert_allclose(np.asarray(y_pl[0]), y_int_ref, rtol=3e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_pl), rtol=3e-7, atol=1e-7)

    # bias path + bf16 activations
    pqb = {**pq, "b": jnp.asarray(rng.normal(size=(N,)).astype(np.float32))}
    xb = x.astype(jnp.bfloat16)
    monkeypatch.setenv("MLA_INT8_MODE", "w8a8")
    y_xla = nn.linear(pqb, xb)
    monkeypatch.setenv("MLA_INT8_MODE", "w8a8_pallas")
    y_pl = nn.linear(pqb, xb)
    np.testing.assert_allclose(
        np.asarray(y_xla, dtype=np.float32), np.asarray(y_pl, dtype=np.float32),
        rtol=1e-2, atol=1e-2,  # bf16 output rounding dominates
    )

    # ineligible shapes (large M / stacked leaves) fall back to XLA w8a8
    x_big = jnp.asarray(rng.normal(size=(2, 128, K)).astype(np.float32))
    assert not q.w8a8_pallas_eligible(pq, x_big)
    y_fb = nn.linear(pq, x_big)
    monkeypatch.setenv("MLA_INT8_MODE", "w8a8")
    np.testing.assert_array_equal(np.asarray(nn.linear(pq, x_big)), np.asarray(y_fb))


# --------------------------------------------------------------------------- #
# int4 weight-only (W4A8 serving path)
# --------------------------------------------------------------------------- #


def test_int4_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(-7, 8, size=(64, 48)).astype(np.int8)
    packed = q.pack_int4(jnp.asarray(vals))
    assert packed.shape == (64, 24) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q.unpack_int4_reference(packed)), vals)
    # native bitcast unpack agrees with the arithmetic-shift reference
    np.testing.assert_array_equal(
        np.asarray(q.unpack_int4_native(packed).astype(jnp.int8)), vals
    )


def test_int4_quantize_dequantize_error_bound():
    """Group-128 symmetric int4 on gaussian weights: per-element error is
    bounded by half the group step (amax/14)."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    p = q.quantize_weight_int4(jnp.asarray(w), group_size=128)
    wd = np.asarray(q.dequantize_weight_int4(p, jnp.float32))
    step = np.asarray(p["w_scale4"])  # [G, N]
    bound = np.repeat(step, 128, axis=0) / 2 + 1e-6
    assert (np.abs(wd - w) <= bound).all()


def test_int4_dequantize_stacked_layer_leaves():
    """dequantize_weight_int4 handles the stacked [L, K, N] leaves
    quantize_weight_int4 produces for scan-stacked layers, matching the
    per-layer 2-D path exactly."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(3, 256, 64)).astype(np.float32)
    p = q.quantize_weight_int4(jnp.asarray(w), group_size=128)
    wd = np.asarray(q.dequantize_weight_int4(p, jnp.float32))
    assert wd.shape == w.shape
    for i in range(3):
        p_i = {"w_q4": p["w_q4"][i], "w_scale4": p["w_scale4"][i]}
        np.testing.assert_array_equal(wd[i], np.asarray(q.dequantize_weight_int4(p_i, jnp.float32)))


def test_int4_linear_matches_dequant_matmul():
    """int4_linear == x @ dequant(w4) up to the activation quantization."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(256, 96)).astype(np.float32)
    x = rng.normal(size=(3, 5, 256)).astype(np.float32)
    p = q.quantize_weight_int4(jnp.asarray(w), group_size=64)
    wd = np.asarray(q.dequantize_weight_int4(p, jnp.float32))
    y_ref = x @ wd
    y = np.asarray(q.int4_linear(p, jnp.asarray(x), native=False))
    rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert rel < 0.02, rel
    # nn.linear dispatches transparently on the leaf keys
    y_nn = np.asarray(nn.linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(y_nn, y, atol=1e-5)


def test_int4_quantized_llama_close_to_fp():
    """Sanity bound, not a quality claim: a 2-layer random-init llama is the
    worst case for int4 (logits hover near zero so relative error is
    inflated); the bound pins that the path is wired right, the per-weight
    error bound test above pins the quantizer itself."""
    cfg = llama_mod.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=32,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    params = llama_mod.llama_init(jax.random.PRNGKey(3), cfg)
    qparams = q.quantize_llama_int4(params, group_size=32)
    ids = jnp.asarray(np.array([[3, 17, 42, 9]]))
    emb = llama_mod.embed_tokens(params, ids)
    out_fp = llama_mod.llama_forward(params, cfg, emb)["logits"]
    out_q = llama_mod.llama_forward(qparams, cfg, emb)["logits"]
    denom = np.abs(np.asarray(out_fp)).max()
    assert np.abs(np.asarray(out_fp - out_q)).max() / denom < 0.3


def test_int4_eval_shape_and_fusion():
    """quantize_llama_int4 works abstractly (bench builds zero trees from
    eval_shape) and fuse_for_serving concatenates int4 leaves."""
    cfg = llama_mod.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=32,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    params = llama_mod.llama_init(jax.random.PRNGKey(4), cfg)
    shapes = jax.eval_shape(lambda p: q.quantize_llama_int4(p, 32), params)
    assert shapes["layers"]["mlp"]["gate"]["w_q4"].shape == (2, 64, 64)
    assert shapes["layers"]["mlp"]["gate"]["w_scale4"].shape == (2, 2, 128)

    qparams = q.quantize_llama_int4(params, group_size=32)
    fused = llama_mod.fuse_for_serving(qparams)
    assert fused["layers"]["attn"]["qkv_fused"]["w_q4"].shape == (2, 64, 96)
    ids = jnp.asarray(np.array([[3, 17, 42, 9]]))
    emb = llama_mod.embed_tokens(params, ids)
    out_q = llama_mod.llama_forward(qparams, cfg, emb)["logits"]
    out_f = llama_mod.llama_forward(fused, cfg, emb)["logits"]
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f), atol=2e-4, rtol=1e-4)
