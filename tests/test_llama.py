import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.models import llama


@pytest.fixture(scope="module")
def small():
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=4,
        num_heads=4, num_kv_heads=4, max_position_embeddings=64,
        contrastive_layer=2, compute_dtype=jnp.float32,
    )
    params = llama.llama_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(small):
    cfg, params = small
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, cfg.hidden_size))
    out = llama.llama_forward(params, cfg, x)
    assert out["last_hidden"].shape == (2, 10, 64)
    assert out["hidden_mid"].shape == (2, 10, 64)
    assert out["logits"].shape == (2, 10, 128)
    assert out["logits"].dtype == jnp.float32


def test_causality(small):
    """Changing a later token must not affect earlier logits."""
    cfg, params = small
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.hidden_size))
    out1 = llama.llama_forward(params, cfg, x)["logits"]
    x2 = x.at[0, 5].set(x[0, 5] + 10.0)
    out2 = llama.llama_forward(params, cfg, x2)["logits"]
    np.testing.assert_allclose(np.asarray(out1[0, :5]), np.asarray(out2[0, :5]), atol=1e-4)
    assert np.abs(np.asarray(out1[0, 5:]) - np.asarray(out2[0, 5:])).max() > 1e-3


def test_kv_cache_decode_matches_full(small):
    """Prefill+decode through the cache must equal a full forward."""
    cfg, params = small
    S = 12
    x = jax.random.normal(jax.random.PRNGKey(3), (1, S, cfg.hidden_size))
    full = llama.llama_forward(params, cfg, x)["logits"]

    cache = llama.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    key_mask = (jnp.arange(32) < S - 2)[None, :]
    pre = llama.llama_forward(
        params, cfg, x[:, : S - 2], kv_cache=cache, cache_len=0, key_mask=key_mask
    )
    np.testing.assert_allclose(
        np.asarray(pre["logits"][0, -1]), np.asarray(full[0, S - 3]), atol=3e-3
    )
    cache = pre["kv_cache"]
    # decode the last two tokens one at a time
    for i in range(S - 2, S):
        key_mask = (jnp.arange(32) < i + 1)[None, :]
        step = llama.llama_forward(
            params, cfg, x[:, i : i + 1], kv_cache=cache, cache_len=i, key_mask=key_mask
        )
        cache = step["kv_cache"]
        np.testing.assert_allclose(
            np.asarray(step["logits"][0, 0]), np.asarray(full[0, i]), atol=3e-3
        )


def test_hidden_mid_is_layer_k(small):
    """hidden_mid == running scan state after contrastive_layer layers; check
    it differs from both input and final hidden (i.e. the hook is mid-stack)."""
    cfg, params = small
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 6, cfg.hidden_size))
    out = llama.llama_forward(params, cfg, x)
    mid, last = np.asarray(out["hidden_mid"]), np.asarray(out["last_hidden"])
    assert np.abs(mid - np.asarray(x)).max() > 1e-3
    assert np.abs(mid - last).max() > 1e-3
    # equals an unrolled application of the first k layers
    from mla_tpu.ops import rope as rope_ops

    cos, sin = rope_ops.rope_tables(cfg.head_dim, cfg.max_position_embeddings, cfg.rope_theta)
    h = x
    for i in range(cfg.contrastive_layer):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        h, _ = llama._layer_fn(
            lp, h, None, cfg, jnp.asarray(cos), jnp.asarray(sin),
            jnp.arange(x.shape[1]), None, 0, False,
        )
    np.testing.assert_allclose(mid, np.asarray(h), atol=1e-4)


def test_gqa_shapes():
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, max_position_embeddings=32,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    params = llama.llama_init(jax.random.PRNGKey(5), cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 32))
    out = llama.llama_forward(params, cfg, x)
    assert out["logits"].shape == (2, 5, 64)
    cache = llama.init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    assert cache["k"].shape == (2, 2, 2, 16, 8)


def test_remat_same_result(small):
    cfg, params = small
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 6, cfg.hidden_size))
    a = llama.llama_forward(params, cfg, x, remat=False)["logits"]
    b = llama.llama_forward(params, cfg, x, remat=True)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_causal_lm_loss_ignore_index():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[-100, -100, 2, 3]])
    loss = llama.causal_lm_loss(logits, labels)
    # uniform logits -> loss = log(8) over the 2 supervised positions
    assert float(loss) == pytest.approx(np.log(8), abs=1e-5)


def test_matches_hf_llama(small):
    """Golden parity against transformers' LlamaForCausalLM on CPU."""
    torch = pytest.importorskip("torch")
    hf = pytest.importorskip("transformers")
    cfg, params = small

    config = hf.LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)  # pin global-RNG-dependent init
    model = hf.LlamaForCausalLM(config)
    model.eval()

    # copy our params into the HF model (transpose linear weights)
    sd = model.state_dict()
    p = jax.tree_util.tree_map(np.asarray, params)
    new_sd = {}
    new_sd["model.embed_tokens.weight"] = torch.tensor(p["embed"]["table"])
    for i in range(cfg.num_layers):
        lp = p["layers"]
        new_sd[f"model.layers.{i}.self_attn.q_proj.weight"] = torch.tensor(lp["attn"]["q"]["w"][i].T)
        new_sd[f"model.layers.{i}.self_attn.k_proj.weight"] = torch.tensor(lp["attn"]["k"]["w"][i].T)
        new_sd[f"model.layers.{i}.self_attn.v_proj.weight"] = torch.tensor(lp["attn"]["v"]["w"][i].T)
        new_sd[f"model.layers.{i}.self_attn.o_proj.weight"] = torch.tensor(lp["attn"]["o"]["w"][i].T)
        new_sd[f"model.layers.{i}.mlp.gate_proj.weight"] = torch.tensor(lp["mlp"]["gate"]["w"][i].T)
        new_sd[f"model.layers.{i}.mlp.up_proj.weight"] = torch.tensor(lp["mlp"]["up"]["w"][i].T)
        new_sd[f"model.layers.{i}.mlp.down_proj.weight"] = torch.tensor(lp["mlp"]["down"]["w"][i].T)
        new_sd[f"model.layers.{i}.input_layernorm.weight"] = torch.tensor(lp["input_ln"]["scale"][i])
        new_sd[f"model.layers.{i}.post_attention_layernorm.weight"] = torch.tensor(lp["post_ln"]["scale"][i])
    new_sd["model.norm.weight"] = torch.tensor(p["final_ln"]["scale"])
    new_sd["lm_head.weight"] = torch.tensor(p["lm_head"]["w"].T)
    missing, unexpected = model.load_state_dict(new_sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing

    ids = np.array([[3, 17, 42, 9, 88, 5]])
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()

    embeds = llama.embed_tokens(params, jnp.asarray(ids))
    got = np.asarray(llama.llama_forward(params, cfg, embeds)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_cache_read_only_decode_matches_write_path():
    """The serving suffix mode (attend over [cached prefix | in-flight]
    without writing the cache) is numerically identical to the
    write-then-attend path, and really does leave the cache untouched."""
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=3,
        num_heads=4, num_kv_heads=2, max_position_embeddings=64,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    params = llama.llama_init(jax.random.PRNGKey(0), cfg)
    P, S, CM = 7, 5, 16
    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, P, 32))
    suffix = jax.random.normal(jax.random.PRNGKey(2), (2, S, 32))

    cache = llama.init_kv_cache(cfg, 2, CM, dtype=jnp.float32)
    mask_p = (jnp.arange(CM) < P)[None, :].repeat(2, axis=0)
    out_p = llama.llama_forward(
        params, cfg, prefix, kv_cache=cache, cache_len=0, key_mask=mask_p,
        compute_logits=False, scan_unroll=cfg.num_layers,
    )
    kv = out_p["kv_cache"]
    mask_s = (jnp.arange(CM) < P + S)[None, :].repeat(2, axis=0)

    out_w = llama.llama_forward(
        params, cfg, suffix, kv_cache=kv, cache_len=P, key_mask=mask_s,
        compute_logits=False, scan_unroll=cfg.num_layers,
    )
    out_r = llama.llama_forward(
        params, cfg, suffix, kv_cache=kv, cache_len=P, key_mask=mask_s,
        compute_logits=False, scan_unroll=cfg.num_layers, cache_read_only=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["last_hidden"]), np.asarray(out_w["last_hidden"]),
        atol=1e-5, rtol=1e-5,
    )
    # cache is returned untouched (same contents as the prefill cache)
    np.testing.assert_array_equal(np.asarray(out_r["kv_cache"]["k"]), np.asarray(kv["k"]))

    # padded IN-FLIGHT positions mask identically in both paths: declare the
    # last suffix token invalid via the key mask and compare hidden states at
    # the still-valid positions
    mask_pad = mask_s & (jnp.arange(CM) != P + S - 1)[None, :]
    out_w2 = llama.llama_forward(
        params, cfg, suffix, kv_cache=kv, cache_len=P, key_mask=mask_pad,
        compute_logits=False, scan_unroll=cfg.num_layers,
    )
    out_r2 = llama.llama_forward(
        params, cfg, suffix, kv_cache=kv, cache_len=P, key_mask=mask_pad,
        compute_logits=False, scan_unroll=cfg.num_layers, cache_read_only=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_r2["last_hidden"]),
        np.asarray(out_w2["last_hidden"]),
        atol=1e-5, rtol=1e-5,
    )
    # and the mask is actually load-bearing: the query AT the masked position
    # (the only one that causally attends to that key) changes vs all-valid
    assert np.abs(
        np.asarray(out_r2["last_hidden"][:, -1]) - np.asarray(out_r["last_hidden"][:, -1])
    ).max() > 1e-4
