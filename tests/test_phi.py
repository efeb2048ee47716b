"""Phi-2 decoder: shapes, causality, KV cache, HF parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.models import phi


@pytest.fixture(scope="module")
def small():
    cfg = phi.PHI_TEST
    params = phi.phi_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(small):
    cfg, params = small
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.hidden_size))
    out = phi.phi_forward(params, cfg, x)
    assert out["logits"].shape == (2, 6, cfg.vocab_size)
    assert out["hidden_mid"].shape == (2, 6, cfg.hidden_size)


def test_kv_cache_matches_full(small):
    cfg, params = small
    S = 8
    x = jax.random.normal(jax.random.PRNGKey(2), (1, S, cfg.hidden_size))
    full = phi.phi_forward(params, cfg, x)["logits"]
    cache = phi.init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    km = (jnp.arange(16) < S - 1)[None]
    pre = phi.phi_forward(params, cfg, x[:, : S - 1], kv_cache=cache, key_mask=km)
    np.testing.assert_allclose(np.asarray(pre["logits"][0, -1]), np.asarray(full[0, S - 2]), atol=3e-3)
    km2 = (jnp.arange(16) < S)[None]
    step = phi.phi_forward(params, cfg, x[:, S - 1 :], kv_cache=pre["kv_cache"], cache_len=S - 1, key_mask=km2)
    np.testing.assert_allclose(np.asarray(step["logits"][0, 0]), np.asarray(full[0, S - 1]), atol=3e-3)


def test_matches_hf_phi(small):
    torch = pytest.importorskip("torch")
    hf = pytest.importorskip("transformers")
    cfg, _ = small
    config = hf.PhiConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        partial_rotary_factor=cfg.partial_rotary_factor,
        layer_norm_eps=cfg.ln_eps,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)  # pin global-RNG-dependent init
    model = hf.PhiForCausalLM(config)
    model.eval()
    params = phi.convert_hf_phi(model.state_dict(), cfg.num_layers)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    ids = np.array([[3, 17, 42, 9, 88]])
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    emb = jnp.take(params["embed"]["table"], jnp.asarray(ids), axis=0)
    got = np.asarray(phi.phi_forward(params, cfg, emb)["logits"])
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_phi_composed_model_forward():
    """Full composed MLA model with the phi decoder family."""
    import dataclasses

    from mla_tpu.models import prismatic
    from mla_tpu.vla.dummy import synthetic_batch
    from tiny import tiny_config

    base = tiny_config(use_contrastive=False)
    phi_cfg = phi.PhiConfig(
        vocab_size=32064, hidden_size=64, intermediate_size=128, num_layers=4,
        num_heads=4, contrastive_layer=2, compute_dtype=jnp.float32,
        partial_rotary_factor=0.5,
    )
    cfg = dataclasses.replace(base, llm_family="phi", llama=phi_cfg)
    params, state = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(cfg, B=1, L=16))
    batch["x"] = jnp.zeros((1, cfg.action_horizon, cfg.action_dim))
    batch["t"] = jnp.array([5])
    out, _ = prismatic.vlm_forward(params, state, cfg, batch, training=False, use_diff=True)
    assert out["noise_pred"].shape == (1, 16, 7)
    assert np.isfinite(np.asarray(out["noise_pred"], np.float32)).all()


def test_phi_and_mistral_registry_presets():
    """`mla-phi` / `mla-mistral` are selectable composed-model presets
    (reference models/backbones/llm/{mistral,phi}.py + model registry)."""
    from mla_tpu.conf.models import get_model_config

    cfg_phi = get_model_config("mla-phi")
    assert cfg_phi.llm_family == "phi"
    assert cfg_phi.token_size == 2560
    assert cfg_phi.gen.token_size == 2560

    cfg_mis = get_model_config("mla-mistral")
    assert cfg_mis.llm_family == "llama"
    assert cfg_mis.llama.num_kv_heads == 8
    assert cfg_mis.llama.intermediate_size == 14336


def test_convert_phi_with_prefix_and_vocab_pad(small):
    """convert_phi: composed-checkpoint prefix + mean-padded vocab resize."""
    import torch

    from mla_tpu.models.convert import convert_phi

    cfg, params_ref = small
    # synthesize an HF-style state dict with the composed `llm.` prefix
    hf = pytest.importorskip("transformers")
    config = hf.PhiConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_heads,
        partial_rotary_factor=cfg.partial_rotary_factor,
    )
    torch.manual_seed(0)
    model = hf.PhiForCausalLM(config)
    sd = {f"llm.{k}": v for k, v in model.state_dict().items()}
    out = convert_phi(sd, cfg.num_layers, prefix="llm.", target_vocab=cfg.vocab_size + 8)
    assert out["embed"]["table"].shape[0] == cfg.vocab_size + 8
    assert out["lm_head"]["w"].shape[1] == cfg.vocab_size + 8
    # padded rows are the mean of the original embedding rows
    np.testing.assert_allclose(
        out["embed"]["table"][-1], out["embed"]["table"][: cfg.vocab_size].mean(0), rtol=1e-5
    )
