"""Visualization utility, text generation, profiling helpers."""

import numpy as np
import pytest

from tiny import tiny_config, tiny_model


def test_visualization_outputs(tmp_path):
    from mla_tpu.utils.visualize import save_generation_visualization

    B, P, ps = 1, 16, 42
    gen_outs = {
        "image_generation": np.random.default_rng(0).normal(size=(B, P, 3 * ps * ps)).astype(np.float32),
        "pointcloud_coord_generation": np.zeros((B, 32, 3), np.float32),
        "tactile_generation": np.zeros((B, 12), np.float32),
    }
    next_images = np.zeros((B, 3, 168, 168), np.float32)
    next_pc = np.zeros((B, 64, 3), np.float32)
    save_generation_visualization(gen_outs, next_images, next_pc, tmp_path, step=3)
    assert (tmp_path / "step000003_img0.png").exists()
    assert (tmp_path / "step000003_pc.npz").exists()
    assert (tmp_path / "step000003_tactile.npy").exists()


def test_generate_text():
    import jax

    from mla_tpu.models import mla as mla_mod
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    cfg = tiny_config()
    params, state = tiny_model(cfg)
    stats = {"d": {"action": {"q01": [-1] * 7, "q99": [1] * 7},
                   "proprio": {"q01": [-1] * 7, "q99": [1] * 7}}}
    policy = mla_mod.MLAPolicy(params, state, cfg, tokenizer=SimpleTokenizer(), norm_stats=stats)
    rng = np.random.default_rng(0)
    img = np.concatenate([
        rng.normal(size=(3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32),
        np.ones((1, cfg.vision.image_size, cfg.vision.image_size), np.float32),
    ])
    pc = rng.uniform(-0.3, 0.7, size=(cfg.point.input_points, 3)).astype(np.float32)
    text = policy.generate_text(img, pc, "what is on the table?", max_new_tokens=4)
    assert isinstance(text, str)


def test_step_timer():
    from mla_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop()
    s = t.summary()
    assert set(s) == {"step_time_p50", "step_time_p90", "step_time_mean"}
    assert s["step_time_p50"] >= 0


def test_sampled_decode_runs():
    import jax
    import jax.numpy as jnp

    from mla_tpu.models import llama as llama_mod
    from mla_tpu.models import mla as mla_mod

    cfg = tiny_config()
    params, state = tiny_model(cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(0), (1, 8, cfg.token_size))
    kv, logits = mla_mod.prefill(params, cfg, prefix, 24)
    toks, probs = mla_mod.greedy_decode_actions(
        params, cfg, kv, 8, logits, 4, temperature=1.0, top_k=5, key=jax.random.PRNGKey(1)
    )
    assert toks.shape == (1, 4)
    greedy, gprobs = mla_mod.greedy_decode_actions(params, cfg, kv, 8, logits, 4)
    assert greedy.shape == (1, 4)
    # confidences are valid probabilities and, for greedy, the max softmax
    assert gprobs.shape == (1, 4)
    assert ((gprobs > 0) & (gprobs <= 1)).all()


def test_enable_persistent_compile_cache_survives_early_jax_import(tmp_path, monkeypatch):
    """env setdefault is dead in-process (the axon .pth imports jax at
    interpreter startup) — the helper must take effect via jax.config.update
    and export the resolved dir for subprocesses; an exported env var wins
    over the caller's default (sweep drivers isolate child cache dirs)."""
    import os

    import jax

    from mla_tpu.utils.compile_cache import enable_persistent_compile_cache

    old_dir = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    old_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.delenv("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", raising=False)
        monkeypatch.delenv("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", raising=False)
        got = enable_persistent_compile_cache(str(tmp_path), min_compile_seconds=2.0)
        assert got == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0
        assert os.environ["JAX_COMPILATION_CACHE_DIR"] == str(tmp_path)
        from jax._src import compilation_cache as cc

        assert cc.is_persistent_cache_enabled()
        # exported env overrides the caller's default
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "override"))
        assert enable_persistent_compile_cache(str(tmp_path)) == str(tmp_path / "override")
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_bytes)
        if old_dir:
            os.environ["JAX_COMPILATION_CACHE_DIR"] = old_dir
