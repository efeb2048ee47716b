"""Flash-attention kernel vs the einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.ops import attention
from mla_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("S", [256, 384])
def test_forward_matches_reference(S):
    B, H, hd = 2, 2, 64
    q, k, v = _rand((B, H, S, hd), 0), _rand((B, H, S, hd), 1), _rand((B, H, S, hd), 2)
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    want = np.asarray(attention.sdpa_reference(q, k, v, causal=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_forward_with_padding_mask():
    B, H, S, hd = 1, 2, 256, 64
    q, k, v = _rand((B, H, S, hd), 3), _rand((B, H, S, hd), 4), _rand((B, H, S, hd), 5)
    valid = 200
    mask = (jnp.arange(S) < valid)[None, :].repeat(B, 0)
    got = np.asarray(flash_attention(q, k, v, mask=mask))
    want = np.asarray(attention.sdpa_reference(q, k, v, mask=mask[:, None, None, :], causal=True))
    np.testing.assert_allclose(got[:, :, :valid], want[:, :, :valid], atol=2e-5, rtol=1e-4)


def test_unpadded_sequence_padding_path():
    """S not a multiple of the block: wrapper pads and slices back."""
    B, H, S, hd = 1, 1, 200, 64
    q, k, v = _rand((B, H, S, hd), 6), _rand((B, H, S, hd), 7), _rand((B, H, S, hd), 8)
    got = np.asarray(flash_attention(q, k, v))
    want = np.asarray(attention.sdpa_reference(q, k, v, causal=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("bq,bk", [(64, 128), (128, 64), (128, 96)])
def test_asymmetric_blocks_match_reference(bq, bk):
    """block_q != block_k exercises the partially-overlapping diagonal key
    block (ceil-div coverage) and the lcm padding (nk must cover every key)
    — a floor/max-pad bug here returns silent zeros, not an error."""
    B, H, S, hd = 1, 2, 256, 64
    q, k, v = _rand((B, H, S, hd), 20), _rand((B, H, S, hd), 21), _rand((B, H, S, hd), 22)
    got = np.asarray(flash_attention(q, k, v, block_q=bq, block_k=bk))
    want = np.asarray(attention.sdpa_reference(q, k, v, causal=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    mask = (jnp.arange(S) < 230)[None, :]

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask=mask, block_q=bq, block_k=bk)
        return jnp.sum(jnp.where(mask[:, None, :, None], o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = attention.sdpa_reference(q, k, v, mask=mask[:, None, None, :], causal=True)
        return jnp.sum(jnp.where(mask[:, None, :, None], o, 0.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=f"d{name}"
        )


def test_gradients_match_reference():
    B, H, S, hd = 1, 2, 256, 64
    q, k, v = _rand((B, H, S, hd), 9), _rand((B, H, S, hd), 10), _rand((B, H, S, hd), 11)
    mask = (jnp.arange(S) < 230)[None, :]

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask=mask)
        return jnp.sum(jnp.where(mask[:, None, :, None], o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = attention.sdpa_reference(q, k, v, mask=mask[:, None, None, :], causal=True)
        return jnp.sum(jnp.where(mask[:, None, :, None], o, 0.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=f"d{name}"
        )


def test_bf16_inputs():
    B, H, S, hd = 1, 1, 256, 64
    q = _rand((B, H, S, hd), 12).astype(jnp.bfloat16)
    k = _rand((B, H, S, hd), 13).astype(jnp.bfloat16)
    v = _rand((B, H, S, hd), 14).astype(jnp.bfloat16)
    got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    want = attention.sdpa_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_kernel_check_script_smoke():
    """scripts/kernel_check.py (the bench's on-chip kernel revalidation
    probe) must stay importable and its checks pass in interpret mode;
    the real revalidation is its TPU run attached to the bench JSON."""
    import importlib
    import sys

    sys.path.insert(0, "scripts")
    kc = importlib.import_module("kernel_check")
    r = kc.check_flash(16, 32, S=48)
    assert r["ok"], r
    r = kc.check_flash(32, 16, S=48)
    assert r["ok"], r
    r = kc.check_fps()
    assert r["ok"], r
