import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu import nn


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_linear_shapes(key):
    p = nn.linear_init(key, 4, 8)
    y = nn.linear(p, jnp.ones((2, 3, 4)))
    assert y.shape == (2, 3, 8)


def test_layer_norm_matches_torch(key):
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 5, 16)).astype(np.float32)
    p = nn.layer_norm_init(16)
    got = np.asarray(nn.layer_norm(p, jnp.asarray(x)))
    ln = torch.nn.LayerNorm(16)
    want = ln(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rms_norm_matches_llama(key):
    """LlamaRMSNorm semantics: fp32 mean-square, rsqrt, cast, scale."""
    x = np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32)
    p = nn.rms_norm_init(8)
    got = np.asarray(nn.rms_norm(p, jnp.asarray(x)))
    want = x * (1.0 / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batch_norm_train_eval(key):
    p, s = nn.batch_norm_init(4)
    x = jnp.asarray(np.random.default_rng(2).normal(2.0, 3.0, size=(32, 4)).astype(np.float32))
    y, s2 = nn.batch_norm(p, s, x, training=True)
    assert np.abs(np.asarray(y).mean()) < 1e-5
    assert np.abs(np.asarray(y).std() - 1) < 1e-2
    # running stats moved toward batch stats
    assert np.abs(np.asarray(s2["mean"]) - 0.1 * np.asarray(x.mean(0))).max() < 1e-5
    y_eval, s3 = nn.batch_norm(p, s2, x, training=False)
    assert s3 is s2


def test_batch_norm_matches_torch(key):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 6)).astype(np.float32)
    p, s = nn.batch_norm_init(6)
    got, s2 = nn.batch_norm(p, s, jnp.asarray(x), training=True)
    bn = torch.nn.BatchNorm1d(6)
    bn.train()
    want = bn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2["mean"]), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["var"]), bn.running_var.numpy(), atol=1e-4)


def test_mlp_gelu_depth2(key):
    p = nn.mlp_gelu_init(key, 1024, 4096, depth=2)
    y = nn.mlp_gelu(p, jnp.ones((2, 1024)))
    assert y.shape == (2, 4096)
    assert len(p["layers"]) == 2


def test_mha_self_and_cross(key):
    p = nn.mha_init(key, 32, 4)
    x = jax.random.normal(key, (2, 5, 32))
    kv = jax.random.normal(key, (2, 7, 32))
    assert nn.mha(p, x, 4).shape == (2, 5, 32)
    assert nn.mha(p, x, 4, kv=kv).shape == (2, 5, 32)


def test_mha_matches_torch_mha(key):
    """Our packed-qkv attention vs torch.nn.MultiheadAttention."""
    torch = pytest.importorskip("torch")
    D, H = 16, 4
    p = nn.mha_init(key, D, H)
    x = np.random.default_rng(4).normal(size=(2, 5, D)).astype(np.float32)
    got = np.asarray(nn.mha(p, jnp.asarray(x), H))

    m = torch.nn.MultiheadAttention(D, H, batch_first=True)
    m.eval()
    with torch.no_grad():
        m.in_proj_weight.copy_(torch.tensor(np.asarray(p["qkv"]["w"]).T))
        m.in_proj_bias.copy_(torch.tensor(np.asarray(p["qkv"]["b"])))
        m.out_proj.weight.copy_(torch.tensor(np.asarray(p["proj"]["w"]).T))
        m.out_proj.bias.copy_(torch.tensor(np.asarray(p["proj"]["b"])))
        want, _ = m(torch.tensor(x), torch.tensor(x), torch.tensor(x))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)
