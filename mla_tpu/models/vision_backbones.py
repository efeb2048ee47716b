"""Legacy ViT vision backbones (CLIP / SigLIP / DINOv2 / fused DinoSigLIP).

Parity target: reference models/backbones/vision/{base_vision.py:1-207,
dinosiglip_vit.py:1-164} — TIMM ViT wrappers used by the prismatic
`load()` / `load_openvla()` initialization paths and the legacy
`predict_action_batch` (they are NOT in the encoder-free MLA forward;
SURVEY.md section 2.4 'Legacy vision backbones').

This is a functional ViT with the timm parameterization so timm/OpenVLA
checkpoints convert 1:1 (convert_timm_vit): conv patch embed, optional
cls/register tokens, learned position embeddings, pre-norm blocks, and
feature extraction from the SECOND-TO-LAST block (the prismatic convention,
base_vision.py get_intermediate_layers) with prefix tokens dropped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu import nn


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    use_cls_token: bool = True
    num_reg_tokens: int = 0          # DINOv2 register tokens
    use_quick_gelu: bool = False     # CLIP's x*sigmoid(1.702x)
    no_embed_class: bool = False     # timm: pos_embed covers PATCHES only,
                                     # added before prefix tokens (dinov2-reg4)
    use_layerscale: bool = False     # timm LayerScale (dinov2 init_values=1e-5)
    pre_norm: bool = False           # timm norm_pre before block 0 (OpenAI CLIP)
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        # timm's stride-p conv FLOORS (384 // 14 = 27, last 6 px unread)
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid**2

    @property
    def num_prefix_tokens(self) -> int:
        return int(self.use_cls_token) + self.num_reg_tokens


def _dino_cfg(image_size: int) -> ViTConfig:
    # timm vit_large_patch14_reg4_dinov2: reg4, no_embed_class, LayerScale
    return ViTConfig(image_size=image_size, width=1024, depth=24, num_heads=16,
                     num_reg_tokens=4, no_embed_class=True, use_layerscale=True)


VIT_CONFIGS: Dict[str, ViTConfig] = {
    # prismatic backbone ids (models/materialize.py VISION_BACKBONES)
    "clip-vit-l": ViTConfig(width=1024, depth=24, num_heads=16, use_quick_gelu=True, pre_norm=True),
    "clip-vit-l-336px": ViTConfig(image_size=336, width=1024, depth=24, num_heads=16,
                                  use_quick_gelu=True, pre_norm=True),
    "siglip-vit-so400m": ViTConfig(width=1152, depth=27, num_heads=16, mlp_ratio=3.7362, use_cls_token=False),
    "siglip-vit-so400m-384px": ViTConfig(image_size=384, width=1152, depth=27, num_heads=16,
                                         mlp_ratio=3.7362, use_cls_token=False),
    "dinov2-vit-l": _dino_cfg(224),
    # fused-partner resolutions: the reference builds BOTH towers at the
    # fused backbone's default_image_size (dinosiglip_vit.py asserts equal
    # num_patches) — 384/14→27²=729 matches siglip-384, 336/14→24²=576
    # matches clip-336
    "dinov2-vit-l-384px": _dino_cfg(384),
    "dinov2-vit-l-336px": _dino_cfg(336),
    "in1k-vit-l": ViTConfig(width=1024, depth=24, num_heads=16, patch_size=16),
}

# fused backbones: tuple of constituent ids, features concatenated in TUPLE
# order (reference always concatenates dino first, dinosiglip_vit.py:150)
FUSED_BACKBONES: Dict[str, Tuple[str, str]] = {
    "dinosiglip-vit-so-224px": ("dinov2-vit-l", "siglip-vit-so400m"),
    "dinosiglip-vit-so-384px": ("dinov2-vit-l-384px", "siglip-vit-so400m-384px"),
    "dinoclip-vit-l-336px": ("dinov2-vit-l-336px", "clip-vit-l-336px"),
}


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block_init(key, cfg: ViTConfig) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(cfg.width * cfg.mlp_ratio)
    p = {
        "norm1": nn.layer_norm_init(cfg.width),
        "attn": nn.mha_init(k1, cfg.width, cfg.num_heads, qkv_bias=True),
        "norm2": nn.layer_norm_init(cfg.width),
        "fc1": nn.linear_init(k2, cfg.width, hidden, w_init="xavier"),
        "fc2": nn.linear_init(k3, hidden, cfg.width, w_init="xavier"),
    }
    if cfg.use_layerscale:
        # timm LayerScale: per-channel residual gains, init_values=1e-5
        p["ls1"] = jnp.full((cfg.width,), 1e-5, jnp.float32)
        p["ls2"] = jnp.full((cfg.width,), 1e-5, jnp.float32)
    return p


def vit_init(key, cfg: ViTConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.depth + 4)
    in_dim = 3 * cfg.patch_size**2
    n_tokens = cfg.num_patches + cfg.num_prefix_tokens
    n_pos = cfg.num_patches if cfg.no_embed_class else n_tokens
    params: Dict[str, Any] = {
        "patch_embed": nn.linear_init(ks[0], in_dim, cfg.width, w_init="torch"),
        "pos_embed": nn.normal_init(ks[1], (1, n_pos, cfg.width), 0.02),
        "blocks": [_block_init(ks[3 + i], cfg) for i in range(cfg.depth)],
        "norm": nn.layer_norm_init(cfg.width),
    }
    if cfg.pre_norm:
        params["norm_pre"] = nn.layer_norm_init(cfg.width)
    if cfg.use_cls_token:
        params["cls_token"] = nn.normal_init(ks[2], (1, 1, cfg.width), 0.02)
    if cfg.num_reg_tokens:
        params["reg_token"] = nn.normal_init(
            jax.random.fold_in(ks[2], 1), (1, cfg.num_reg_tokens, cfg.width), 0.02
        )
    return params


def _patchify(images: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    B = images.shape[0]
    g, p = cfg.grid, cfg.patch_size
    # timm's stride-p conv floors: crop trailing pixels when p doesn't
    # divide the input (384 % 14 = 6 for siglip-so400m-384px)
    images = images[:, :, : g * p, : g * p]
    x = images.reshape(B, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, g * g, 3 * p * p)


def vit_forward(
    params: Dict[str, Any],
    cfg: ViTConfig,
    images: jnp.ndarray,  # [B, 3, H, W] normalized
    *,
    feature_layer: int = -2,
) -> jnp.ndarray:
    """Returns patch features [B, num_patches, width] from block
    `feature_layer` (default second-to-last, prismatic convention), prefix
    tokens dropped."""
    B = images.shape[0]
    x = nn.linear(params["patch_embed"], _patchify(images, cfg))
    if cfg.no_embed_class:
        # timm no_embed_class (dinov2-reg4): positions cover PATCHES only and
        # are added BEFORE the prefix tokens, which get none
        x = x + params["pos_embed"].astype(x.dtype)
    prefix = []
    if cfg.use_cls_token:
        prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, cfg.width)))
    if cfg.num_reg_tokens:
        prefix.append(jnp.broadcast_to(params["reg_token"], (B, cfg.num_reg_tokens, cfg.width)))
    if prefix:
        x = jnp.concatenate(prefix + [x], axis=1)
    if not cfg.no_embed_class:
        x = x + params["pos_embed"].astype(x.dtype)
    if cfg.pre_norm:
        x = nn.layer_norm(params["norm_pre"], x, cfg.ln_eps)

    act = _quick_gelu if cfg.use_quick_gelu else nn.gelu_exact
    n_blocks = cfg.depth + feature_layer + 1 if feature_layer < 0 else feature_layer + 1
    for bp in params["blocks"][:n_blocks]:
        h = nn.layer_norm(bp["norm1"], x, cfg.ln_eps)
        a = nn.mha(bp["attn"], h, cfg.num_heads)
        x = x + (a * bp["ls1"].astype(a.dtype) if "ls1" in bp else a)
        h = nn.layer_norm(bp["norm2"], x, cfg.ln_eps)
        m = nn.linear(bp["fc2"], act(nn.linear(bp["fc1"], h)))
        x = x + (m * bp["ls2"].astype(m.dtype) if "ls2" in bp else m)
    return x[:, cfg.num_prefix_tokens :]


def fused_vit_forward(params: Dict[str, Dict], cfgs: Dict[str, ViTConfig], images: Dict[str, jnp.ndarray]):
    """DinoSigLIP-style fusion: run each constituent on its own normalized
    view, concatenate features on the channel dim. The reference always puts
    the dino features FIRST (dinosiglip_vit.py / dinoclip_vit.py
    torch.cat([dino, partner], dim=2)) — sorted-key order would swap the
    halves for dinoclip."""
    names = sorted(params, key=lambda n: (0 if "dino" in n else 1, n))
    feats = [vit_forward(params[name], cfgs[name], images[name]) for name in names]
    return jnp.concatenate(feats, axis=-1)


# --------------------------------------------------------------------------- #
# timm / OpenVLA checkpoint conversion
# --------------------------------------------------------------------------- #


def convert_timm_vit(sd: Dict[str, Any], cfg: ViTConfig, prefix: str = "") -> Dict[str, Any]:
    """timm VisionTransformer state dict -> vit params.

    Key layout: patch_embed.proj.{weight [W,3,p,p], bias}, cls_token,
    (reg_token,) pos_embed, blocks.N.{norm1, attn.qkv, attn.proj, norm2,
    mlp.fc1, mlp.fc2}, norm."""
    from mla_tpu.models.convert import _ln, _lin, _t

    def k(s):
        return f"{prefix}{s}"

    pw = _t(sd[k("patch_embed.proj.weight")])  # [W, 3, p, p]
    W = pw.shape[0]
    params: Dict[str, Any] = {
        "patch_embed": {"w": pw.reshape(W, -1).T, "b": _t(sd[k("patch_embed.proj.bias")])},
        "pos_embed": _t(sd[k("pos_embed")]),
        "norm": _ln(sd, k("norm")),
        "blocks": [],
    }
    if cfg.use_cls_token and k("cls_token") in sd:
        params["cls_token"] = _t(sd[k("cls_token")])
    if cfg.num_reg_tokens and k("reg_token") in sd:
        params["reg_token"] = _t(sd[k("reg_token")])
    if cfg.pre_norm and k("norm_pre.weight") in sd:
        params["norm_pre"] = _ln(sd, k("norm_pre"))
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        bp = {
            "norm1": _ln(sd, k(f"{b}.norm1")),
            "attn": {
                "qkv": _lin(sd, k(f"{b}.attn.qkv")),
                "proj": _lin(sd, k(f"{b}.attn.proj")),
            },
            "norm2": _ln(sd, k(f"{b}.norm2")),
            "fc1": _lin(sd, k(f"{b}.mlp.fc1")),
            "fc2": _lin(sd, k(f"{b}.mlp.fc2")),
        }
        # DINOv2 LayerScale residual gains — dropping them would silently
        # zero out nothing but mis-scale every residual branch
        if k(f"{b}.ls1.gamma") in sd:
            bp["ls1"] = _t(sd[k(f"{b}.ls1.gamma")])
            bp["ls2"] = _t(sd[k(f"{b}.ls2.gamma")])
        params["blocks"].append(bp)
    return params


# --- image transforms (base_vision.py resize strategies) --------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
SIGLIP_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
SIGLIP_STD = np.array([0.5, 0.5, 0.5], np.float32)


def vit_image_transform(
    image: np.ndarray, size: int, strategy: str = "resize-naive",
    mean: np.ndarray = CLIP_MEAN, std: np.ndarray = CLIP_STD,
) -> np.ndarray:
    """'resize-naive' (squash) or 'letterbox' (pad-to-square with the mean
    color, base_vision.py LetterboxPad) -> [3, size, size] normalized."""
    from PIL import Image as PILImage

    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    img = PILImage.fromarray(image)
    if strategy == "letterbox":
        w, h = img.size
        m = max(w, h)
        fill = tuple(int(c * 255) for c in mean)
        canvas = PILImage.new("RGB", (m, m), fill)
        canvas.paste(img, ((m - w) // 2, (m - h) // 2))
        img = canvas
    img = img.resize((size, size), PILImage.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return ((arr - mean) / std).transpose(2, 0, 1)
