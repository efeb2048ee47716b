"""Encoder-free 3D point tokenizer (Point-PN).

Parity target: reference models/mla/pointcloud/backbone/{pointvit.py,
Point_PN.py} — the Any2Point/Point-PN parametric encoder: raw-point embed
(1x1 conv + BN + ReLU), two FPS+kNN stages with trigonometric positional
geometry aggregation (PosE_Geo) and residual 1x1-conv blocks, max-pool
neighborhood reduction, then Linear 384->768. Output: 256 patch tokens and
their 3D centers (consumed by the camera-projection contrastive pairing).

TPU-first redesign:
  * channel-last throughout; every 1x1 Conv1d/Conv2d is a matmul (MXU).
  * FPS/kNN are the jit-able kernels in ops/pointops.py (the reference's
    CUDA pointops reborn); deterministic FPS start for reproducibility,
    optional random start via `key` to match the reference's torch.randint
    seeding (Point_PN.py:10).
  * BatchNorm is functional with explicit running-stats state threading.

Hyperparameters pinned to the reference defaults (Point_PN.py:302):
input_points=1024, 2 stages (1024->512->256 groups), embed_dim=96,
dim_expansion [2,2] -> 384 channels out, k_neighbors=81, alpha=1000,
beta=100, LGA_block=[2,1], 'scan' normalization.

The reference's cls_token / pos_embed / norm / post_fpsknn are created but
unused in its forward (pointvit.py:36-40, Point_PN.py:281); we keep the
parameters for checkpoint compatibility and skip the compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu import nn
from mla_tpu.ops import pointops


@dataclass(frozen=True)
class PointTokenizerConfig:
    input_points: int = 1024
    num_stages: int = 2
    embed_dim: int = 96
    k_neighbors: int = 81
    alpha: float = 1000.0
    beta: float = 100.0
    lga_blocks: Tuple[int, ...] = (2, 1)
    dim_expansion: Tuple[int, ...] = (2, 2)
    out_dim: int = 768  # LLM-facing token width (before 768->4096 projector)

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        dims, d = [], self.embed_dim
        for e in self.dim_expansion[: self.num_stages]:
            d *= e
            dims.append(d)
        return tuple(dims)  # (192, 384)

    @property
    def encoder_out_dim(self) -> int:
        return self.stage_dims[-1]  # 384

    @property
    def num_tokens(self) -> int:
        return self.input_points // (2**self.num_stages)  # 256


def _conv_bn_init(key, in_dim: int, out_dim: int, bias: bool = True):
    p = {"conv": nn.linear_init(key, in_dim, out_dim, bias=bias, w_init="torch")}
    bn_p, bn_s = nn.batch_norm_init(out_dim)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _linear2_init(key, dim: int):
    """Linear2Layer (Point_PN.py:188-219), standard variant: 1x1 conv dim->dim/2
    + BN + ReLU, 1x1 conv dim/2->dim + BN, residual, ReLU."""
    k1, k2 = jax.random.split(key)
    p1, s1 = _conv_bn_init(k1, dim, dim // 2)
    p2, s2 = _conv_bn_init(k2, dim // 2, dim)
    return {"net1": p1, "net2": p2}, {"net1": s1, "net2": s2}


def point_tokenizer_init(key, cfg: PointTokenizerConfig = PointTokenizerConfig()):
    """Returns (params, state)."""
    # one key per LGA block + raw_embed + proj + cls_token. jax.random.split
    # is prefix-stable, so sizing the split from the config fixes the
    # fixed-8 overflow/collision for larger lga_blocks while keeping the
    # default config's draws identical (proj/cls stay at indices 6/7 there).
    n_blocks = sum(cfg.lga_blocks[: cfg.num_stages])
    proj_idx = max(n_blocks + 1, 6)
    keys = jax.random.split(key, proj_idx + 2)
    raw_p, raw_s = _conv_bn_init(keys[0], 3, cfg.embed_dim, bias=False)
    stages_p, stages_s = [], []
    kidx = 1
    for si in range(cfg.num_stages):
        dim = cfg.stage_dims[si]
        blocks_p, blocks_s = [], []
        for bi in range(cfg.lga_blocks[si]):
            bp, bs = _linear2_init(keys[kidx], dim)
            kidx += 1
            blocks_p.append(bp)
            blocks_s.append(bs)
        stages_p.append({"blocks": blocks_p})
        stages_s.append({"blocks": blocks_s})
    params = {
        "raw_embed": raw_p,
        "stages": stages_p,
        "proj": nn.linear_init(keys[proj_idx], cfg.encoder_out_dim, cfg.out_dim, w_init="xavier"),
        # checkpoint-compat, unused in forward (pointvit.py:36-40)
        "cls_token": nn.normal_init(keys[proj_idx + 1], (1, 1, cfg.out_dim), 0.02),
        "pos_embed": jnp.zeros((1, cfg.num_tokens + 1, cfg.out_dim)),
        "norm": nn.layer_norm_init(cfg.out_dim),
    }
    state = {"raw_embed": raw_s, "stages": stages_s}
    return params, state


def _pose_geo(knn_xyz: jnp.ndarray, out_dim: int, alpha: float, beta: float) -> jnp.ndarray:
    """Trigonometric positional geometry encoding (Point_PN.py:223-249).
    knn_xyz: [B,G,K,3] normalized offsets -> [B,G,K,out_dim] with channel
    layout (coord-major x (sin block, cos block)) matching the reference
    permute/view."""
    feat_dim = out_dim // 6  # out_dim // (in_dim * 2), in_dim=3
    feat_range = jnp.arange(feat_dim, dtype=jnp.float32)
    dim_embed = jnp.power(alpha, feat_range / feat_dim)  # [fd]
    div = beta * knn_xyz[..., None] / dim_embed  # [B,G,K,3,fd]
    pos = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)  # [B,G,K,3,2fd]
    B, G, K = knn_xyz.shape[:3]
    return pos.reshape(B, G, K, out_dim)


def _conv_bn_relu(p, s, x, training):
    y = nn.linear(p["conv"], x)
    y, new_bn = nn.batch_norm(p["bn"], s["bn"], y, training)
    return jax.nn.relu(y), {"bn": new_bn}


def _linear2(p, s, x, training):
    y = nn.linear(p["net1"]["conv"], x)
    y, ns1 = nn.batch_norm(p["net1"]["bn"], s["net1"]["bn"], y, training)
    y = jax.nn.relu(y)
    y = nn.linear(p["net2"]["conv"], y)
    y, ns2 = nn.batch_norm(p["net2"]["bn"], s["net2"]["bn"], y, training)
    out = jax.nn.relu(y + x)
    return out, {"net1": {"bn": ns1}, "net2": {"bn": ns2}}


def point_tokenizer(
    params: Dict[str, Any],
    state: Dict[str, Any],
    pointcloud: jnp.ndarray,
    cfg: PointTokenizerConfig = PointTokenizerConfig(),
    *,
    training: bool = False,
    fps_key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Any]]:
    """pointcloud [B, N, 3] -> (tokens [B, 256, 768], centers [B, 256, 3],
    new_state). Features are initialized to the coordinates themselves
    (pointvit.py:63-64)."""
    xyz = pointcloud.astype(jnp.float32)
    x = xyz  # [B,N,3] feature = coords

    x, raw_s = _conv_bn_relu(params["raw_embed"], state["raw_embed"], x, training)

    new_stages_s = []
    group_num = cfg.input_points
    for si in range(cfg.num_stages):
        group_num = group_num // 2
        sk = None if fps_key is None else jax.random.fold_in(fps_key, si)
        lc_xyz, lc_x, knn_xyz, knn_x, _, _ = pointops.fps_knn(
            xyz, x, group_num, cfg.k_neighbors, key=sk, deterministic=fps_key is None
        )
        # 'scan' normalization (Point_PN.py:125-134): center on lc_xyz,
        # divide by per-(B, coord, G) max-abs over neighbors
        offsets = knn_xyz - lc_xyz[:, :, None, :]  # [B,G,K,3]
        max_vals = jnp.max(jnp.abs(offsets), axis=2, keepdims=True)
        offsets = offsets / jnp.maximum(max_vals, 1e-6)

        # feature expansion: [neighbor feats ; center feats] (Point_PN.py:139)
        B, G, K, C = knn_x.shape
        expanded = jnp.concatenate(
            [knn_x, jnp.broadcast_to(lc_x[:, :, None, :], (B, G, K, C))], axis=-1
        )  # [B,G,K,2C]
        out_dim = cfg.stage_dims[si]
        w = expanded + _pose_geo(offsets, out_dim, cfg.alpha, cfg.beta).astype(expanded.dtype)

        block_states = []
        sp = params["stages"][si]
        ss = state["stages"][si]
        for bi in range(cfg.lga_blocks[si]):
            w, bs = _linear2(sp["blocks"][bi], ss["blocks"][bi], w, training)
            block_states.append(bs)
        new_stages_s.append({"blocks": block_states})

        x = jnp.max(w, axis=2)  # pool over K (Point_PN.py:162-169)
        xyz = lc_xyz

    tokens = nn.linear(params["proj"], x)  # [B,256,768]
    new_state = {"raw_embed": raw_s, "stages": new_stages_s}
    return tokens, xyz, new_state
