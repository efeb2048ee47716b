"""Standalone DiT action head (the legacy CogACT path).

Parity target: reference models/diffusion/{models.py DiT:192-302,
action_model.py:52-121} — a small conditional DiT that denoises action
chunks from a single LLM condition token; used by the reference's
`predict_action_batch` (model_mla.py:993-1164) and kept here for
checkpoint/API compatibility with CogACT-style models.

Blocks: x/t/z embedders -> concat [c | x_tokens] + learnable positional
embedding -> N pre-norm self-attention blocks -> final RmsNorm+Mlp head;
CFG via the doubled-batch trick (DiT.forward_with_cfg).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mla_tpu import nn
from mla_tpu.diffusion import gaussian as gd
from mla_tpu.models import embedders


@dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 7
    hidden_size: int = 384
    depth: int = 6
    num_heads: int = 4
    mlp_ratio: float = 4.0
    token_size: int = 4096           # condition width from the LLM
    future_action_window_size: int = 15
    past_action_window_size: int = 0
    class_dropout_prob: float = 0.1

    @property
    def seq_len(self) -> int:
        # +2: condition token and current-action slot (models.py:230-232)
        return self.future_action_window_size + self.past_action_window_size + 2


DIT_SIZES = {
    "DiT-S": dict(depth=6, hidden_size=384, num_heads=4),
    "DiT-B": dict(depth=12, hidden_size=768, num_heads=12),
    "DiT-L": dict(depth=24, hidden_size=1024, num_heads=16),
}


def dit_config(model_type: str = "DiT-B", **kw) -> DiTConfig:
    return DiTConfig(**{**DIT_SIZES[model_type], **kw})


def _block_init(key, dim: int, mlp_ratio: float):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": nn.mha_init(k1, dim, 1, qkv_bias=True),
        "fc1": nn.linear_init(k2, dim, int(dim * mlp_ratio), w_init="xavier"),
        "fc2": nn.linear_init(k3, int(dim * mlp_ratio), dim, w_init="xavier"),
    }


def dit_init(key, cfg: DiTConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    D = cfg.hidden_size
    params = {
        "x_embedder": embedders.action_embedder_init(ks[0], cfg.in_channels, D),
        "t_embedder": embedders.timestep_embedder_init(ks[1], D),
        "z_proj": nn.linear_init(ks[2], cfg.token_size, D, w_init="normal"),
        "pos_embed": nn.normal_init(ks[3], (cfg.seq_len, D), D**-0.5),
        "blocks": [_block_init(k, D, cfg.mlp_ratio) for k in jax.random.split(ks[4], cfg.depth)],
        "final_layer": embedders.final_layer_init(ks[5], D, cfg.in_channels),
        # CFG training substitutes this for dropped conditions: normal-init
        # when dropout is on (reference ActionModel initialize_weights
        # :257-258), zeros otherwise (a plain buffer)
        "uncondition": (
            nn.normal_init(jax.random.fold_in(key, 7), (1, cfg.token_size), 0.02)
            if cfg.class_dropout_prob > 0
            else jnp.zeros((1, cfg.token_size))
        ),
    }
    return params


def dit_forward(params: Dict[str, Any], cfg: DiTConfig, x, t, z, *,
                training: bool = False, key=None):
    """x [B, T, in_ch] noised actions; t [B]; z [B, 1, token_size] condition.
    Returns eps prediction [B, T, in_ch] (reference DiT.forward :269-286).
    During training with class_dropout_prob > 0 (and a PRNG key), whole
    samples' conditions are replaced by the `uncondition` vector (reference
    LabelEmbedder.token_drop, models.py:79-95) — CFG inference evaluates the
    model on exactly that uncondition input, so it must be trained."""
    B = x.shape[0]
    if training and cfg.class_dropout_prob > 0 and key is not None:
        z = embedders.label_embedder(
            {"uncondition": params["uncondition"]}, z,
            dropout_prob=cfg.class_dropout_prob, training=True, key=key,
        )
    xe = embedders.action_embedder(params["x_embedder"], x)  # [B,T,D]
    te = embedders.timestep_embedder(params["t_embedder"], t)  # [B,D]
    ze = nn.linear(params["z_proj"], z)  # [B,1,D]
    c = te[:, None, :] + ze  # [B,1,D]
    h = jnp.concatenate([c, xe], axis=1) + params["pos_embed"][None]
    for bp in params["blocks"]:
        hn = nn.layer_norm_noaffine(h)
        h = h + nn.mha(bp["attn"], hn, cfg.num_heads)
        hn = nn.layer_norm_noaffine(h)
        h = h + nn.linear(bp["fc2"], nn.gelu_tanh(nn.linear(bp["fc1"], hn)))
    out = embedders.final_layer(params["final_layer"], h)
    return out[:, 1:, :]


def dit_forward_with_cfg(params: Dict[str, Any], cfg: DiTConfig, x, t, z, cfg_scale: float):
    """Doubled-batch classifier-free guidance (reference :288-302): the first
    half of the batch carries the condition, the second the uncondition."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    eps = dit_forward(params, cfg, combined, t, z)
    cond, uncond = jnp.split(eps, 2, axis=0)
    guided = uncond + cfg_scale * (cond - uncond)
    return jnp.concatenate([guided, guided], axis=0)


def dit_loss(params: Dict[str, Any], cfg: DiTConfig, sched: gd.Schedule, x, z, rng):
    """Training loss (reference ActionModel.loss :98-113), including the
    class_dropout_prob condition dropout that trains the uncondition branch
    CFG inference relies on."""
    k1, k2, k3 = jax.random.split(rng, 3)
    noise = jax.random.normal(k1, x.shape, jnp.float32)
    t = jax.random.randint(k2, (x.shape[0],), 0, sched.num_timesteps)
    x_t = gd.q_sample(sched, x.astype(jnp.float32), t, noise)
    eps = dit_forward(params, cfg, x_t, t, z, training=True, key=k3)
    return jnp.mean((eps - noise) ** 2)
