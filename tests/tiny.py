"""Tiny-but-complete MLA model config + synthetic batch for tests.

Shapes are scaled down (168px images -> 16 tokens, 64-point clouds -> 16
tokens, 64-d LLM) but every architectural element of the full model is
present, so tests exercise the real composed graph."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.models import generation as gen_mod
from mla_tpu.models import llama as llama_mod
from mla_tpu.models import point_tokenizer as pt_mod
from mla_tpu.models import prismatic
from mla_tpu.models import vision_tokenizer as vt_mod

VOCAB = 32064


def tiny_config(
    use_diff=True,
    use_pointcloud=True,
    use_tactile=False,
    use_contrastive=True,
    use_generation=False,
    use_roi=False,
    class_dropout_prob=0.0,
):
    D = 64
    llama_cfg = llama_mod.LlamaConfig(
        vocab_size=VOCAB, hidden_size=D, intermediate_size=128, num_layers=4,
        num_heads=4, num_kv_heads=4, max_position_embeddings=256,
        contrastive_layer=2, compute_dtype=jnp.float32,
    )
    vision_cfg = vt_mod.VisionTokenizerConfig(
        image_size=168, patch_stride=14, conv_stride=3, hidden_dim=32, num_heads=4
    )
    # stage dims (24, 48) are divisible by 6 as PosE_Geo requires
    point_cfg = pt_mod.PointTokenizerConfig(
        input_points=64, num_stages=2, embed_dim=12, k_neighbors=8,
        lga_blocks=(2, 1), dim_expansion=(2, 2), out_dim=24,
    )
    gen_cfg = gen_mod.GenerationConfig(
        token_size=D,
        use_image=use_generation,
        use_pointcloud=use_generation,
        use_tactile=use_generation and use_tactile,
        image=gen_mod.ImageGenConfig(
            token_size=D, num_gen_queries=4, decoder_layers=1, decoder_heads=4,
            image_patch_size=42, num_patches=16, use_roi=use_roi,
        ),
        point=gen_mod.PointGenConfig(
            token_size=D, trans_dim=32, decoder_layers=1, decoder_heads=4,
            group_size=4, num_groups=8,
        ),
        tactile=gen_mod.TactileGenConfig(token_size=D, tactile_dim=12, decoder_layers=1),
    )
    return prismatic.MLAModelConfig(
        llama=llama_cfg, vision=vision_cfg, point=point_cfg, gen=gen_cfg,
        use_diff=use_diff, use_pointcloud=use_pointcloud, use_tactile=use_tactile,
        use_contrastive=use_contrastive, use_generation=use_generation,
        use_roi=use_roi, class_dropout_prob=class_dropout_prob,
        image_hidden_dim=32, point_token_dim=24,
    )


def tiny_batch(cfg, B=2, L=16, seed=0, training=True):
    """Synthetic batch with the training token layout:
    [BOS, prompt..., 29871, BOD, EOD, action ids x7, EOS, pad...]."""
    rng = np.random.default_rng(seed)
    ids = np.full((B, L), 32000, dtype=np.int32)  # pad id
    n_real = L - 2
    for b in range(B):
        ids[b, 0] = 1
        ids[b, 1 : n_real - 10] = rng.integers(100, 20000, n_real - 11)
        ids[b, n_real - 10] = 29871
        ids[b, n_real - 9] = 32001
        ids[b, n_real - 8] = 32002
        ids[b, n_real - 7 : n_real] = rng.integers(31744, 32000, 7)
        ids[b, n_real] = 2  # EOS
    attn = ids != 32000
    labels = np.where(attn, ids, -100).astype(np.int32)
    labels[:, : n_real - 7] = -100
    # training splice tag: last EOS (reference tag_0=2); inference: last 29871
    splice = np.full((B,), n_real if training else n_real - 10, dtype=np.int32)

    img = rng.normal(size=(B, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    mask = np.ones((B, 1, cfg.vision.image_size, cfg.vision.image_size), np.float32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(attn),
        "labels": jnp.asarray(labels),
        "splice_idx": jnp.asarray(splice),
        "images": {"front_image": jnp.asarray(np.concatenate([img, mask], axis=1))},
        "proprio": jnp.asarray(rng.normal(size=(B, 1, cfg.action_dim)).astype(np.float32)),
        "actions": jnp.asarray(
            rng.uniform(-1, 1, size=(B, cfg.action_horizon, cfg.action_dim)).astype(np.float32)
        ),
    }
    if cfg.use_pointcloud:
        # points roughly in the rlbench workspace so some project validly
        batch["point_cloud"] = jnp.asarray(
            rng.uniform([-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(B, cfg.point.input_points, 3)).astype(np.float32)
        )
    if cfg.use_tactile:
        batch["tactile"] = jnp.asarray(
            rng.normal(size=(B, cfg.tactile_dim * cfg.n_arms)).astype(np.float32)
        )
        batch["gripper_xyz"] = jnp.asarray(
            rng.uniform([0.0, -0.2, 0.9], [0.4, 0.2, 1.3], size=(B, 3 * cfg.n_arms)).astype(np.float32)
        )
    if cfg.use_generation:
        if cfg.gen.use_image:
            batch["next_images"] = jnp.asarray(
                rng.normal(size=(B, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
            )
        if cfg.gen.use_pointcloud:
            batch["next_point_cloud"] = jnp.asarray(
                rng.normal(size=(B, cfg.point.input_points, 3)).astype(np.float32)
            )
        if cfg.gen.use_tactile:
            batch["next_tactile"] = jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32))
    return batch


def tiny_model(cfg, seed=0):
    return prismatic.mla_model_init(jax.random.PRNGKey(seed), cfg)
