"""Model-architecture registry.

Parity target: reference conf/models.py ModelConfig registry (the prismatic
model zoo) — here each entry materializes a complete MLAModelConfig. The
flagship deployment config is `mla-7b` (Llama-2-7B backbone,
models/backbones/llm/llama2.py:24-51); smaller presets exist for
compile-checks and CI.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Dict

import jax.numpy as jnp

from mla_tpu.models import generation as gen_mod
from mla_tpu.models import llama as llama_mod
from mla_tpu.models import point_tokenizer as pt_mod
from mla_tpu.models import prismatic
from mla_tpu.models import vision_tokenizer as vt_mod


def _gen_cfg(token_size: int, use_generation: bool, use_tactile: bool, use_roi: bool):
    return gen_mod.GenerationConfig(
        token_size=token_size,
        use_image=use_generation,
        use_pointcloud=use_generation,
        use_tactile=use_generation and use_tactile,
        image=gen_mod.ImageGenConfig(token_size=token_size, use_roi=use_roi),
        point=gen_mod.PointGenConfig(token_size=token_size),
        tactile=gen_mod.TactileGenConfig(token_size=token_size),
    )


def mla_7b(
    use_diff: bool = True,
    use_pointcloud: bool = True,
    use_tactile: bool = False,
    use_contrastive: bool = True,
    use_generation: bool = False,
    use_roi: bool = False,
    camera_name: str = "rlbench_front",
    param_dtype=jnp.bfloat16,
    **kw,
) -> prismatic.MLAModelConfig:
    """Flagship: Llama-2-7B + 672px vision tokenizer + 1024-pt Point-PN."""
    llama_cfg = replace(llama_mod.LLAMA2_7B, param_dtype=param_dtype)
    return prismatic.MLAModelConfig(
        llama=llama_cfg,
        vision=vt_mod.VisionTokenizerConfig(),
        point=pt_mod.PointTokenizerConfig(),
        gen=_gen_cfg(4096, use_generation, use_tactile, use_roi),
        use_diff=use_diff, use_pointcloud=use_pointcloud, use_tactile=use_tactile,
        use_contrastive=use_contrastive, use_generation=use_generation,
        use_roi=use_roi, camera_name=camera_name, **kw,
    )


def mla_2b(**kw) -> prismatic.MLAModelConfig:
    """Reduced-depth variant (8 decoder layers, same widths/front-ends) for
    single-chip smoke runs and compile checks."""
    cfg = mla_7b(**kw)
    return replace(cfg, llama=replace(cfg.llama, num_layers=8))


def mla_medium(**kw) -> prismatic.MLAModelConfig:
    """~0.45B decoder (hidden 2048 x 6 layers, head_dim 128) with the full
    production front-ends — the middle rung of the sampler-qualification
    scale ladder (tiny -> small -> medium -> 2b), sized to stay trainable
    on a single host for the briefly-trained fidelity sweeps."""
    cfg = mla_7b(**kw)
    llama_cfg = replace(
        cfg.llama, hidden_size=2048, intermediate_size=5632, num_layers=6,
        num_heads=16, num_kv_heads=16, contrastive_layer=3,
    )
    gen = _gen_cfg(2048, cfg.use_generation, cfg.use_tactile, cfg.use_roi)
    return replace(cfg, llama=llama_cfg, gen=gen)


def mla_small(**kw) -> prismatic.MLAModelConfig:
    """~120M decoder with PRODUCTION-SHAPE hot loops (head_dim 128, full
    672px/1024-pt front-ends, real sequence lengths) — single-chip
    TRAINING smoke incl. optimizer states; exercises the Pallas flash
    kernels fwd+bwd at real tile shapes."""
    cfg = mla_7b(**kw)
    llama_cfg = replace(
        cfg.llama, hidden_size=1024, intermediate_size=2816, num_layers=4,
        num_heads=8, num_kv_heads=8, contrastive_layer=2,
    )
    gen = _gen_cfg(1024, cfg.use_generation, cfg.use_tactile, cfg.use_roi)
    return replace(cfg, llama=llama_cfg, gen=gen)


def mla_tiny(**kw) -> prismatic.MLAModelConfig:
    """CI-size: full architecture at toy dims (see tests/tiny.py analogue)."""
    D = 64
    llama_cfg = llama_mod.LlamaConfig(
        vocab_size=32064, hidden_size=D, intermediate_size=128, num_layers=4,
        num_heads=4, num_kv_heads=4, max_position_embeddings=256,
        contrastive_layer=2, compute_dtype=jnp.float32,
    )
    use_generation = kw.pop("use_generation", False)
    use_tactile = kw.pop("use_tactile", False)
    use_roi = kw.pop("use_roi", False)
    gen = gen_mod.GenerationConfig(
        token_size=D, use_image=use_generation, use_pointcloud=use_generation,
        use_tactile=use_generation and use_tactile,
        image=gen_mod.ImageGenConfig(
            token_size=D, num_gen_queries=4, decoder_layers=1, decoder_heads=4,
            num_patches=16, use_roi=use_roi,
        ),
        point=gen_mod.PointGenConfig(token_size=D, trans_dim=32, decoder_layers=1,
                                     decoder_heads=4, group_size=4, num_groups=8),
        tactile=gen_mod.TactileGenConfig(token_size=D, decoder_layers=1),
    )
    return prismatic.MLAModelConfig(
        llama=llama_cfg,
        vision=vt_mod.VisionTokenizerConfig(image_size=168, hidden_dim=32, num_heads=4),
        point=pt_mod.PointTokenizerConfig(
            input_points=64, embed_dim=12, k_neighbors=8, lga_blocks=(2, 1),
            dim_expansion=(2, 2), out_dim=24,
        ),
        gen=gen,
        use_generation=use_generation, use_tactile=use_tactile, use_roi=use_roi,
        image_hidden_dim=32, point_token_dim=24, **kw,
    )


def mla_golden(
    use_diff: bool = True,
    use_pointcloud: bool = False,
    use_tactile: bool = False,
    use_contrastive: bool = False,
    use_generation: bool = False,
    use_roi: bool = False,
    camera_name: str = "rlbench_front",
    num_layers: int = 4,
    contrastive_layer: int = 2,
    hidden_size: int = 512,
    num_heads: int = 8,
    intermediate_size: int = 1376,
    **kw,
) -> prismatic.MLAModelConfig:
    """Reduced-LLM config matching tests/ref_harness.build_reference_mla
    (default hidden 512 x 4 layers, full-width 1024-d vision tokenizer):
    the end-to-end golden-parity checkpoint (tests/test_golden_e2e.py).
    bf16 params/compute — the reference path hard-casts diffusion inputs to
    bf16 (models/vlm/prismatic.py:873-881), so parity mode is bf16
    end-to-end. The training golden uses num_layers=9 / contrastive_layer=8
    because the reference hardcodes the contrastive hook at
    hidden_states[8] (modeling_llama.py:1274); the full-DEPTH e2e golden
    uses num_layers=32 / hidden_size=256 (production depth, narrow width)."""
    llama_cfg = llama_mod.LlamaConfig(
        vocab_size=32064, hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_layers=num_layers, num_heads=num_heads, num_kv_heads=num_heads,
        max_position_embeddings=2048, contrastive_layer=contrastive_layer,
        param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
    )
    return prismatic.MLAModelConfig(
        llama=llama_cfg,
        vision=vt_mod.VisionTokenizerConfig(),
        point=pt_mod.PointTokenizerConfig(),
        gen=_gen_cfg(hidden_size, use_generation, use_tactile, use_roi),
        use_diff=use_diff, use_pointcloud=use_pointcloud, use_tactile=use_tactile,
        use_contrastive=use_contrastive, use_generation=use_generation,
        use_roi=use_roi, camera_name=camera_name, **kw,
    )


def mla_mistral(
    use_diff: bool = True,
    use_pointcloud: bool = True,
    use_tactile: bool = False,
    use_contrastive: bool = True,
    use_generation: bool = False,
    use_roi: bool = False,
    camera_name: str = "rlbench_front",
    param_dtype=jnp.bfloat16,
    **kw,
) -> prismatic.MLAModelConfig:
    """Mistral-7B backbone (GQA, 8 KV heads) — the reference's
    MistralLLMBackbone (models/backbones/llm/mistral.py) composed with the
    same multisensory front-end."""
    llama_cfg = replace(llama_mod.MISTRAL_7B, param_dtype=param_dtype)
    # pop so an explicit llm_family override via **kw doesn't collide
    return prismatic.MLAModelConfig(
        llm_family=kw.pop("llm_family", "llama"),
        llama=llama_cfg,
        vision=vt_mod.VisionTokenizerConfig(),
        point=pt_mod.PointTokenizerConfig(),
        gen=_gen_cfg(4096, use_generation, use_tactile, use_roi),
        use_diff=use_diff, use_pointcloud=use_pointcloud, use_tactile=use_tactile,
        use_contrastive=use_contrastive, use_generation=use_generation,
        use_roi=use_roi, camera_name=camera_name, **kw,
    )


def mla_phi(
    use_diff: bool = True,
    use_pointcloud: bool = True,
    use_tactile: bool = False,
    use_contrastive: bool = True,
    use_generation: bool = False,
    use_roi: bool = False,
    camera_name: str = "rlbench_front",
    param_dtype=jnp.bfloat16,
    **kw,
) -> prismatic.MLAModelConfig:
    """Phi-2 backbone (parallel attn+MLP blocks, partial RoPE) — the
    reference's PhiLLMBackbone (models/backbones/llm/phi.py) composed with
    the same multisensory front-end (token_size 2560)."""
    from dataclasses import replace as _rep

    from mla_tpu.models import phi as phi_mod

    phi_cfg = _rep(phi_mod.PHI_2, param_dtype=param_dtype)
    D = phi_cfg.hidden_size
    return prismatic.MLAModelConfig(
        llm_family=kw.pop("llm_family", "phi"),
        llama=phi_cfg,
        vision=vt_mod.VisionTokenizerConfig(),
        point=pt_mod.PointTokenizerConfig(),
        gen=_gen_cfg(D, use_generation, use_tactile, use_roi),
        use_diff=use_diff, use_pointcloud=use_pointcloud, use_tactile=use_tactile,
        use_contrastive=use_contrastive, use_generation=use_generation,
        use_roi=use_roi, camera_name=camera_name, **kw,
    )


MODEL_REGISTRY: Dict[str, Callable[..., prismatic.MLAModelConfig]] = {
    "mla-7b": mla_7b,
    "prism-dinosiglip-224px+7b": mla_7b,  # the reference's base_vlm id
    "mla-2b": mla_2b,
    "mla-medium": mla_medium,
    "mla-small": mla_small,
    "mla-tiny": mla_tiny,
    "mla-golden": mla_golden,
    "mla-mistral": mla_mistral,
    "mla-phi": mla_phi,
}


def get_model_config(model_id: str, **overrides) -> prismatic.MLAModelConfig:
    if model_id not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model `{model_id}`. Available: {list(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[model_id](**overrides)
