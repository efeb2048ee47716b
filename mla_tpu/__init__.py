"""MLA-TPU: a TPU-native JAX/XLA/Pallas framework with the capabilities of MLA.

MLA (arXiv 2509.26642) is a Multisensory Language-Action model for robotic
manipulation: an encoder-free multimodal front-end (vision / point-cloud /
tactile tokenizers) feeding a modified Llama-2 backbone with an in-LLM
diffusion action head, positional-correspondence contrastive alignment, and
future multisensory generation heads.

This package is a ground-up TPU-first re-design (reference: /root/reference,
PyTorch/CUDA). Compute paths are jax/XLA/pallas; parallelism is GSPMD over
`jax.sharding.Mesh`; hot kernels (flash attention, FPS/kNN point ops) are
Pallas TPU kernels.

Layout (mirrors the reference's layer map, SURVEY.md section 1):
  nn.py        functional layer library (linear / norms / mlp / batchnorm)
  ops/         TPU kernels: flash attention, point ops, chamfer, projection
  models/      llama decoder, tokenizer front-ends, composed MLA model
  diffusion/   gaussian diffusion schedules + DDPM/DDIM sampling loops
  vla/         action tokenizer + data pipeline
  parallel/    mesh + sharding specs (FSDP/GSPMD analogue)
  training/    optax train state, jitted train step, metrics, checkpointing
  conf/        dataclass config registries (draccus-free)
  utils/       overwatch logging, seeding, pytree utilities
"""

__version__ = "0.1.0"


def load_vla(*args, **kwargs):
    """Lazy convenience re-export (models/load.py)."""
    from mla_tpu.models.load import load_vla as _load_vla

    return _load_vla(*args, **kwargs)


def available_models():
    from mla_tpu.conf.models import MODEL_REGISTRY

    return sorted(MODEL_REGISTRY)
