from mla_tpu.models import (
    contrastive,
    embedders,
    generation,
    llama,
    mla,
    point_tokenizer,
    prismatic,
    vision_tokenizer,
)

__all__ = [
    "contrastive",
    "embedders",
    "generation",
    "llama",
    "mla",
    "point_tokenizer",
    "prismatic",
    "vision_tokenizer",
]
