from mla_tpu.conf.datasets import DATASET_REGISTRY, DatasetConfig, get_dataset_config
from mla_tpu.conf.models import MODEL_REGISTRY, get_model_config
from mla_tpu.conf.vla import VLA_REGISTRY, VLATrainConfig, get_vla_config

__all__ = [
    "MODEL_REGISTRY",
    "get_model_config",
    "VLA_REGISTRY",
    "VLATrainConfig",
    "get_vla_config",
    "DATASET_REGISTRY",
    "DatasetConfig",
    "get_dataset_config",
]
