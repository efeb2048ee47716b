"""Open-X-Embodiment dataset matrix: configs, standardization transforms,
named mixtures, and kwargs materialization (reference vla/datasets/rlds/oxe/)."""

from mla_tpu.vla.rlds.oxe.configs import (
    OXE_DATASET_CONFIGS,
    POINTCLOUD_KEYS,
    TACTILE_KEYS,
    ActionEncoding,
    StateEncoding,
)
from mla_tpu.vla.rlds.oxe.materialize import (
    get_oxe_dataset_kwargs_and_weights,
    make_oxe_dataset_kwargs,
)
from mla_tpu.vla.rlds.oxe.mixtures import OXE_NAMED_MIXTURES
from mla_tpu.vla.rlds.oxe.transforms import (
    OXE_STANDARDIZATION_TRANSFORMS,
    get_standardization_transform,
)

__all__ = [
    "OXE_DATASET_CONFIGS",
    "OXE_NAMED_MIXTURES",
    "OXE_STANDARDIZATION_TRANSFORMS",
    "POINTCLOUD_KEYS",
    "TACTILE_KEYS",
    "ActionEncoding",
    "StateEncoding",
    "get_oxe_dataset_kwargs_and_weights",
    "get_standardization_transform",
    "make_oxe_dataset_kwargs",
]
