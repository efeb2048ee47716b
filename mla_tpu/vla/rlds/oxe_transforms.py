"""Back-compat shim — the per-dataset OXE standardization layer moved to
`mla_tpu.vla.rlds.oxe.transforms` (full per-dataset action assembly,
proprio synthesis, and instruction decoding; reference
vla/datasets/rlds/oxe/transforms.py)."""

from mla_tpu.vla.rlds.oxe.transforms import (  # noqa: F401
    FRAME_FILTERS,
    OXE_STANDARDIZATION_TRANSFORMS,
    get_standardization_transform,
    identity_transform,
)
