"""Training-time visualization of generation-head outputs.

Parity target: reference models/mla/generation/visualize.py (invoked from
the training forward with a hardcoded absolute path, prismatic.py:1129-1135)
— here a callable utility (never wired into the jitted step): dumps the
predicted next-image vs ground truth side by side (PNG) and point clouds
(NPZ + optional PNG scatter), un-doing the CLIP normalization.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _denorm_to_uint8(chw: np.ndarray) -> np.ndarray:
    hwc = np.transpose(np.asarray(chw, np.float32), (1, 2, 0))
    hwc = hwc * CLIP_STD + CLIP_MEAN
    return np.clip(hwc * 255.0, 0, 255).astype(np.uint8)


def save_generation_visualization(
    generation_outputs: Dict,
    next_images: Optional[np.ndarray],
    next_point_cloud: Optional[np.ndarray],
    out_dir,
    *,
    step: int = 0,
    image_patch_size: int = 42,
    max_samples: int = 2,
) -> None:
    """Write pred-vs-gt panels for whichever heads produced outputs."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if next_images is not None and "image_generation" in generation_outputs:
        from mla_tpu.models.generation import patches_to_images

        pred = np.asarray(patches_to_images(
            np.asarray(generation_outputs["image_generation"], np.float32), image_patch_size
        ))
        gt = np.asarray(next_images, np.float32)
        for b in range(min(pred.shape[0], max_samples)):
            panel = np.concatenate([_denorm_to_uint8(pred[b]), _denorm_to_uint8(gt[b])], axis=1)
            Image.fromarray(panel).save(out_dir / f"step{step:06d}_img{b}.png")

    if next_point_cloud is not None and "pointcloud_coord_generation" in generation_outputs:
        pred_pc = np.asarray(generation_outputs["pointcloud_coord_generation"], np.float32)
        gt_pc = np.asarray(next_point_cloud, np.float32)
        np.savez(
            out_dir / f"step{step:06d}_pc.npz",
            pred=pred_pc[:max_samples],
            gt=gt_pc[:max_samples],
        )

    if "tactile_generation" in generation_outputs:
        np.save(
            out_dir / f"step{step:06d}_tactile.npy",
            np.asarray(generation_outputs["tactile_generation"], np.float32)[:max_samples],
        )
