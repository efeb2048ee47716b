"""3D->2D camera projection + camera registry.

Parity rebuild of models/mla/fuser/{camera.py,contrastive.py:5-131}: maps
point-cloud centers (world frame) to 16x16 image-patch indices on the 672px
grid, per camera. One generic jnp function parameterized by the original
image size replaces the reference's three near-identical copies.

Camera calibration constants are hardware facts copied from
models/mla/fuser/camera.py:12-52 (rlbench_front / franka_right / franka_front).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CameraParams:
    K: np.ndarray  # [3,3] intrinsics
    R: np.ndarray  # [3,3] cam->world rotation
    t: np.ndarray  # [3] cam position in world
    image_size_orig: Tuple[int, int]  # (H, W) of the raw camera frame


CAMERA_CONFIGS: Dict[str, CameraParams] = {
    "rlbench_front": CameraParams(
        K=np.array(
            [[-307.7174807, 0.0, 112.0], [0.0, -307.7174807, 112.0], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        ),
        R=np.array(
            [
                [1.19209290e-07, -4.22617942e-01, -9.06307936e-01],
                [-1.00000000e00, -5.96046448e-07, 1.49011612e-07],
                [-5.66244125e-07, 9.06307936e-01, -4.22617912e-01],
            ],
            dtype=np.float32,
        ),
        t=np.array([1.34999919e00, 3.71546562e-08, 1.57999933e00], dtype=np.float32),
        image_size_orig=(224, 224),
    ),
    "franka_right": CameraParams(
        K=np.array(
            [
                [387.414794921875, 0.0, 319.47052001953125],
                [0.0, 386.8714904785156, 241.13287353515625],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        ),
        R=np.array(
            [
                [0.91300858, 0.26157042, -0.31304353],
                [0.39730357, -0.7442472, 0.53688545],
                [-0.09254842, -0.61455433, -0.78342694],
            ],
            dtype=np.float32,
        ),
        t=np.array([0.8591219242556176, -0.5851783639922448, 0.7535876808722389], dtype=np.float32),
        image_size_orig=(480, 640),
    ),
    "franka_front": CameraParams(
        K=np.array(
            [
                [388.2638244628906, 0.0, 328.3757019042969],
                [0.0, 387.84130859375, 240.24295043945312],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        ),
        R=np.array(
            [
                [-0.01750229, 0.95018522, -0.31119403],
                [0.99984609, 0.01625676, -0.00659609],
                [-0.0012085, -0.31126158, -0.95032351],
            ],
            dtype=np.float32,
        ),
        t=np.array([0.8545415959817313, 0.5748472977587156, 1.0411478820663598], dtype=np.float32),
        image_size_orig=(720, 1280),
    ),
}


def get_camera_params(name: str) -> CameraParams:
    if name not in CAMERA_CONFIGS:
        raise ValueError(f"Unknown camera config: {name}. Available: {list(CAMERA_CONFIGS)}")
    return CAMERA_CONFIGS[name]


def project_3d_to_2d(
    xyz_3d: jnp.ndarray,
    camera: CameraParams,
    image_size_resize: Tuple[int, int] = (672, 672),
    patch_stride: int = 14,
    conv_stride: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World points [..., N, 3] -> (patch_idx [..., N, 2] int32, valid [..., N] bool).

    Math mirrors project_3d_to_2d_672_* (contrastive.py:5-131): scale K to the
    resized image, world->cam via R^T and -R^T t, pinhole projection, floor
    divide by total stride (14*3=42) to a 16x16 patch grid, validity = in
    front of camera and inside the resized frame; indices clamped in-range."""
    K = np.array(camera.K, dtype=np.float64)
    scale_x = image_size_resize[1] / camera.image_size_orig[1]
    scale_y = image_size_resize[0] / camera.image_size_orig[0]
    K_scaled = K.copy()
    K_scaled[0, 0] *= scale_x
    K_scaled[1, 1] *= scale_y
    K_scaled[0, 2] *= scale_x
    K_scaled[1, 2] *= scale_y
    R_w2c = np.array(camera.R, dtype=np.float64).T
    t_w2c = -R_w2c @ np.array(camera.t, dtype=np.float64)

    xyzf = xyz_3d.astype(jnp.float32)
    xyz_cam = xyzf @ jnp.asarray(R_w2c.T, dtype=jnp.float32) + jnp.asarray(
        t_w2c, dtype=jnp.float32
    )
    uvw = xyz_cam @ jnp.asarray(K_scaled.T, dtype=jnp.float32)
    z = uvw[..., 2:]
    xy = uvw[..., :2] / (z + 1e-6)

    total_stride = patch_stride * conv_stride
    row = jnp.floor(xy[..., 1] / total_stride).astype(jnp.int32)
    col = jnp.floor(xy[..., 0] / total_stride).astype(jnp.int32)
    patch_h = image_size_resize[0] // total_stride
    patch_w = image_size_resize[1] // total_stride

    valid = (
        (z[..., 0] > 0)
        & (xy[..., 0] >= 0)
        & (xy[..., 0] < image_size_resize[1])
        & (xy[..., 1] >= 0)
        & (xy[..., 1] < image_size_resize[0])
    )
    row = jnp.clip(row, 0, patch_h - 1)
    col = jnp.clip(col, 0, patch_w - 1)
    return jnp.stack([row, col], axis=-1), valid
