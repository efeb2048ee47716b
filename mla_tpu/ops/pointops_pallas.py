"""Pallas TPU kernel for farthest-point sampling.

FPS is the one truly sequential op in the point tokenizer (SURVEY.md
section 7.3: "Sequential FPS ... is a dependency chain; a Pallas
implementation is needed to keep the front-end off the critical path").
The jnp fallback (ops/pointops.furthest_point_sample) runs the loop as
~npoint XLA ops with per-iteration dispatch/fusion overhead; this kernel
runs the WHOLE loop inside one Mosaic program with the point cloud resident
in VMEM (coordinates laid out [3, N] so the distance update is three
full-lane VPU ops).

The start index arrives as a scalar-prefetch operand, supporting both the
deterministic (start=0, bit-matching the fallback and the host C++ op) and
reference-style random starts (Point_PN.py:10).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, xyz_ref, out_ref, *, npoint: int, n: int):
    x = xyz_ref[0, 0, :].astype(jnp.float32)  # [N]
    y = xyz_ref[0, 1, :].astype(jnp.float32)
    z = xyz_ref[0, 2, :].astype(jnp.float32)
    b = pl.program_id(0)
    start = start_ref[b]

    iota_np = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)[0]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def body(i, carry):
        dist, far, idxs = carry
        idxs = jnp.where(iota_np == i, far, idxs)
        # gather the centroid coords via a masked reduction (no dynamic
        # scalar indexing needed)
        sel = (iota_n == far).astype(jnp.float32)
        cx = jnp.sum(x * sel)
        cy = jnp.sum(y * sel)
        cz = jnp.sum(z * sel)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        dist = jnp.minimum(dist, d)
        far = jnp.argmax(dist).astype(jnp.int32)
        return dist, far, idxs

    dist0 = jnp.full((n,), 1e10, jnp.float32)
    idxs0 = jnp.zeros((npoint,), jnp.int32)
    _, _, idxs = jax.lax.fori_loop(0, npoint, body, (dist0, start, idxs0))
    out_ref[0, 0, :] = idxs


def fps_pallas(
    xyz: jnp.ndarray,
    npoint: int,
    *,
    start: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """xyz [B, N, 3] -> indices [B, npoint] int32. `start` [B] int32 start
    indices (defaults to zeros = deterministic mode)."""
    B, N, _ = xyz.shape
    if start is None:
        start = jnp.zeros((B,), jnp.int32)
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # [B, 3, N]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # output is [B, 1, npoint] with (1, 1, npoint) blocks: the sublane dim
    # must equal the array dim (TPU tiling), which a flat [B, npoint] with
    # (1, npoint) blocks violates for B > 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, N), lambda b, *_: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b, *_: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n=N),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        interpret=interpret,
    )(start.astype(jnp.int32), xyz_t)
    return out[:, 0, :]
