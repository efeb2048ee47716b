"""ctypes wrapper + build-on-demand for the C++ host point ops.

Replaces the reference's native data-loader extensions on the host side
(vla/datasets/cpp/{subsampling,pointops,chamfer_dist}; SURVEY.md section
2.9). Numpy fallbacks keep everything working without a compiler, with
IDENTICAL contracts to the native path (shapes, padding, index wrapping) —
environment-dependent behavior is a silent-corruption machine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "pointops_host.cpp"
_LIB_PATH = _SRC.parent / "libpointops_host.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

# the C++ hash grid packs signed voxel coords into 21-bit fields; beyond
# this magnitude the mask would alias far-apart voxels — fall back to numpy
_GRID_COORD_LIMIT = 1 << 20


def _build() -> bool:
    # compile to a TEMP file and os.rename (atomic): two processes racing
    # g++ to the same output path can leave a permanently corrupt .so that
    # every later process "finds" and fails to dlopen
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(_LIB_PATH.parent))
        os.close(fd)
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
            str(_SRC), "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.rename(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except Exception:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.grid_subsample.restype = ctypes.c_int
        lib.grid_subsample.argtypes = [f32p, ctypes.c_int, ctypes.c_float, i32p, ctypes.c_int]
        lib.fps.restype = None
        lib.fps.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
        lib.knn.restype = None
        lib.knn.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.chamfer.restype = ctypes.c_float
        lib.chamfer.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _as_xyz(a: np.ndarray, name: str) -> np.ndarray:
    """Enforce the (N, 3) contract the C++ side strides by — a (N, 6)
    xyz+feature cloud would be silently re-read as interleaved pseudo-points."""
    out = np.ascontiguousarray(a, np.float32)
    if out.ndim != 2 or out.shape[1] != 3:
        raise ValueError(f"{name} must be [N, 3]; got {out.shape}")
    return out


def grid_subsample(points: np.ndarray, cell: float, max_out: Optional[int] = None) -> np.ndarray:
    """Voxel-grid subsample: keep the first point per voxel. Returns indices."""
    pts = _as_xyz(points, "points")
    n = pts.shape[0]
    max_out = max_out if max_out is not None else n
    lib = _load()
    if lib is not None and n and max_out > 0:
        # the native hash key packs voxel coords into 21-bit fields; out of
        # that range it would alias distinct voxels — use the exact fallback
        gmax = float(np.abs(pts).max()) / float(cell)
        if gmax < _GRID_COORD_LIMIT - 1:
            out = np.empty(max_out, np.int32)
            cnt = lib.grid_subsample(pts, n, float(cell), out, max_out)
            return out[:cnt].copy()
    # numpy fallback: same first-point-per-voxel semantics
    grid = np.floor(pts / cell).astype(np.int64)
    _, first = np.unique(grid, axis=0, return_index=True)
    return np.sort(first)[: max(max_out, 0)].astype(np.int32)


def fps_host(points: np.ndarray, m: int, start: int = 0) -> np.ndarray:
    pts = _as_xyz(points, "points")
    n = pts.shape[0]
    start = int(start) % n  # wrap like the numpy fallback; the C++ side
    # would read out of bounds on a negative start
    lib = _load()
    if lib is not None:
        out = np.empty(m, np.int32)
        lib.fps(pts, n, m, start, out)
        return out
    # numpy fallback
    idx = np.empty(m, np.int32)
    dist = np.full(n, np.inf, np.float32)
    far = start
    for s in range(m):
        idx[s] = far
        d = ((pts - pts[far]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        far = int(dist.argmax())
    return idx


def knn_host(points: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    pts = _as_xyz(points, "points")
    qs = _as_xyz(queries, "queries")
    lib = _load()
    if lib is not None:
        out = np.empty((qs.shape[0], k), np.int32)
        lib.knn(pts, pts.shape[0], qs, qs.shape[0], k, out)
        return out
    d = ((qs[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    out = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    if out.shape[1] < k:
        # pad with the farthest neighbor like the C++ path (cpp knn) so the
        # returned shape is (q, k) with or without the compiled lib
        pad = np.repeat(out[:, -1:], k - out.shape[1], axis=1)
        out = np.concatenate([out, pad], axis=1)
    return out


def chamfer_distance_host(a: np.ndarray, b: np.ndarray) -> float:
    aa = _as_xyz(a, "a")
    bb = _as_xyz(b, "b")
    lib = _load()
    if lib is not None:
        return float(lib.chamfer(aa, aa.shape[0], bb, bb.shape[0]))
    d = np.sqrt(((aa[:, None, :] - bb[None, :, :]) ** 2).sum(-1))
    return float(d.min(1).mean() + d.min(0).mean())


def prepare_pointcloud(
    points: np.ndarray,
    target_n: int,
    *,
    cell: Optional[float] = None,
    seed: int = 0,
) -> np.ndarray:
    """Normalize a RAW sensor cloud [N, 3] to exactly `target_n` points for
    the tokenizer front-end — the deployment-side preprocessing the reference
    carries dormant native code for (vla/datasets/cpp/subsampling/):

      1. optional voxel-grid subsampling (`cell` in meters, first point per
         voxel) through the C++ hash-grid when built, numpy fallback
         otherwise — deduplicates dense sensor returns before any O(N)
         selection;
      2. exact-count adjustment: deterministic-seed random subset when over,
         resampling with replacement when under. An EMPTY input yields a
         zero cloud (a dead frame must not kill the closed-loop eval).
    """
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 3))
    if pts.shape[0] == 0:
        return np.zeros((target_n, 3), np.float32)
    if cell is not None:
        # apply the voxel pass whenever a cell is given — an exact-size dense
        # cloud with duplicate returns still deduplicates (and is re-upsampled
        # to target_n below if the pass leaves it short)
        idx = grid_subsample(pts, cell)
        if idx.shape[0] > 0:
            pts = pts[idx]
    n = pts.shape[0]
    rng = np.random.default_rng(seed)
    if n > target_n:
        idx = rng.choice(n, size=target_n, replace=False)
        idx.sort()
        pts = pts[idx]
    elif n < target_n:
        idx = rng.choice(n, size=target_n - n, replace=True)
        pts = np.concatenate([pts, pts[idx]], axis=0)
    return pts
