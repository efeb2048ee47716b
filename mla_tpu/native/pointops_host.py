"""ctypes wrapper + build-on-demand for the C++ host point ops.

Replaces the reference's native data-loader extensions on the host side
(vla/datasets/cpp/{subsampling,pointops,chamfer_dist}; SURVEY.md section
2.9). Numpy fallbacks keep everything working without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "pointops_host.cpp"
_LIB_PATH = _SRC.parent / "libpointops_host.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
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


def grid_subsample(points: np.ndarray, cell: float, max_out: Optional[int] = None) -> np.ndarray:
    """Voxel-grid subsample: keep the first point per voxel. Returns indices."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    max_out = max_out or n
    lib = _load()
    if lib is not None:
        out = np.empty(max_out, np.int32)
        cnt = lib.grid_subsample(pts, n, float(cell), out, max_out)
        return out[:cnt].copy()
    # numpy fallback: same first-point-per-voxel semantics
    grid = np.floor(pts / cell).astype(np.int64)
    _, first = np.unique(grid, axis=0, return_index=True)
    return np.sort(first)[:max_out].astype(np.int32)


def fps_host(points: np.ndarray, m: int, start: int = 0) -> np.ndarray:
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
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
    pts = np.ascontiguousarray(points, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty((qs.shape[0], k), np.int32)
        lib.knn(pts, pts.shape[0], qs, qs.shape[0], k, out)
        return out
    d = ((qs[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k].astype(np.int32)


def chamfer_distance_host(a: np.ndarray, b: np.ndarray) -> float:
    aa = np.ascontiguousarray(a, np.float32)
    bb = np.ascontiguousarray(b, np.float32)
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
         resampling with replacement when under.
    """
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 3))
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
