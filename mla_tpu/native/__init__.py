"""Native host ops: ctypes bindings over mla_tpu/csrc/pointops_host.cpp.

Builds the shared library on first use (g++ -O3 -march=native); every entry
point has a numpy fallback so the framework never hard-requires the
toolchain at runtime."""

from mla_tpu.native.pointops_host import (
    chamfer_distance_host,
    fps_host,
    grid_subsample,
    knn_host,
    native_available,
)

__all__ = [
    "grid_subsample",
    "fps_host",
    "knn_host",
    "chamfer_distance_host",
    "native_available",
]
