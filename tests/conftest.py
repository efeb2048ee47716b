"""Test harness config: force CPU backend with 8 virtual devices so
multi-chip sharding paths (Mesh/pjit) are exercised without TPU hardware.
Must run before anything imports jax."""

import os
import sys

# force CPU even if the ambient env points at a TPU platform. The axon TPU
# plugin registers at INTERPRETER STARTUP (site .pth): with
# PALLAS_AXON_TPU_GEN unset it registers its default TPU backend and a later
# jax.devices() blocks polling the (possibly down) tunnel even under
# JAX_PLATFORMS=cpu; with the var set-but-EMPTY the registration fails fast
# and cleanly. So set "" rather than pop — subprocesses spawned by tests
# (golden drivers, train smokes) inherit the kill-switch at their startup.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_TPU_GEN"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# repo root importable without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests exercise the fp32-exact library default; importing bench.py (which
# defaults the PUBLISHED serving config MLA_PREFILL_SCORES=bf16) inside a
# test must not flip numerics for anything else in this process.
os.environ["MLA_PREFILL_SCORES"] = "fp32"
# same contract for the serving XLA options (latency-hiding scheduler is
# TPU-only; the CPU test suite must compile stock programs)
os.environ["MLA_XLA_OPTIONS"] = ""

# persistent compilation cache: re-runs skip XLA compiles. The env vars are
# kept ONLY for subprocess tests (golden drivers, distributed children) —
# in THIS process jax was already imported at interpreter startup by the
# axon plugin's .pth, so env-derived config defaults are frozen and the
# setdefaults are dead; enable_persistent_compile_cache below does the real
# in-process enablement via jax.config.update (utils/compile_cache.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mla_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mla_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(
    "/tmp/mla_tpu_jax_cache", min_compile_seconds=0.5, min_entry_size_bytes=0
)
