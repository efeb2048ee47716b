"""Persistent XLA compile cache enablement that actually works on this box.

Every entry point used to rely on

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ...)

before ``import jax``. That pattern is silently dead here: the axon PJRT
plugin's site ``.pth`` imports jax AT INTERPRETER STARTUP, before any user
module runs, so jax's env-derived config defaults are frozen with the
cache dir unset and the persistent cache reports "disabled/not
initialized" on every compile (diagnosed round 5 with
``JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache``: the serving host's
bucket programs were compiled remotely in 715-1058 s per process and
never written locally). It only ever *appeared* to work because bench.py
measures candidates in subprocesses — the child interpreter starts with
the parent's exported env, which IS early enough.

``jax.config.update`` works post-import unconditionally; this helper is
the one place that knows that. An exported ``JAX_COMPILATION_CACHE_DIR``
still wins over the caller's default (matching the old setdefault
semantics, and letting sweep drivers give child processes isolated cache
dirs), and the resolved dir is exported so later-spawned subprocesses
inherit it.
"""

from __future__ import annotations

import os

#: default cache dirs (CLAUDE.md): TPU programs and the CPU test suite
#: deliberately use separate dirs so suite churn never evicts or pollutes
#: the driver-critical serving-program cache.
TPU_CACHE_DIR = "/tmp/mla_tpu_jax_cache_tpu"
CPU_CACHE_DIR = "/tmp/mla_tpu_jax_cache"


def enable_persistent_compile_cache(
    default_dir: str = TPU_CACHE_DIR,
    *,
    min_compile_seconds: float = 1.0,
    min_entry_size_bytes: int = 0,
) -> str:
    """Force-enable jax's persistent compilation cache; returns the dir.

    Idempotent and cheap — call it after ``import jax`` in every entry
    point that compiles anything worth keeping. ``JAX_COMPILATION_CACHE_DIR``
    (if exported) overrides ``default_dir``; the min thresholds likewise
    honor their env overrides when present.
    """
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or default_dir
    min_secs = float(
        os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", min_compile_seconds)
    )
    min_bytes = int(
        os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", min_entry_size_bytes)
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", min_bytes)
    # subprocesses spawned from here start fresh interpreters, where env at
    # startup does work — export so they inherit the same cache
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    return path
