"""Overwatch: rank-gated logging for multi-host TPU jobs.

TPU-native analogue of the reference's util/overwatch/overwatch.py:47-147.
The reference wraps `accelerate.PartialState` (torch.distributed); here rank
identity comes from `jax.process_index()` / `jax.process_count()` — there is
no separate process-group init because jax.distributed handles it.

Usage:
    overwatch = initialize_overwatch(__name__)
    overwatch.info("...")                 # INFO on host 0, ERROR-only elsewhere
    if overwatch.is_rank_zero(): ...
    @overwatch.rank_zero_only
    def save(): ...
"""

from __future__ import annotations

import logging
import sys
from contextlib import contextmanager
from functools import wraps
from typing import Any, Callable, Optional

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s >> %(message)s"
_DATEFMT = "%m/%d %H:%M:%S"

_CONFIGURED = False


def _configure_root() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    root = logging.getLogger("mla_tpu")
    root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


class Overwatch:
    """Host-0-gated logger: INFO+ on host 0, ERROR+ on other hosts."""

    def __init__(self, name: str) -> None:
        _configure_root()
        self.logger = logging.getLogger(f"mla_tpu.{name}" if not name.startswith("mla_tpu") else name)
        # rank gating is resolved LAZILY on first use: jax.process_index()
        # initializes the backend, and modules create Overwatch instances at
        # import time — importing mla_tpu must never force backend selection
        # (it deadlocks under a down TPU tunnel before the caller can pin CPU)
        self._level_set = False

    def _ensure_level(self) -> None:
        if not self._level_set:
            self.logger.setLevel(logging.INFO if self.is_rank_zero() else logging.ERROR)
            self._level_set = True

    # --- rank identity ------------------------------------------------------
    def rank(self) -> int:
        return _process_index()

    def world_size(self) -> int:
        return _process_count()

    def is_rank_zero(self) -> bool:
        return _process_index() == 0

    def rank_zero_only(self, fn: Callable) -> Callable:
        @wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Optional[Any]:
            if self.is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper

    @contextmanager
    def local_zero_first(self):
        """Barrier context: host 0 runs the body first, others after.

        Uses `multihost_utils.sync_global_devices` when running multi-host;
        a no-op barrier single-host.
        """
        if self.world_size() > 1:
            from jax.experimental import multihost_utils

            if not self.is_rank_zero():
                multihost_utils.sync_global_devices("local_zero_first:enter")
            yield
            if self.is_rank_zero():
                multihost_utils.sync_global_devices("local_zero_first:enter")
            multihost_utils.sync_global_devices("local_zero_first:exit")
        else:
            yield

    # --- logging ------------------------------------------------------------
    def debug(self, msg: str, *args, ctx_level: int = 0, **kwargs) -> None:
        self._ensure_level()
        self.logger.debug("\t" * ctx_level + msg, *args, **kwargs)

    def info(self, msg: str, *args, ctx_level: int = 0, **kwargs) -> None:
        self._ensure_level()
        self.logger.info("\t" * ctx_level + msg, *args, **kwargs)

    def warning(self, msg: str, *args, ctx_level: int = 0, **kwargs) -> None:
        self._ensure_level()
        self.logger.warning("\t" * ctx_level + msg, *args, **kwargs)

    def error(self, msg: str, *args, ctx_level: int = 0, **kwargs) -> None:
        self._ensure_level()
        self.logger.error("\t" * ctx_level + msg, *args, **kwargs)


def initialize_overwatch(name: str) -> Overwatch:
    return Overwatch(name)
