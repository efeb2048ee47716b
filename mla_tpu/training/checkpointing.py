"""Checkpoint save/load: orbax-native + reference-compatible export.

Run-dir layout mirrors the reference's public API (models/load.py:253-369):
    runs/<run_id>/
      config.json                  (train + model config dump)
      dataset_statistics.json      (q01/q99 norm stats)
      checkpoints/
        step-XXXXXX-epoch-XX-loss=Y.YYYY/   (orbax dir, sharded-safe)
        step-XXXXXX-epoch-XX-loss=Y.YYYY.pt (optional reference-format)
        latest -> (text file naming the latest orbax dir)

The orbax path replaces the reference's rank-0 FULL_STATE_DICT gather
(fsdp.py:100-155): every host writes its shards directly — no 13GB
device->host gather on one rank. Optimizer state IS saved (the reference
comments its save out, fsdp.py:142-155, and warns on resume).
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from mla_tpu.utils.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


def _ckpt_name(step: int, epoch: int, loss: Optional[float]) -> str:
    if loss is None:
        return f"step-{step:06d}-epoch-{epoch:02d}-loss=inf"
    return f"step-{step:06d}-epoch-{epoch:02d}-loss={loss:.4f}"


def _config_to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _config_to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, dict):
        return {k: _config_to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_config_to_jsonable(v) for v in obj]
    if hasattr(obj, "dtype") and hasattr(obj, "shape"):
        return str(obj)
    if isinstance(obj, type):
        return obj.__name__
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        return str(obj)


def write_run_metadata(run_dir, train_cfg: Any, model_cfg: Any,
                       dataset_statistics: Optional[Dict] = None) -> None:
    run_dir = Path(run_dir)
    if not overwatch.is_rank_zero():
        return
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.json", "w") as f:
        json.dump(
            {"train": _config_to_jsonable(train_cfg), "model": _config_to_jsonable(model_cfg)},
            f, indent=2,
        )
    if dataset_statistics is not None:
        with open(run_dir / "dataset_statistics.json", "w") as f:
            json.dump(_config_to_jsonable(dataset_statistics), f, indent=2)


_ASYNC_CKPTR = None


def _get_async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until in-flight async checkpoint writes complete (call before
    process exit / before reading the checkpoint back)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    run_dir,
    train_state: Dict[str, Any],
    *,
    step: int,
    epoch: int = 0,
    loss: Optional[float] = None,
    keep: int = 3,
    also_reference_format: bool = False,
    model_cfg: Any = None,
    async_save: bool = False,
) -> Path:
    """Orbax save of the full train state. Multi-host safe (all hosts call).

    async_save=True overlaps the write with training (orbax
    AsyncCheckpointer); call wait_for_async_saves() before exit."""
    import orbax.checkpoint as ocp

    run_dir = Path(run_dir)
    ckpt_dir = run_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    name = _ckpt_name(step, epoch, loss)
    path = (ckpt_dir / name).absolute()

    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(train_state), force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, train_state, force=True)

    if overwatch.is_rank_zero():
        with open(ckpt_dir / "latest", "w") as f:
            f.write(name)
        _gc_old_checkpoints(ckpt_dir, keep)

    if also_reference_format and overwatch.is_rank_zero():
        export_reference_pt(path.with_suffix(".pt"), train_state, model_cfg)
    return path


def _is_complete_ckpt(d: Path) -> bool:
    # orbax writes to "<name>.orbax-checkpoint-tmp-*" and renames on
    # finalize — a tmp suffix means in-flight/aborted, never a checkpoint
    return d.is_dir() and d.name.startswith("step-") and "orbax-checkpoint-tmp" not in d.name


def _gc_old_checkpoints(ckpt_dir: Path, keep: int) -> None:
    import shutil

    dirs = sorted(
        [d for d in ckpt_dir.iterdir() if _is_complete_ckpt(d)],
        key=lambda d: d.name,
    )
    for d in dirs[:-keep] if keep > 0 else []:
        shutil.rmtree(d, ignore_errors=True)
        # companion reference-format export (also_reference_format=True) —
        # ~13 GB each at 7B; without this they accumulate until disk-full
        pt = d.with_suffix(".pt")
        if pt.exists():
            pt.unlink()


def load_checkpoint(path, abstract_state: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a train state saved by save_checkpoint. `abstract_state` is a
    pytree of jax.ShapeDtypeStruct (or concrete arrays) fixing structure,
    shapes and shardings."""
    import orbax.checkpoint as ocp

    abstract = jax.tree_util.tree_map(
        lambda x: x
        if isinstance(x, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "sharding")
        else jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        abstract_state,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), abstract)


def latest_checkpoint(run_dir) -> Optional[Path]:
    """Newest COMPLETE checkpoint. The `latest` marker is written as soon as
    an async save is dispatched, so after a mid-write preemption (the exact
    case resume exists for) it can name a directory orbax never finalized —
    fall back to the newest finalized step-* dir then."""
    ckpt_dir = Path(run_dir) / "checkpoints"
    marker = ckpt_dir / "latest"
    if marker.exists():
        named = ckpt_dir / marker.read_text().strip()
        if _is_complete_ckpt(named):
            return named
    dirs = sorted(d for d in ckpt_dir.glob("step-*") if _is_complete_ckpt(d))
    return dirs[-1] if dirs else None


def export_reference_pt(path, train_state: Dict[str, Any], model_cfg: Any) -> None:
    """Write the reference-format module-keyed .pt so reference-ecosystem
    tooling can read our checkpoints."""
    import torch

    from mla_tpu.models.convert import export_reference_checkpoint

    host_params = jax.tree_util.tree_map(np.asarray, train_state["params"])
    host_state = jax.tree_util.tree_map(np.asarray, train_state.get("model_state", {}))
    blob = export_reference_checkpoint(host_params, host_state, model_cfg)
    blob_t = {
        "model": {
            mod: {k: torch.tensor(v) for k, v in sd.items()} for mod, sd in blob["model"].items()
        }
    }
    torch.save(blob_t, path)


def parse_step_epoch(ckpt_path) -> Tuple[int, int]:
    m = re.search(r"step-(\d+)-epoch-(\d+)", str(ckpt_path))
    if not m:
        return 0, 0
    return int(m.group(1)), int(m.group(2))
