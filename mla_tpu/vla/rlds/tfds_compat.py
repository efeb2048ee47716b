"""Minimal TFDS-compatible RLDS directory reader (and fixture writer).

`make_dataset_from_rlds` (dataset.py:190) reads robot data through
`tfds.builder(name, data_dir)` — the first thing that runs in production
(reference vla/datasets/rlds/dataset.py:39-135). On hosts without the
`tensorflow_datasets` package this module provides the same surface for the
subset RLDS needs:

    builder(name, data_dir).as_dataset(split=...) ->
        tf.data.Dataset of episodes {"steps": <nested step Dataset>, ...}

On-disk layout mirrors TFDS: `data_dir/<name>/<version>/` holding
  * dataset_info.json   — name/version/splits (with shardLengths)
  * features.json       — nested feature spec (dtype + per-step shape)
  * <name>-<split>.tfrecord-NNNNN-of-MMMMM shards of tf.train.Example

Episode serialization follows the TFDS convention for nested
`tfds.features.Dataset` steps: every step leaf is flattened to a
'/'-joined key under "steps/", with values CONCATENATED across the episode
(numeric leaves as flat float/int64 lists reshaped back to [T, ...inner] on
read; string/bytes leaves as length-T bytes lists). Images travel as
encoded bytes — matching `tfds.decode.SkipDecoding()` semantics, since the
pipeline decodes them in the frame transforms (obs_transforms).

The split grammar supports what the pipeline uses: "train", "val",
"train[:95%]", "train[95%:]" (dataset.py:226-231).

`write_rlds_dataset` is the matching fixture writer used by the on-disk
pipeline tests (and handy for packing small real datasets).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, List, Optional

import numpy as np


def _tf():
    import tensorflow as tf

    return tf


# --------------------------------------------------------------------------- #
# feature-spec helpers
# --------------------------------------------------------------------------- #


def _flatten(prefix: str, tree: Dict[str, Any], out: Dict[str, Any]) -> None:
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            _flatten(path, v, out)
        else:
            out[path] = v


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


_DTYPE_NAMES = {
    "float32": np.float32, "float64": np.float64, "int32": np.int32,
    "int64": np.int64, "uint8": np.uint8, "bool": np.bool_, "string": None,
}


def _leaf_spec(arr) -> Dict[str, Any]:
    a = np.asarray(arr)
    if a.dtype.kind in ("S", "U", "O"):
        return {"dtype": "string", "shape": list(a.shape[1:])}
    return {"dtype": str(a.dtype), "shape": list(a.shape[1:])}


# --------------------------------------------------------------------------- #
# writer
# --------------------------------------------------------------------------- #


def write_rlds_dataset(
    data_dir,
    name: str,
    episodes: List[Dict[str, Any]],
    *,
    version: str = "1.0.0",
    split: str = "train",
    num_shards: int = 1,
) -> Path:
    """Write episodes as a TFDS-layout RLDS dataset directory.

    Each episode is {"steps": <nested dict of [T, ...] arrays>, **metadata}.
    Returns the versioned dataset directory."""
    tf = _tf()
    ds_dir = Path(data_dir) / name / version
    ds_dir.mkdir(parents=True, exist_ok=True)

    # features.json from the first episode
    first = episodes[0]
    steps_flat: Dict[str, Any] = {}
    _flatten("", first["steps"], steps_flat)
    meta_keys = {k: v for k, v in first.items() if k != "steps"}
    features = {
        "steps": {path: _leaf_spec(v) for path, v in steps_flat.items()},
        "episode_metadata": {k: _leaf_spec(np.asarray(v)[None])  # scalar -> per-episode
                             for k, v in meta_keys.items()},
    }
    (ds_dir / "features.json").write_text(json.dumps(features, indent=1))

    def leaf_feature(a) -> "tf.train.Feature":
        a = np.asarray(a)
        if a.dtype.kind in ("S", "U", "O"):
            vals = [v.encode() if isinstance(v, str) else bytes(v) for v in a.reshape(-1)]
            return tf.train.Feature(bytes_list=tf.train.BytesList(value=vals))
        if a.dtype.kind == "f":
            return tf.train.Feature(
                float_list=tf.train.FloatList(value=a.reshape(-1).astype(np.float32))
            )
        return tf.train.Feature(
            int64_list=tf.train.Int64List(value=a.reshape(-1).astype(np.int64))
        )

    def episode_example(ep: Dict[str, Any]) -> bytes:
        flat: Dict[str, Any] = {}
        _flatten("steps", ep["steps"], flat)
        feats = {path: leaf_feature(v) for path, v in flat.items()}
        for k, v in ep.items():
            if k != "steps":
                feats[f"episode_metadata/{k}"] = leaf_feature(v)
        return tf.train.Example(features=tf.train.Features(feature=feats)).SerializeToString()

    per_shard = (len(episodes) + num_shards - 1) // num_shards
    shard_lengths = []
    for s in range(num_shards):
        chunk = episodes[s * per_shard : (s + 1) * per_shard]
        shard_lengths.append(len(chunk))
        fname = ds_dir / f"{name}-{split}.tfrecord-{s:05d}-of-{num_shards:05d}"
        with tf.io.TFRecordWriter(str(fname)) as w:
            for ep in chunk:
                w.write(episode_example(ep))

    info_path = ds_dir / "dataset_info.json"
    info = json.loads(info_path.read_text()) if info_path.exists() else {
        "name": name, "version": version, "splits": [],
    }
    info["splits"] = [s for s in info.get("splits", []) if s.get("name") != split]
    info["splits"].append({"name": split, "shardLengths": [str(n) for n in shard_lengths]})
    info_path.write_text(json.dumps(info, indent=1))
    return ds_dir


# --------------------------------------------------------------------------- #
# reader
# --------------------------------------------------------------------------- #

def _parse_split(spec: str):
    """'train' | 'train[:95%]' | 'train[95%:]' -> (name, lo_pct, hi_pct)."""
    m = re.match(r"^(\w+)$", spec)
    if m:
        return m.group(1), 0, 100
    m = re.match(r"^(\w+)\[:(\d+)%\]$", spec)
    if m:
        return m.group(1), 0, int(m.group(2))
    m = re.match(r"^(\w+)\[(\d+)%:\]$", spec)
    if m:
        return m.group(1), int(m.group(2)), 100
    raise ValueError(f"unsupported split spec {spec!r}")


class _BuilderInfo:
    """tfds builder .info stand-in; str() is stable for the statistics
    cache hash (transforms.get_dataset_statistics hash_dependencies)."""

    def __init__(self, name: str, version: str, splits: Dict[str, Any], repr_: str):
        self.name, self.version, self.splits = name, version, splits
        self._repr = repr_

    def __str__(self) -> str:
        return self._repr


class MiniRLDSBuilder:
    """tfds.builder-shaped reader for the on-disk layout above."""

    def __init__(self, name: str, data_dir) -> None:
        base = Path(data_dir).expanduser() / name
        if not base.exists():
            raise FileNotFoundError(f"no dataset directory {base}")
        def version_key(d):
            # numeric ordering like real tfds: '1.10.0' > '1.9.0'
            try:
                return (1, tuple(int(p) for p in d.name.split(".")))
            except ValueError:
                return (0, (0,))

        versions = sorted((d for d in base.iterdir() if d.is_dir()), key=version_key)
        self.dir = versions[-1] if versions else base
        if not (self.dir / "dataset_info.json").exists():
            raise FileNotFoundError(f"{self.dir} has no dataset_info.json")
        self.name = name
        raw_info = json.loads((self.dir / "dataset_info.json").read_text())
        self.features = json.loads((self.dir / "features.json").read_text())
        splits = {
            s["name"]: SimpleNamespace(
                name=s["name"],
                shard_lengths=[int(n) for n in s.get("shardLengths", [])],
                num_examples=sum(int(n) for n in s.get("shardLengths", [])),
            )
            for s in raw_info.get("splits", [])
        }
        # str(info) feeds the dataset-statistics cache hash; include the
        # feature spec like real tfds does, so a schema change (e.g. a
        # proprio-width edit) invalidates cached stats
        self.info = _BuilderInfo(
            name=name, version=raw_info.get("version", "1.0.0"), splits=splits,
            repr_=json.dumps({"info": raw_info, "features": self.features},
                             sort_keys=True),
        )

    def _parse_spec(self):
        tf = _tf()
        spec: Dict[str, Any] = {}
        for path, leaf in self.features["steps"].items():
            dt = leaf["dtype"]
            if dt == "string":
                spec[f"steps/{path}"] = tf.io.VarLenFeature(tf.string)
            elif dt in ("float32", "float64"):
                spec[f"steps/{path}"] = tf.io.VarLenFeature(tf.float32)
            else:
                spec[f"steps/{path}"] = tf.io.VarLenFeature(tf.int64)
        for key, leaf in self.features.get("episode_metadata", {}).items():
            dt = leaf["dtype"]
            if dt == "string":
                spec[f"episode_metadata/{key}"] = tf.io.VarLenFeature(tf.string)
            elif dt in ("float32", "float64"):
                spec[f"episode_metadata/{key}"] = tf.io.VarLenFeature(tf.float32)
            else:
                spec[f"episode_metadata/{key}"] = tf.io.VarLenFeature(tf.int64)
        return spec

    def as_dataset(self, split: str = "train", shuffle_files: bool = False,
                   decoders: Optional[Dict] = None, read_config=None):
        """Episodes as {"steps": <nested per-step Dataset>, "episode_metadata":...}.
        Images stay encoded bytes (SkipDecoding semantics); `decoders` is
        accepted for call-site compatibility and ignored."""
        del decoders, read_config
        tf = _tf()
        if split == "all":
            # tfds's special union-of-all-splits keyword (the reference reads
            # it for dataset statistics, dataset.py:239)
            parts = [
                self.as_dataset(split=s, shuffle_files=shuffle_files)
                for s in sorted(self.info.splits)
            ]
            ds = parts[0]
            for p in parts[1:]:
                ds = ds.concatenate(p)
            return ds
        base, lo, hi = _parse_split(split)
        if base not in self.info.splits:
            raise ValueError(f"split {base!r} not in {list(self.info.splits)}")
        n = self.info.splits[base].num_examples
        files = sorted(str(p) for p in self.dir.glob(f"{self.name}-{base}.tfrecord-*"))
        start, stop = n * lo // 100, n * hi // 100
        shard_lengths = self.info.splits[base].shard_lengths
        if len(shard_lengths) == len(files) and sum(shard_lengths) == n:
            # resolve the split into per-shard (file, skip, take) read
            # instructions on the CANONICAL sorted order (like real tfds:
            # sub-split boundaries bind BEFORE any file shuffling, so
            # train[:95%] / train[95%:] always partition exactly), then
            # shuffle the instruction ORDER — fresh OS-entropy seed per
            # call, matching tfds's nondeterministic shuffle_files default
            # (a fixed seed would feed the same file-level episode order
            # every epoch/process).
            instructions = []
            off = 0
            for f, ln in zip(files, shard_lengths):
                s, e = max(start, off), min(stop, off + ln)
                if e > s:
                    instructions.append((f, s - off, e - s))
                off += ln
            if shuffle_files:
                import random

                random.Random().shuffle(instructions)
            parts = [
                tf.data.TFRecordDataset(f).skip(skip).take(take)
                for f, skip, take in instructions
            ]
            ds = parts[0] if parts else tf.data.TFRecordDataset(files).take(0)
            for part in parts[1:]:
                ds = ds.concatenate(part)
            start, stop = 0, -1  # carved above; skip the stream-level slice
        else:
            # shard metadata absent/inconsistent: fall back to a stream-level
            # skip/take over the sorted concatenation (no file shuffling —
            # order is the carving contract here)
            ds = tf.data.TFRecordDataset(files)

        spec = self._parse_spec()
        steps_features = self.features["steps"]
        meta_features = self.features.get("episode_metadata", {})

        def parse(raw):
            ex = tf.io.parse_single_example(raw, spec)

            def leaf(path, feat, per_step):
                dense = tf.sparse.to_dense(ex[path])
                dt, shape = feat["dtype"], feat["shape"]
                out = tf.reshape(dense, ([-1] + shape) if per_step else (shape or [-1]))
                if not per_step and not shape:
                    out = out[0]  # scalar episode metadata
                if dt == "string":
                    return out
                want = {"float32": tf.float32, "float64": tf.float32, "int32": tf.int32,
                        "int64": tf.int64, "uint8": tf.uint8, "bool": tf.bool}[dt]
                return tf.cast(out, want)

            steps_flat = {p: leaf(f"steps/{p}", f, True) for p, f in steps_features.items()}
            out: Dict[str, Any] = {
                "steps": tf.data.Dataset.from_tensor_slices(_unflatten(steps_flat)),
            }
            if meta_features:
                out["episode_metadata"] = {
                    k: leaf(f"episode_metadata/{k}", f, False) for k, f in meta_features.items()
                }
            return out

        ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
        if stop != -1 and (lo, hi) != (0, 100):
            ds = ds.skip(start).take(stop - start)
        return ds


def builder(name: str, data_dir) -> MiniRLDSBuilder:
    return MiniRLDSBuilder(name, data_dir)
