"""Synthetic data fixtures — the reference DummyDataset analogue
(vla/datasets/datasets.py:306-358): random batches with the exact training
token layout, for smoke-testing the loop without RLDS data."""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np

# the one source of the special-token id layout (re-exported for callers)
from mla_tpu.vla.tokenizer import (  # noqa: F401
    BOD_ID,
    BOS_ID,
    EMPTY_ID,
    EOD_ID,
    EOS_ID,
    PAD_ID,
)


def synthetic_batch(cfg, B: int = 2, L: int = 16, seed: int = 0, training: bool = True) -> Dict[str, Any]:
    """Random batch with the training token layout:
    [BOS, prompt..., 29871, BOD, EOD, action ids x action_dim, EOS, pad..].

    `splice_idx` follows the reference's tag convention: training splices at
    the last EOS (prismatic.py:883 tag_0=2), inference at the last 29871."""
    rng = np.random.default_rng(seed)
    ad = cfg.action_dim
    assert L >= ad + 7, f"L={L} too short for the action span"
    ids = np.full((B, L), PAD_ID, dtype=np.int32)
    n_real = L - 2
    for b in range(B):
        ids[b, 0] = BOS_ID
        ids[b, 1 : n_real - ad - 3] = rng.integers(100, 20000, n_real - ad - 4)
        ids[b, n_real - ad - 3] = EMPTY_ID
        ids[b, n_real - ad - 2] = BOD_ID
        ids[b, n_real - ad - 1] = EOD_ID
        ids[b, n_real - ad : n_real] = rng.integers(31744, 32000, ad)
        ids[b, n_real] = EOS_ID
    attn = ids != PAD_ID
    labels = np.where(attn, ids, -100).astype(np.int32)
    labels[:, : n_real - ad] = -100
    splice = np.full((B,), n_real if training else n_real - ad - 3, dtype=np.int32)

    img = rng.normal(size=(B, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    mask = np.ones((B, 1, cfg.vision.image_size, cfg.vision.image_size), np.float32)
    batch: Dict[str, Any] = {
        "input_ids": ids,
        "attention_mask": attn,
        "labels": labels,
        "splice_idx": splice,
        "images": {"front_image": np.concatenate([img, mask], axis=1)},
        "proprio": rng.normal(size=(B, 1, ad)).astype(np.float32),
        "actions": rng.uniform(-1, 1, size=(B, cfg.action_horizon, ad)).astype(np.float32),
    }
    if cfg.use_pointcloud:
        batch["point_cloud"] = rng.uniform(
            [-0.3, -0.45, 0.75], [0.7, 0.45, 1.6], size=(B, cfg.point.input_points, 3)
        ).astype(np.float32)
    if cfg.use_tactile:
        batch["tactile"] = rng.normal(size=(B, cfg.tactile_dim * cfg.n_arms)).astype(np.float32)
        batch["gripper_xyz"] = rng.uniform(
            [0.0, -0.2, 0.9], [0.4, 0.2, 1.3], size=(B, 3 * cfg.n_arms)
        ).astype(np.float32)
    if cfg.use_generation:
        if cfg.gen.use_image:
            batch["next_images"] = rng.normal(
                size=(B, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
        if cfg.gen.use_pointcloud:
            batch["next_point_cloud"] = rng.normal(
                size=(B, cfg.point.input_points, 3)
            ).astype(np.float32)
        if cfg.gen.use_tactile:
            batch["next_tactile"] = rng.normal(size=(B, cfg.tactile_dim)).astype(np.float32)
    return batch


class DummyDataset:
    """Iterable of synthetic batches (reference DummyDataset,
    vla/datasets/datasets.py:306-358)."""

    def __init__(self, cfg, batch_size: int = 8, seq_len: int = 16, seed: int = 0,
                 num_batches: Optional[int] = None) -> None:
        self.cfg, self.batch_size, self.seq_len = cfg, batch_size, seq_len
        self.seed, self.num_batches = seed, num_batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        i = 0
        while self.num_batches is None or i < self.num_batches:
            yield synthetic_batch(self.cfg, self.batch_size, self.seq_len, seed=self.seed + i)
            i += 1
