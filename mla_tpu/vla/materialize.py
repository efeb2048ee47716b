"""Dataset + collator factory (reference vla/materialize.py:21-91).

Two paths:
  * data_root_dir set  -> the RLDS tf.data pipeline (per-host sharded),
    per-frame RLDSBatchTransform, fixed-shape collator.
  * data_root_dir None -> synthetic DummyDataset batches (smoke/CI), no
    collator (batches come pre-assembled).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from mla_tpu.utils.overwatch import initialize_overwatch
from mla_tpu.vla.action_tokenizer import ActionTokenizer
from mla_tpu.vla.datasets import PaddedCollatorForActionPrediction, RLDSBatchTransform
from mla_tpu.vla.dummy import DummyDataset
from mla_tpu.vla.tokenizer import SimpleTokenizer

overwatch = initialize_overwatch(__name__)


def get_vla_dataset_and_collator(
    *,
    data_root_dir: Optional[str],
    data_mix: str,
    model_cfg,
    per_host_batch_size: int,
    shuffle_buffer_size: int = 10_000,
    action_tokenizer_exist: bool = False,
    base_tokenizer=None,
    max_prompt_len: int = 192,
    augment: bool = False,
    seed: int = 0,
) -> Tuple[Any, Optional[Any], Dict, Optional[int]]:
    """Returns (frame_iterable, collator_or_None, dataset_statistics,
    dataset_len_or_None) — dataset_len is the effective interleaved-mixture
    transition count (None for the synthetic DummyDataset), so the trainer
    can derive real steps-per-epoch instead of a shuffle-buffer heuristic.

    action_tokenizer_exist mirrors the reference materialize.py toggle
    (:37-46, wired from scripts/train.py:93, default False): when False the
    discretized AR action tokens are omitted from prompt and labels —
    diffusion-only supervision, the reference's default RLDS training mix."""
    if data_root_dir is None:
        overwatch.info(f"data: DummyDataset (no data_root_dir) mix={data_mix}")
        stats = {
            data_mix: {
                "action": {"q01": [-1.0] * model_cfg.action_dim, "q99": [1.0] * model_cfg.action_dim},
                "proprio": {"q01": [-1.0] * model_cfg.action_dim, "q99": [1.0] * model_cfg.action_dim},
            }
        }
        ds = DummyDataset(model_cfg, batch_size=per_host_batch_size, seed=seed)
        return ds, None, stats, None

    from mla_tpu.vla.rlds.dataset import make_interleaved_dataset

    base_tokenizer = base_tokenizer or SimpleTokenizer()
    action_tokenizer = (
        ActionTokenizer(base_tokenizer, vocab_size=32000)
        if action_tokenizer_exist
        else None
    )

    ds, dataset_len, stats = make_interleaved_dataset(
        data_mix, data_root_dir,
        train=True,
        shuffle_buffer_size=shuffle_buffer_size,
        window_size=model_cfg.past_action_window_size + 1,
        future_action_window_size=model_cfg.future_action_window_size,
        load_pointcloud=model_cfg.use_pointcloud,
        load_tactile=model_cfg.use_tactile,
        image_size=model_cfg.vision.image_size,
        augment=augment,
        seed=seed,
    )
    transform = RLDSBatchTransform(
        action_tokenizer=action_tokenizer,
        base_tokenizer=base_tokenizer,
        image_size=model_cfg.vision.image_size,
        use_pointcloud=model_cfg.use_pointcloud,
        use_tactile=model_cfg.use_tactile,
        num_points=model_cfg.point.input_points,
    )
    collator = PaddedCollatorForActionPrediction(max_prompt_len=max_prompt_len, training=True)

    def frame_iter():
        for frame in ds.as_numpy_iterator():
            yield transform(frame)

    return frame_iter(), collator, stats, int(dataset_len) if dataset_len else None
