"""VLM-pretraining path (VERDICT r4 #5): LLaVA-era map-style datasets +
SplitModalitySampler + LM collator driving the shared train step.

Parity target: reference run_training (base_strategy_mla.py:124-247) with
the align/finetune dataset behaviors of the Prismatic lineage (human turns
IGNORE, align discards the prompt and predicts the caption, image patches
splice right after BOS).
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

from mla_tpu.vla.sampler import PaddedCollatorForLanguageModeling
from mla_tpu.vla.tokenizer import BOS_ID, EOS_ID, SimpleTokenizer
from mla_tpu.vla.vlm_datasets import (
    IGNORE_INDEX,
    VLMAlignDataset,
    VLMFinetuneDataset,
    synthetic_vlm_examples,
)

REPO = Path(__file__).resolve().parent.parent


def _ds_kwargs(image_size=32):
    examples, loader = synthetic_vlm_examples(
        n_multimodal=3, n_unimodal=3, image_size=image_size
    )
    return dict(
        tokenizer=SimpleTokenizer(), image_size=image_size,
        examples=examples, image_loader=loader,
    )


def test_align_dataset_labels():
    """Align: caption-only supervision — BOS is IGNORE (image patches splice
    in right after it), every other position supervises the caption + EOS."""
    ds = VLMAlignDataset("unused.json", ".", **_ds_kwargs())
    item = ds[0]  # multimodal
    assert item["pixel_values"].shape[0] == 4  # CLIP + mask channel
    assert item["input_ids"][0] == BOS_ID
    assert item["input_ids"][-1] == EOS_ID
    assert item["labels"][0] == IGNORE_INDEX
    assert (item["labels"][1:] == item["input_ids"][1:]).all()
    lengths = ds.get_modality_lengths(n_image_patches=16)
    assert lengths[0][0] is True and lengths[0][1] > 16
    assert lengths[-1][0] is False


def test_finetune_dataset_masks_human_turns():
    ds = VLMFinetuneDataset("unused.json", ".", **_ds_kwargs())
    mm = ds[0]
    uni = ds[-1]
    assert mm["pixel_values"] is not None and uni["pixel_values"] is None
    # the human turn (first) is fully IGNORE; the gpt turn is supervised
    assert (mm["labels"] == IGNORE_INDEX).any()
    assert (mm["labels"] != IGNORE_INDEX).any()
    first_supervised = int(np.argmax(mm["labels"] != IGNORE_INDEX))
    assert (mm["labels"][:first_supervised] == IGNORE_INDEX).all()
    assert (
        mm["labels"][first_supervised:] == mm["input_ids"][first_supervised:]
    ).all()


def test_collator_modality_tracking():
    ds = VLMFinetuneDataset("unused.json", ".", **_ds_kwargs())
    coll = PaddedCollatorForLanguageModeling(max_length=64)
    batch = coll([ds[0], ds[1], ds[-1]])
    assert batch["input_ids"].shape == (3, 64)
    assert list(batch["multimodal_indices"]) == [0, 1]
    assert batch["pixel_values"].shape[0] == 2


@pytest.mark.parametrize("stage", ["align", "finetune"])
def test_vlm_pretrain_e2e_two_steps(tmp_path, stage):
    """The wired entry point: `scripts/train.py --vlm_stage ...` runs two
    real optimizer steps on dummy data through SplitModalitySampler + the
    LM collator + the shared jitted train step (8-device CPU mesh), writes
    metrics, and checkpoints. The finetune stage's two steps cover BOTH
    batch modalities (one multimodal batch, one language-only batch — the
    synthetic set has 6 of each at global batch 8, padded by cycling)."""
    sys.path.insert(0, str(REPO / "scripts"))
    train_mod = importlib.import_module("train")
    run_id = f"vlm-{stage}-e2e"
    train_mod.main([
        "--vlm_stage", stage,
        "--model", "mla-tiny",
        "--max_steps", "2",
        "--global_batch_size", "8",
        "--vlm_max_length", "48",
        "--run_root_dir", str(tmp_path),
        "--run_id", run_id,
    ])
    run_dir = tmp_path / run_id
    lines = (run_dir / f"{run_id}.jsonl").read_text().strip().splitlines()
    assert lines, "no metrics written"
    import json

    rec = json.loads(lines[-1])
    loss = rec.get("VLA Train/ar_loss") or rec.get("VLA Train/total_loss")
    assert loss is not None and np.isfinite(loss) and loss > 0
    assert list((run_dir / "checkpoints").glob("step-*")), "no checkpoint saved"


def test_vlm_align_stage_freezes_llm():
    """vlm-align trains the projectors only: vision towers + llm_backbone
    frozen (LLaVA-lineage projector warmup)."""
    import jax

    from mla_tpu.conf.models import get_model_config
    from mla_tpu.models import prismatic
    from mla_tpu.training.optim import trainable_mask

    cfg = get_model_config("mla-tiny", use_diff=False, use_pointcloud=False,
                           use_contrastive=False, use_generation=False)
    params, _ = prismatic.mla_model_init(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, stage="vlm-align")
    leaves_by_top = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(mask)[0]:
        top = path[0].key
        leaves_by_top.setdefault(top, set()).add(bool(leaf))
    assert leaves_by_top["llm_backbone"] == {False}
    assert leaves_by_top["vision_tower_2d"] == {False}
    assert leaves_by_top["projector_2d"] == {True}
