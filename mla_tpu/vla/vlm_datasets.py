"""Map-style VLM-pretraining datasets (LLaVA-era align / finetune stages).

Parity target: the reference's VLM pretraining loop `run_training`
(training/strategies/base_strategy_mla.py:124-247) consumes a map-style
Dataset + PaddedCollatorForLanguageModeling through SplitModalitySampler.
The datasets themselves follow the public LLaVA chat-json schema
(list of {"id", "image"?, "conversations": [{"from": human|gpt,
"value"}, ...]}), with the two stage behaviors the Prismatic lineage uses:

* **align** — projector warmup: the human prompt is DISCARDED and the
  model directly predicts the caption from the image; labels supervise
  the caption + EOS only (BOS is IGNORE since image patches splice in
  right after it).
* **finetune** — multi-turn instruct tuning through the model-family
  PromptBuilder; human turns are IGNORE, gpt turns are supervised.
  Examples without an "image" key are language-only (pixel_values None);
  the collator + SplitModalitySampler keep them in unimodal batches.

Everything is numpy/PIL-free (images load via PIL only when a real image
dir is given); `image_transform` defaults to the model's CLIP
preprocessing (resize-center-crop + normalize + mask channel ->
[4, S, S] float32), matching what `prismatic.get_fused_tokens` expects.

Token ids come from any tokenizer honoring the repo contract
(`tok(text, add_special_tokens=...)` -> {"input_ids": [...]} or an object
with .input_ids) — the HF Llama tokenizer and tests' SimpleTokenizer both
qualify.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from mla_tpu.models.prompting import get_prompt_builder
from mla_tpu.vla.datasets import add_mask_channel, clip_preprocess
from mla_tpu.vla.tokenizer import EOS_ID

IGNORE_INDEX = -100


def _encode(tokenizer, text: str, add_special_tokens: bool = True) -> List[int]:
    out = tokenizer(text, add_special_tokens=add_special_tokens)
    ids = out["input_ids"] if isinstance(out, dict) else out.input_ids
    return list(ids)


def default_image_transform(image_size: int) -> Callable[[np.ndarray], np.ndarray]:
    """uint8 [H, W, 3] -> CLIP-normalized [4, S, S] float32 (mask channel
    all-ones), the front_image format of the composed model."""

    def transform(img: np.ndarray) -> np.ndarray:
        return add_mask_channel(clip_preprocess(img, image_size))

    return transform


def _load_image(image_dir: Path, rel: str) -> np.ndarray:
    from PIL import Image

    with Image.open(Path(image_dir) / rel) as im:
        return np.asarray(im.convert("RGB"))


class VLMAlignDataset:
    """Projector-warmup stage: predict the caption directly from the image."""

    def __init__(
        self,
        chat_json: Path,
        image_dir: Path,
        tokenizer,
        image_size: int = 672,
        image_transform: Optional[Callable] = None,
        examples: Optional[List[Dict[str, Any]]] = None,
        image_loader: Optional[Callable] = None,
    ) -> None:
        self.image_dir = Path(image_dir)
        self.tokenizer = tokenizer
        self.image_transform = image_transform or default_image_transform(image_size)
        self.image_loader = image_loader or _load_image
        if examples is None:
            with open(chat_json) as f:
                examples = json.load(f)
        self.examples = examples

    def __len__(self) -> int:
        return len(self.examples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        ex = self.examples[idx]
        conv = ex["conversations"]
        assert len(conv) == 2 and "<image>" not in conv[-1]["value"]
        caption = conv[-1]["value"].strip()
        ids = _encode(self.tokenizer, caption) + [EOS_ID]
        labels = list(ids)
        labels[0] = IGNORE_INDEX  # BOS: image patches splice in right after
        item = {
            "input_ids": np.asarray(ids, np.int32),
            "labels": np.asarray(labels, np.int32),
            "pixel_values": None,
        }
        if "image" in ex:
            item["pixel_values"] = self.image_transform(
                self.image_loader(self.image_dir, ex["image"])
            )
        return item

    def get_modality_lengths(self, n_image_patches: int = 0) -> List[Tuple[bool, int]]:
        out = []
        for ex in self.examples:
            mm = "image" in ex
            n_words = sum(
                len(t["value"].replace("<image>", "").split())
                for t in ex["conversations"]
            )
            out.append((mm, n_image_patches + n_words if mm else n_words))
        return out


class VLMFinetuneDataset:
    """Instruct-tuning stage: multi-turn dialog through the family
    PromptBuilder; human turns IGNORE, gpt turns supervised; examples
    without an image are language-only."""

    def __init__(
        self,
        instruct_json: Path,
        image_dir: Path,
        tokenizer,
        model_family: str = "llama2-pure",
        image_size: int = 672,
        max_length: int = 2048,
        image_transform: Optional[Callable] = None,
        examples: Optional[List[Dict[str, Any]]] = None,
        image_loader: Optional[Callable] = None,
    ) -> None:
        self.image_dir = Path(image_dir)
        self.tokenizer = tokenizer
        self.model_family = model_family
        self.max_length = max_length
        self.image_transform = image_transform or default_image_transform(image_size)
        self.image_loader = image_loader or _load_image
        if examples is None:
            with open(instruct_json) as f:
                examples = json.load(f)
        self.examples = examples

    def __len__(self) -> int:
        return len(self.examples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        ex = self.examples[idx]
        builder = get_prompt_builder(self.model_family)
        ids: List[int] = []
        labels: List[int] = []
        for turn_idx, turn in enumerate(ex["conversations"]):
            msg = builder.add_turn(turn["from"], turn["value"].replace("<image>", "").strip())
            turn_ids = _encode(self.tokenizer, msg, add_special_tokens=turn_idx == 0)
            ids.extend(turn_ids)
            labels.extend(
                [IGNORE_INDEX] * len(turn_ids) if turn_idx % 2 == 0 else turn_ids
            )
        ids = ids[: self.max_length]
        labels = labels[: self.max_length]
        item = {
            "input_ids": np.asarray(ids, np.int32),
            "labels": np.asarray(labels, np.int32),
            "pixel_values": None,
        }
        if "image" in ex:
            item["labels"][0] = IGNORE_INDEX
            item["pixel_values"] = self.image_transform(
                self.image_loader(self.image_dir, ex["image"])
            )
        return item

    def get_modality_lengths(self) -> List[Tuple[bool, int]]:
        return [
            (
                "image" in ex,
                sum(len(t["value"].split()) for t in ex["conversations"]),
            )
            for ex in self.examples
        ]


def synthetic_vlm_examples(
    n_multimodal: int = 6, n_unimodal: int = 6, seed: int = 0, image_size: int = 672
):
    """Dummy LLaVA-schema examples + an image loader for data-free smokes
    (the analogue of vla/dummy.py for the VLM-pretraining path)."""
    rng = np.random.default_rng(seed)
    words = ["robot", "red", "table", "block", "move", "the", "scene", "shows"]
    examples = []
    for i in range(n_multimodal + n_unimodal):
        cap = " ".join(rng.choice(words, size=6))
        ex = {
            "id": f"dummy{i}",
            "conversations": [
                {"from": "human", "value": "Describe the image.\n<image>"
                 if i < n_multimodal else "Say something."},
                {"from": "gpt", "value": cap},
            ],
        }
        if i < n_multimodal:
            ex["image"] = f"img{i}.jpg"
        examples.append(ex)

    def load_image(_dir, rel):
        i = int(Path(rel).stem[3:])
        r = np.random.default_rng(1000 + i)
        return r.integers(0, 255, (image_size, image_size, 3), np.uint8)

    return examples, load_image


def get_vlm_dataset_and_collator(
    stage: str,
    dataset_cfg,
    data_root_dir: Optional[str],
    tokenizer,
    model_family: str = "llama2-pure",
    image_size: int = 672,
    max_length: int = 2048,
    pad_token_id: int = 32000,
):
    """(dataset, collator) for the VLM-pretraining loop — the analogue of
    the reference's get_dataset_and_collator keyed by
    conf/datasets.py stage components. data_root_dir=None falls back to
    synthetic examples (2-step smoke / CI)."""
    from mla_tpu.vla.sampler import PaddedCollatorForLanguageModeling

    ann_rel, img_rel = dataset_cfg.components_for_stage(
        "align" if stage in ("align", "vlm-align") else "finetune"
    )
    examples = image_loader = None
    root = Path(data_root_dir) / dataset_cfg.dataset_root_dir if data_root_dir else Path(".")
    if data_root_dir is None:
        # synthetic mode: in-memory examples + generated frames (no disk IO)
        examples, image_loader = synthetic_vlm_examples(image_size=image_size)

    kw: Dict[str, Any] = dict(tokenizer=tokenizer, image_size=image_size,
                              examples=examples, image_loader=image_loader)
    if stage in ("align", "vlm-align"):
        ds = VLMAlignDataset(root / ann_rel, root / img_rel, **kw)
    else:
        ds = VLMFinetuneDataset(root / ann_rel, root / img_rel,
                                model_family=model_family,
                                max_length=max_length, **kw)
    collator = PaddedCollatorForLanguageModeling(max_length=max_length,
                                                 pad_token_id=pad_token_id)
    return ds, collator
