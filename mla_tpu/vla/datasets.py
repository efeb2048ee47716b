"""Frame -> model-batch transform and the fixed-shape collator.

Parity targets:
  * RLDSBatchTransform (vla/datasets/datasets.py:30-184): CLIP 672px
    preprocessing + mask channel, tactile 65535-sentinel cleanup + /100,
    prompt "What action should the robot take to {lang}?" with gpt value
    "<BOD><EOD>{action_tokens}", label masking to the last action_dim+1
    tokens.
  * PaddedCollatorForActionPrediction (util/data_utils.py:94-195).

TPU-first changes:
  * the collator pads input_ids to a FIXED max_prompt_len (static shapes —
    the reference pads to the per-batch max, which would retrigger XLA
    compilation every step), and
  * it computes `splice_idx` (last tag-token position) on the host, feeding
    the device-side static gather splice (models/prismatic.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from mla_tpu.vla.action_tokenizer import ActionTokenizer

IGNORE_INDEX = -100
PAD_ID = 32000
BOS_ID = 1
EOS_ID = 2
EMPTY_ID = 29871
BOD_ID = 32001
EOD_ID = 32002

# CLIP normalization constants (CLIPImageProcessor defaults used by the
# reference's image_processor, vision_tokenizer.py:98-105)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def resize_center_crop(image: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> uint8 HWC: shortest-side BICUBIC scale + center crop to
    `size` (the geometric half of CLIPImageProcessor). The single source of
    this arithmetic — the training transform (clip_preprocess below) and the
    HTTP serving host (scripts/serve.py, which leaves normalization
    on-device) must stay pixel-identical or serving silently diverges from
    what the model was trained on."""
    from PIL import Image as PILImage

    img = PILImage.fromarray(image)
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), PILImage.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    return np.asarray(img.crop((left, top, left + size, top + size)))


def clip_preprocess(image: np.ndarray, size: int = 672) -> np.ndarray:
    """uint8 HWC -> float CHW, resized shortest-side + center-crop to
    `size`, CLIP-normalized (CLIPImageProcessor semantics)."""
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    arr = resize_center_crop(image, size).astype(np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)


def add_mask_channel(chw: np.ndarray) -> np.ndarray:
    """Append the all-ones mask channel (reference datasets.py:68-69)."""
    mask = np.ones((1,) + chw.shape[1:], np.float32)
    return np.concatenate([chw, mask], axis=0)


@dataclass
class RLDSBatchTransform:
    action_tokenizer: Optional[ActionTokenizer]
    base_tokenizer: Any  # HF-style tokenizer ((text) -> {input_ids})
    image_size: int = 672
    predict_stop_token: bool = True
    use_pointcloud: bool = False
    use_tactile: bool = False
    num_points: int = 1024

    def __call__(self, rlds_batch: Dict[str, Any]) -> Dict[str, Any]:
        obs = rlds_batch["observation"]
        action = np.asarray(rlds_batch["action"], np.float32)
        proprio = np.asarray(obs["proprio"], np.float32)

        out: Dict[str, Any] = {}
        images: Dict[str, np.ndarray] = {}
        front = clip_preprocess(np.asarray(obs["image_primary"][0]), self.image_size)
        images["front_image"] = add_mask_channel(front)
        if "image_next_primary" in obs:
            out["next_images"] = clip_preprocess(np.asarray(obs["image_next_primary"][0]), self.image_size)
        for key, name in (("image_wrist_right", "wrist_right_image"), ("image_wrist_left", "wrist_left_image")):
            if key in obs:
                images[name] = add_mask_channel(clip_preprocess(np.asarray(obs[key][0]), self.image_size))
        out["images"] = images

        if self.use_tactile:
            def clean(x):
                x = np.asarray(x, np.float32)
                x = np.where(x == 65535, 0.0, x)
                return x / 100.0

            out["tactile"] = np.concatenate([clean(obs["tactile_right"][0]), clean(obs["tactile_left"][0])])
            if "next_tactile_right" in obs:
                out["next_tactile"] = np.concatenate(
                    [clean(obs["next_tactile_right"][0]), clean(obs["next_tactile_left"][0])]
                )
            out["gripper_xyz"] = np.asarray(obs["gripper_xyz"][0], np.float32)

        if self.use_pointcloud:
            out["point_cloud"] = _fix_num_points(np.asarray(obs["point_cloud"][0], np.float32), self.num_points)
            if "next_point_cloud" in obs:
                out["next_point_cloud"] = _fix_num_points(
                    np.asarray(obs["next_point_cloud"][0], np.float32), self.num_points
                )

        lang = rlds_batch["task"]["language_instruction"]
        if isinstance(lang, bytes):
            lang = lang.decode()
        lang = str(lang).lower()

        # prompt build (reference datasets.py:117-142)
        if self.action_tokenizer is None:
            gpt_value = ""
        else:
            gpt_value = "<BOD><EOD>" + "".join(self.action_tokenizer(a) for a in action)
        prompt = f"In: What action should the robot take to {lang}?\nOut: {gpt_value}".rstrip()
        input_ids = list(self.base_tokenizer(prompt, add_special_tokens=True)["input_ids"]) + [EOS_ID]
        labels = list(input_ids)
        input_ids = np.asarray(input_ids, np.int32)
        labels = np.asarray(labels, np.int32)
        if self.action_tokenizer is None:
            labels[:-1] = IGNORE_INDEX
        else:
            labels[: -(action.shape[-1] + 1)] = IGNORE_INDEX
        if not self.predict_stop_token:
            labels[-1] = IGNORE_INDEX

        out.update(
            input_ids=input_ids,
            labels=labels,
            actions=action,
            proprio=proprio.reshape(1, -1) if proprio.ndim == 1 else proprio[:1],
            dataset_name=rlds_batch.get("dataset_name", "unknown"),
        )
        return out


def _fix_num_points(pc: np.ndarray, n: int) -> np.ndarray:
    """Pad (repeat) or random-subsample to exactly n points — the tokenizer
    needs static [n, 3]."""
    m = pc.shape[0]
    if m == n:
        return pc
    if m > n:
        idx = np.random.default_rng(0).choice(m, n, replace=False)
        return pc[idx]
    reps = int(np.ceil(n / max(m, 1)))
    return np.tile(pc, (reps, 1))[:n]


@dataclass
class PaddedCollatorForActionPrediction:
    """Stack transformed frames into a fixed-shape batch
    (reference util/data_utils.py:94-195 + host-side splice computation)."""

    max_prompt_len: int = 192
    pad_token_id: int = PAD_ID
    training: bool = True

    def __call__(self, instances: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        B = len(instances)
        L = self.max_prompt_len
        ids = np.full((B, L), self.pad_token_id, np.int32)
        labels = np.full((B, L), IGNORE_INDEX, np.int32)
        attn = np.zeros((B, L), bool)
        splice = np.zeros((B,), np.int32)
        for i, inst in enumerate(instances):
            if len(inst["input_ids"]) > L:
                # NEVER truncate silently: cutting the prompt drops the
                # supervised action tokens and the EOS splice anchor, so the
                # sample would train against IGNORE-only labels and a garbage
                # splice position (the reference pads to the batch max under
                # a 2048 model_max_length and hits no such limit)
                raise ValueError(
                    f"prompt of {len(inst['input_ids'])} tokens exceeds "
                    f"max_prompt_len={L}; raise PaddedCollatorForActionPrediction"
                    f".max_prompt_len (and the serving graph's prompt bucket) "
                    f"or shorten the instruction"
                )
            seq = inst["input_ids"]
            n = len(seq)
            ids[i, :n] = seq
            labels[i, :n] = inst["labels"][:n]
            attn[i, :n] = True
            tag = EOS_ID if self.training else EMPTY_ID
            tag_pos = np.nonzero(seq == tag)[0]
            splice[i] = tag_pos[-1] if len(tag_pos) else n - 1

        batch: Dict[str, Any] = {
            "input_ids": ids,
            "labels": labels,
            "attention_mask": attn,
            "splice_idx": splice,
            "images": {},
            "actions": np.stack([i["actions"] for i in instances]),
            "proprio": np.stack([i["proprio"] for i in instances]),
        }
        for key in instances[0]["images"]:
            batch["images"][key] = np.stack([i["images"][key] for i in instances])
        for key in ("point_cloud", "next_point_cloud", "tactile", "next_tactile",
                    "gripper_xyz", "next_images"):
            if key in instances[0]:
                batch[key] = np.stack([i[key] for i in instances])
        return batch
