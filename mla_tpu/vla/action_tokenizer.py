"""Continuous-action <-> discrete-token codec.

Behavior-parity rebuild of the reference ActionTokenizer
(vla/action_tokenizer.py:13-75): 256 uniform bins on [-1, 1] mapped onto the
*last* 256 ids of the base vocabulary (least-used BPE tokens), i.e.
token_id = vocab_size - digitize(action). Decode maps back through bin
centers with the reference's off-by-one clip convention.

Pure numpy — this runs on the host at data/inference edges, never on-device.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class ActionTokenizer:
    def __init__(
        self,
        tokenizer=None,
        bins: int = 256,
        min_action: float = -1.0,
        max_action: float = 1.0,
        vocab_size: Optional[int] = None,
    ) -> None:
        """`tokenizer` is any HF-style tokenizer (used only for decode-to-text
        convenience); pass `vocab_size` directly to run tokenizer-free."""
        self.tokenizer = tokenizer
        self.n_bins = bins
        self.min_action, self.max_action = min_action, max_action
        if vocab_size is None:
            if tokenizer is None:
                raise ValueError("need `tokenizer` or explicit `vocab_size`")
            vocab_size = int(tokenizer.vocab_size)
        self._vocab_size = vocab_size

        self.bins = np.linspace(min_action, max_action, self.n_bins)
        self.bin_centers = (self.bins[:-1] + self.bins[1:]) / 2.0
        # reference vla/action_tokenizer.py:39 (the corrected variant)
        self.action_token_begin_idx: int = int(self._vocab_size - (self.n_bins + 1))

    def encode_to_ids(self, action: np.ndarray) -> np.ndarray:
        """Continuous action -> token ids (the device-facing path)."""
        action = np.clip(action, self.min_action, self.max_action)
        discretized = np.digitize(action, self.bins)
        return self._vocab_size - discretized

    def __call__(self, action: np.ndarray) -> Union[str, List[str]]:
        """Continuous action -> decoded token *string* (prompt-building path,
        matches reference __call__ which returns tokenizer.decode output)."""
        if self.tokenizer is None:
            raise ValueError("text decode requires a base tokenizer")
        ids = self.encode_to_ids(np.asarray(action))
        if ids.ndim == 1:
            return self.tokenizer.decode(list(ids))
        return self.tokenizer.batch_decode(ids.tolist())

    def decode_token_ids_to_actions(self, action_token_ids: np.ndarray) -> np.ndarray:
        """Token ids -> continuous actions via bin centers.

        digitize returns indices in [1, n_bins]; subtract 1 and clip to
        [0, n_bins-2] so the final index addresses a real bin center
        (reference vla/action_tokenizer.py:52-71)."""
        discretized = self._vocab_size - np.asarray(action_token_ids)
        discretized = np.clip(discretized - 1, a_min=0, a_max=self.bin_centers.shape[0] - 1)
        return self.bin_centers[discretized]

    @property
    def vocab_size(self) -> int:
        return self.n_bins
