"""Synthetic datasets — procedural stand-ins for smoke tests and for driving
the training harness in data-less environments."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from sd_tpu.data.base import Dataset

__all__ = ["SyntheticImages"]


class SyntheticImages(Dataset):
    """Deterministic random images in [-1,1] + captions/class labels.

    ``caption_tokens`` > 0 emits pre-tokenized int32 captions under
    "caption" (the tiny-model contract); otherwise captions are strings.
    """

    def __init__(self, size: int = 32, length: int = 64, channels: int = 3,
                 n_classes: int = 10, caption_tokens: int = 8,
                 caption_vocab: int = 64, seed: int = 0):
        self.size = size
        self.length = length
        self.channels = channels
        self.n_classes = n_classes
        self.caption_tokens = caption_tokens
        self.caption_vocab = caption_vocab
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, i: int) -> Dict:
        rng = np.random.default_rng(self.seed * 100003 + i)
        img = rng.uniform(-1, 1, (self.size, self.size, self.channels))
        ex = {
            "image": img.astype(np.float32),
            "class_label": np.int32(i % self.n_classes),
        }
        if self.caption_tokens:
            ex["caption"] = rng.integers(
                0, self.caption_vocab, (self.caption_tokens,)
            ).astype(np.int32)
        else:
            ex["caption"] = f"synthetic image number {i}"
        return ex
