"""Synthetic datasets — procedural stand-ins for smoke tests and for driving
the training harness in data-less environments."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from sd_tpu.data.base import Dataset

__all__ = ["SyntheticImages", "ColoredShapes"]


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


class ColoredShapes(Dataset):
    """Learnable class-conditional toy distribution: one colored shape per
    image on a dark background, class = (shape, color) pair.

    Built for the training-convergence demonstration (the reference's whole
    L4 purpose, ``main.py:418-741``): the mapping class -> image is
    deterministic up to a small position jitter, so a class-conditional
    diffusion model trained on it produces visibly recognizable shapes
    within a few thousand steps, and the loss curve is meaningful (unlike
    :class:`SyntheticImages`, whose pixels are pure noise).

    Classes: ``shape = label % 4`` in {square, circle, triangle, plus},
    ``color = label // 4`` — supports up to ``4 * len(colors)`` classes.
    """

    _COLORS = np.array([
        [1.0, -0.6, -0.6],   # red
        [-0.6, 0.2, 1.0],    # blue
        [-0.4, 1.0, -0.4],   # green
        [1.0, 0.9, -0.7],    # yellow
    ], np.float32)

    def __init__(self, size: int = 32, length: int = 2048, n_classes: int = 8,
                 jitter: int = 4, radius: int = 7, seed: int = 0):
        if n_classes > 4 * len(self._COLORS):
            raise ValueError(f"n_classes <= {4 * len(self._COLORS)}")
        self.size = size
        self.length = length
        self.n_classes = n_classes
        self.jitter = jitter
        self.radius = radius
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, i: int) -> Dict:
        rng = np.random.default_rng(self.seed * 100003 + i)
        label = i % self.n_classes
        shape, color = label % 4, self._COLORS[label // 4]
        c = self.size // 2 + rng.integers(-self.jitter, self.jitter + 1, 2)
        yy, xx = np.mgrid[0:self.size, 0:self.size]
        dy, dx = yy - c[0], xx - c[1]
        r = self.radius
        if shape == 0:      # square
            mask = np.maximum(np.abs(dx), np.abs(dy)) < r
        elif shape == 1:    # circle
            mask = dx * dx + dy * dy < r * r
        elif shape == 2:    # upward triangle
            mask = (dy > -r) & (dy < r) & (np.abs(dx) < (dy + r) / 2)
        else:               # plus
            arm = max(r // 3, 2)
            mask = ((np.abs(dx) < arm) | (np.abs(dy) < arm)) & (
                np.maximum(np.abs(dx), np.abs(dy)) < r)
        img = np.full((self.size, self.size, 3), -0.95, np.float32)
        img[mask] = color
        return {"image": img, "class_label": np.int32(label)}
