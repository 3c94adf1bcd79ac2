"""Bounding-box layout conditioning (layout2img).

The reference's ``Layout2ImgDiffusion`` (``ddpm.py:1424-1445``) consumes
tokenized bbox layouts through a BERTEmbedder; the tokenization convention
lives in the (not shipped) ``ldm.data.openimages`` dataset. This module
defines a self-contained equivalent: each object = [class_token,
x0_bin, y0_bin, x1_bin, y1_bin] with coordinates quantized to ``n_bins``,
flattened into the conditioning sequence.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

__all__ = ["BBoxTokenizer", "plot_bboxes"]


class BBoxTokenizer:
    """(class_id, x0, y0, x1, y1) lists -> int32 token sequences.

    Token space: [0, n_bins) = coordinate bins, [n_bins, n_bins + n_classes)
    = classes, then PAD. vocab_size = n_bins + n_classes + 1.
    """

    def __init__(self, n_classes: int, n_bins: int = 256, max_objects: int = 15):
        self.n_classes = n_classes
        self.n_bins = n_bins
        self.max_objects = max_objects
        self.pad_id = n_bins + n_classes

    @property
    def vocab_size(self) -> int:
        return self.n_bins + self.n_classes + 1

    @property
    def seq_len(self) -> int:
        return self.max_objects * 5

    def _quantize(self, v: float) -> int:
        return int(np.clip(v, 0.0, 1.0) * (self.n_bins - 1) + 0.5)

    def encode(self, objects: Sequence[Tuple]) -> np.ndarray:
        ids: List[int] = []
        for cls, x0, y0, x1, y1 in list(objects)[: self.max_objects]:
            ids.append(self.n_bins + int(cls))
            ids.extend(self._quantize(v) for v in (x0, y0, x1, y1))
        out = np.full((self.seq_len,), self.pad_id, np.int32)
        out[: len(ids)] = ids
        return out

    def crop_encoder(self, bbox: Tuple[float, float, float, float]) -> np.ndarray:
        """(x_tl, y_tl, w, h) crop -> a length-2 token code.

        The reference calls ``self.bbox_tokenizer._crop_encoder`` from its
        tiled path (``ddpm.py:953``, "tensors of shape (1, 2)"), but that
        tokenizer lives in the absent ``ldm.data.openimages`` module — the
        contract visible at the call site is only "2 tokens per crop". We
        define it as the quantized top-left corner in the coordinate-bin
        space (crop size is constant across patches and thus carried by the
        model's training distribution, not the code)."""
        x_tl, y_tl, _, _ = bbox
        return np.array([self._quantize(x_tl), self._quantize(y_tl)], np.int32)

    def decode(self, ids: np.ndarray) -> List[Tuple]:
        objs = []
        ids = np.asarray(ids).reshape(-1)
        for i in range(0, len(ids) - 4, 5):
            if ids[i] == self.pad_id:
                break
            cls = int(ids[i]) - self.n_bins
            coords = [float(ids[i + 1 + j]) / (self.n_bins - 1) for j in range(4)]
            objs.append((cls, *coords))
        return objs

    def __call__(self, batch_objects, context_length=None) -> np.ndarray:
        return np.stack([self.encode(o) for o in batch_objects])


def plot_bboxes(objects: Sequence[Tuple], size: int = 256) -> np.ndarray:
    """Render a bbox layout to an image in [-1, 1] — the conditioning
    visualization Layout2ImgDiffusion adds to its image logs
    (``ddpm.py:1434-1443``)."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size), color="white")
    draw = ImageDraw.Draw(img)
    for cls, x0, y0, x1, y1 in objects:
        color = tuple(int(c) for c in np.random.default_rng(int(cls)).integers(0, 200, 3))
        draw.rectangle(
            [x0 * size, y0 * size, x1 * size, y1 * size], outline=color, width=2
        )
        draw.text((x0 * size + 2, y0 * size + 2), str(int(cls)), fill=color)
    return np.asarray(img).astype(np.float32) / 127.5 - 1.0
