"""Host-side image IO: PNG save, grids, caption rendering.

Reference equivalents: grid assembly ``scripts/txt2img.py:332-343``
(einops-rearranged n-per-row grids), ``ldm/util.py:17-38`` (log_txt_as_img).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["save_image", "make_grid", "save_grid", "text_to_image",
           "load_image", "segmentation_to_rgb"]


def save_image(img: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.asarray(img)).save(path)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def make_grid(images: np.ndarray, n_rows: int = 0) -> np.ndarray:
    """[N, H, W, C] -> single grid image (n_rows images per row)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    cols = n_rows or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    pad = rows * cols - n
    if pad:
        images = np.concatenate([images, np.zeros((pad, h, w, c), images.dtype)])
    return (
        images.reshape(rows, cols, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * h, cols * w, c)
    )


def save_grid(images: np.ndarray, path: str, n_rows: int = 0) -> None:
    save_image(make_grid(images, n_rows), path)


def text_to_image(wh, captions: Sequence[str], size: int = 10) -> np.ndarray:
    """Render captions onto white images -> [B, H, W, 3] float32 in [-1, 1].

    Equivalent of ``log_txt_as_img`` (``ldm/util.py:17-38``); used by the
    ImageLogger to visualize conditioning text.
    """
    from PIL import Image, ImageDraw, ImageFont

    w, h = wh
    out = []
    for cap in captions:
        img = Image.new("RGB", (w, h), color="white")
        draw = ImageDraw.Draw(img)
        font = ImageFont.load_default()
        nc = max(int(40 * (w / 256)), 1)
        lines = "\n".join(cap[s : s + nc] for s in range(0, len(cap), nc))
        try:
            draw.text((0, 0), lines, fill="black", font=font)
        except UnicodeEncodeError:
            pass
        arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
        out.append(arr)
    return np.stack(out)


def segmentation_to_rgb(x, seed: int = 0):
    """Colorize a one-hot segmentation map with a fixed random projection.

    NHWC analog of ``LatentDiffusion.to_rgb`` (``ldm/models/diffusion/
    ddpm.py:1386-1390``): a random 1x1 conv to 3 channels, then min-max
    rescale to [-1, 1]. The projection is derived deterministically from
    (seed, n_labels) so repeated log_images calls colorize consistently
    (the reference caches its random buffer on the module instead).
    """
    import numpy as np

    x = np.asarray(x, dtype=np.float32)
    nl = x.shape[-1]
    rng = np.random.default_rng(seed * 100003 + nl)
    w = rng.standard_normal((nl, 3)).astype(np.float32)
    y = x @ w
    lo, hi = y.min(), y.max()
    return 2.0 * (y - lo) / max(hi - lo, 1e-12) - 1.0
