"""ImageNet datasets incl. the SR (super-resolution) variants.

Rebuild of ``ldm/data/imagenet.py``: filelist-based train/val datasets with
synset/human-label metadata, and ``ImageNetSR`` — crop -> rescale -> degrade
producing the ``image`` + ``LR_image`` pair the LDM-SR models train on
(``imagenet.py:272-394``). The academictorrents auto-download machinery is
intentionally not reproduced (zero-egress environments; point ``data_root``
at an existing extraction instead).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional

import numpy as np

from sd_tpu.data.base import Dataset
from sd_tpu.data.degradation import degradation_bsrgan, degradation_bsrgan_variant
from sd_tpu.data.lsun import center_crop_square, load_rgb, resize

__all__ = [
    "ImageNetBase", "ImageNetTrain", "ImageNetValidation",
    "ImageNetSR", "ImageNetSRTrain", "ImageNetSRValidation",
]


class ImageNetBase(Dataset):
    """Filelist dataset yielding image + class_label (+ synset metadata).

    The filelist format matches the reference's prepared layout
    (``imagenet.py:26-131``): one relative path per line, synset directory
    names encode the class.
    """

    def __init__(self, data_root: str, filelist: Optional[str] = None,
                 size: Optional[int] = None, random_crop: bool = False,
                 seed: int = 0):
        self.data_root = data_root
        if filelist is None:
            filelist = os.path.join(data_root, "filelist.txt")
        with open(filelist) as f:
            self.relpaths = f.read().splitlines()
        synsets = sorted({p.split("/")[0] for p in self.relpaths})
        self.synset2idx = {s: i for i, s in enumerate(synsets)}
        self.size = size
        self.random_crop = random_crop
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.relpaths)

    def __getitem__(self, i: int) -> Dict:
        rel = self.relpaths[i]
        path = os.path.join(self.data_root, rel)
        img = load_rgb(path)
        if self.random_crop:
            crop = min(img.shape[:2])
            y = self._rng.integers(0, img.shape[0] - crop + 1)
            x = self._rng.integers(0, img.shape[1] - crop + 1)
            img = img[y:y + crop, x:x + crop]
        else:
            img = center_crop_square(img)
        if self.size:
            img = resize(img, self.size)
        synset = rel.split("/")[0]
        return {
            "relpath": rel,
            "synsets": synset,
            "class_label": np.int32(self.synset2idx.get(synset, -1)),
            "image": (img / 127.5 - 1.0).astype(np.float32),
        }


class ImageNetTrain(ImageNetBase):
    def __init__(self, **kwargs):
        kwargs.setdefault("random_crop", True)
        super().__init__(**kwargs)


class ImageNetValidation(ImageNetBase):
    def __init__(self, **kwargs):
        kwargs.setdefault("random_crop", False)
        super().__init__(**kwargs)


class ImageNetSR(Dataset):
    """(image, LR_image) pairs for SR training. Ref: ``imagenet.py:272-394``:
    1. crop a side-fraction in [min_crop_f, max_crop_f] (center or random),
    2. resize crop to ``size``,
    3. degrade to LR with the configured degradation_fn.
    """

    def __init__(self, base: Dataset, size: int = 256,
                 degradation: str = "bsrgan_light", downscale_f: int = 4,
                 min_crop_f: float = 0.5, max_crop_f: float = 1.0,
                 random_crop: bool = True, seed: int = 0):
        assert (size / downscale_f).is_integer()
        self.base = base
        self.size = size
        self.LR_size = int(size / downscale_f)
        self.downscale_f = downscale_f
        self.min_crop_f = min_crop_f
        self.max_crop_f = max_crop_f
        self.center_crop = not random_crop
        self._rng = np.random.default_rng(seed)

        if degradation == "bsrgan":
            self.degradation_process = partial(degradation_bsrgan, sf=downscale_f)
            self._pair = True
        elif degradation == "bsrgan_light":
            self.degradation_process = partial(degradation_bsrgan_variant, sf=downscale_f)
            self._pair = True
        elif degradation.startswith("cv_") or degradation.startswith("pil_"):
            # plain interpolation downsample variants (imagenet.py:311-333)
            self.degradation_process = None
            self._pair = False
        else:
            raise ValueError(degradation)

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, i: int) -> Dict:
        example = self.base[i]
        img = ((example["image"] + 1.0) * 127.5).astype(np.uint8)

        min_side = min(img.shape[:2])
        crop = int(min_side * self._rng.uniform(self.min_crop_f, self.max_crop_f))
        if self.center_crop:
            y = (img.shape[0] - crop) // 2
            x = (img.shape[1] - crop) // 2
        else:
            y = self._rng.integers(0, img.shape[0] - crop + 1)
            x = self._rng.integers(0, img.shape[1] - crop + 1)
        img = resize(img[y:y + crop, x:x + crop], self.size)

        hr01 = img.astype(np.float32) / 255.0
        if self._pair:
            lr01, _ = self.degradation_process(hr01, rng=self._rng)
        else:
            lr01 = resize(img, self.LR_size).astype(np.float32) / 255.0
        example["image"] = (hr01 * 2.0 - 1.0).astype(np.float32)
        example["LR_image"] = (lr01 * 2.0 - 1.0).astype(np.float32)
        return example


class ImageNetSRTrain(ImageNetSR):
    def __init__(self, data_root: str, filelist: Optional[str] = None, **kwargs):
        base = ImageNetTrain(data_root=data_root, filelist=filelist)
        super().__init__(base=base, random_crop=True, **kwargs)


class ImageNetSRValidation(ImageNetSR):
    def __init__(self, data_root: str, filelist: Optional[str] = None, **kwargs):
        base = ImageNetValidation(data_root=data_root, filelist=filelist)
        super().__init__(base=base, random_crop=False, **kwargs)
