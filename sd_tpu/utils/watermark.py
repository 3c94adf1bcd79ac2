"""Invisible watermark: DWT+DCT quantization-index-modulation embed/decode.

The reference embeds "StableDiffusionV1" into every txt2img output via the
``invisible-watermark`` package's dwtDct method (``scripts/txt2img.py:69-74``)
and ships a decode round-trip check (``scripts/tests/test_watermark.py``).
This is a self-contained implementation of the same scheme: 1-level Haar DWT
of the luma channel, 4x4 DCT blocks of the LL subband, one payload bit per
block embedded by quantizing a mid-frequency coefficient (QIM). Host-side
numpy/cv2 post-processing, exactly like the reference's CPU step.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["embed_watermark", "decode_watermark", "WATERMARK_PAYLOAD"]

WATERMARK_PAYLOAD = b"StableDiffusionV1"  # txt2img.py:70
_Q = 12.0          # quantization step
_COEFF = (2, 2)    # embedded DCT coefficient
_BLOCK = 4


def _haar_dwt2(x):
    a = (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2]) / 4.0
    h = (x[0::2, 0::2] + x[1::2, 0::2] - x[0::2, 1::2] - x[1::2, 1::2]) / 4.0
    v = (x[0::2, 0::2] - x[1::2, 0::2] + x[0::2, 1::2] - x[1::2, 1::2]) / 4.0
    d = (x[0::2, 0::2] - x[1::2, 0::2] - x[0::2, 1::2] + x[1::2, 1::2]) / 4.0
    return a, (h, v, d)


def _haar_idwt2(a, hvd):
    h, v, d = hvd
    H, W = a.shape
    out = np.zeros((H * 2, W * 2), a.dtype)
    out[0::2, 0::2] = a + h + v + d
    out[1::2, 0::2] = a + h - v - d
    out[0::2, 1::2] = a - h + v - d
    out[1::2, 1::2] = a - h - v + d
    return out


def _bits(payload: bytes):
    arr = np.frombuffer(payload, np.uint8)
    return np.unpackbits(arr)


def embed_watermark(img: np.ndarray, payload: bytes = WATERMARK_PAYLOAD) -> np.ndarray:
    """uint8 RGB HWC -> watermarked uint8 RGB (same shape).

    H and W must be multiples of 8 (true for all SD output sizes).
    """
    import cv2

    bits = _bits(payload)
    yuv = cv2.cvtColor(img, cv2.COLOR_RGB2YUV).astype(np.float32)
    y = yuv[:, :, 0]
    ll, hvd = _haar_dwt2(y)
    H, W = ll.shape
    bh, bw = H // _BLOCK, W // _BLOCK
    idx = 0
    for by in range(bh):
        for bx in range(bw):
            blk = ll[by * _BLOCK:(by + 1) * _BLOCK, bx * _BLOCK:(bx + 1) * _BLOCK]
            d = cv2.dct(blk)
            bit = bits[idx % len(bits)]
            c = d[_COEFF]
            # QIM: snap to even/odd multiples of _Q
            q = np.round(c / _Q)
            if (int(q) & 1) != int(bit):
                q += 1 if c / _Q - q >= 0 else -1
            d[_COEFF] = q * _Q
            ll[by * _BLOCK:(by + 1) * _BLOCK, bx * _BLOCK:(bx + 1) * _BLOCK] = cv2.idct(d)
            idx += 1
    yuv[:, :, 0] = np.clip(_haar_idwt2(ll, hvd), 0, 255)
    out = cv2.cvtColor(yuv.astype(np.uint8), cv2.COLOR_YUV2RGB)
    return out


def decode_watermark(img: np.ndarray, n_bytes: int = len(WATERMARK_PAYLOAD)
                     ) -> bytes:
    """Recover an n_bytes payload by majority vote over blocks."""
    import cv2

    n_bits = n_bytes * 8
    yuv = cv2.cvtColor(img, cv2.COLOR_RGB2YUV).astype(np.float32)
    ll, _ = _haar_dwt2(yuv[:, :, 0])
    H, W = ll.shape
    votes = np.zeros((n_bits, 2), np.int64)
    idx = 0
    for by in range(H // _BLOCK):
        for bx in range(W // _BLOCK):
            blk = ll[by * _BLOCK:(by + 1) * _BLOCK, bx * _BLOCK:(bx + 1) * _BLOCK]
            d = cv2.dct(blk)
            bit = int(np.round(d[_COEFF] / _Q)) & 1
            votes[idx % n_bits, bit] += 1
            idx += 1
    bits = (votes[:, 1] > votes[:, 0]).astype(np.uint8)
    return np.packbits(bits).tobytes()
