"""Tiled (sliding-window) model application for large canvases.

Rebuild of the reference's fold/unfold "split_input_params" machinery
(``ddpm.py:571-651``, applied in encode/decode/apply_model at
``ddpm.py:715-757,825-858,902-984``; activated by ``notebook_helpers.py:
148-161`` for >=128² SR inputs): overlapping ks x ks patches, per-patch model
application, border-distance-weighted stitching with fold normalization.

TPU-first shape: patch extraction/stitching are pure gather/scatter-adds
(jit-friendly, static patch grid); per-patch model calls batch along a new
leading axis — one big batched call instead of the reference's python loop —
and that axis is the natural multi-chip seam (shard it over the mesh's data
axis to denoise a large canvas across chips; SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tiling_weights", "extract_patches", "fold_patches", "tiled_apply"]


def _grid_starts(size: int, ks: int, stride: int) -> np.ndarray:
    """Patch start offsets covering [0, size) with overlap; final patch is
    right-aligned so the canvas is fully covered."""
    if size <= ks:
        return np.array([0])
    starts = list(range(0, size - ks + 1, stride))
    if starts[-1] != size - ks:
        starts.append(size - ks)
    return np.asarray(starts)


def tiling_weights(ks: int, clip_min: float = 0.01, clip_max: float = 0.5
                   ) -> np.ndarray:
    """Border-distance weighting for seamless stitching.

    Ref: ``ddpm.py:571-599`` (``delta_border`` + ``get_weighting``): weight of
    a pixel = its normalized L-inf distance to the patch border, clipped.
    """
    ys = np.arange(ks) + 0.5
    d = np.minimum(ys, ks - ys) / ks        # distance to nearest h border
    w2d = np.minimum(d[:, None], d[None, :])
    return np.clip(w2d, clip_min, clip_max).astype(np.float32)


def extract_patches(x, ks: int, stride: int):
    """[B, H, W, C] -> ([B, P, ks, ks, C], starts_y, starts_x)."""
    b, h, w, c = x.shape
    sy = _grid_starts(h, ks, stride)
    sx = _grid_starts(w, ks, stride)
    patches = jnp.stack(
        [x[:, y:y + ks, xx:xx + ks, :] for y in sy for xx in sx], axis=1
    )
    return patches, sy, sx


def fold_patches(patches, out_hw: Tuple[int, int], ks: int, sy, sx,
                 clip_min: float = 0.01, clip_max: float = 0.5):
    """Weighted overlap-add + normalization (the reference's fold with
    weighting/norm, ``ddpm.py:634-651``)."""
    b, p, _, _, c = patches.shape
    h, w = out_hw
    weight = jnp.asarray(tiling_weights(ks, clip_min, clip_max))[None, :, :, None]
    out = jnp.zeros((b, h, w, c), patches.dtype)
    norm = jnp.zeros((b, h, w, 1), patches.dtype)
    i = 0
    for y in sy:
        for x in sx:
            out = out.at[:, y:y + ks, x:x + ks, :].add(patches[:, i] * weight)
            norm = norm.at[:, y:y + ks, x:x + ks, :].add(weight)
            i += 1
    return out / norm


def tiled_apply(fn: Callable, x, ks: int = 128, stride: int = 64,
                out_scale: float = 1, out_channels: Optional[int] = None,
                clip_min: float = 0.01, clip_max: float = 0.5,
                mesh=None, mesh_axis: str = "data"):
    """Apply ``fn`` ([N, ks, ks, C] -> [N, ks*s, ks*s, C']) over overlapping
    tiles of ``x`` and stitch. ``out_scale`` > 1 for decoders (upsampling),
    < 1 for encoders (e.g. 1/vqf — ks and stride must then be multiples of
    1/out_scale so tile geometry stays integral).

    ``mesh`` shards the flattened [B*P] patch axis over ``mesh_axis`` — the
    multi-chip big-canvas seam (SURVEY.md §5.7): each chip denoises its
    tiles, the weighted fold runs under GSPMD. The patch count need not
    divide the axis; GSPMD pads the final shard.
    """
    b, h, w, c = x.shape
    patches, sy, sx = extract_patches(x, ks, stride)
    p = patches.shape[1]
    flat = patches.reshape((b * p,) + patches.shape[2:])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(mesh_axis, *([None] * (flat.ndim - 1)))
        flat = jax.lax.with_sharding_constraint(
            flat, NamedSharding(mesh, spec))
    out_flat = fn(flat)
    oks = ks * out_scale
    oh, ow = h * out_scale, w * out_scale
    osy, osx = sy * out_scale, sx * out_scale
    for v in (oks, oh, ow):
        assert float(v).is_integer(), (ks, stride, out_scale)
    out_p = out_flat.reshape(b, p, int(oks), int(oks), -1)
    return fold_patches(
        out_p, (int(oh), int(ow)), int(oks),
        osy.astype(int) if hasattr(osy, "astype") else int(osy),
        osx.astype(int) if hasattr(osx, "astype") else int(osx),
        clip_min, clip_max,
    )
