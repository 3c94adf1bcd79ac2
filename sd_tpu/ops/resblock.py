"""Residual blocks and resampling layers (NHWC, TPU layout).

Covers both resblock families in the reference:
- UNet ``ResBlock`` (``ldm/modules/diffusionmodules/openaimodel.py:163-275``)
  with timestep-embedding injection (add or FiLM scale-shift) and optional
  in-block up/downsampling.
- VAE ``ResnetBlock`` (``ldm/modules/diffusionmodules/model.py:82-141``) with
  optional temb and 1x1/3x3 shortcut.
- ``Upsample``/``Downsample`` for both stacks (``openaimodel.py:92-160``,
  ``model.py:42-80`` — note the VAE downsample's asymmetric (0,1)x(0,1) pad).

All convs are 3x3 NHWC (HWIO kernels). GroupNorm+SiLU prologues are left
for XLA to fuse into the conv input read; the stride-1 3x3 convs themselves
go through ``Conv3x3`` (``sd_tpu/ops/conv.py``), which dispatches to the
Winograd F(2x2,3x3) Pallas kernel on TPU where measured faster and is an
exact ``nn.Conv`` drop-in (same param tree) everywhere else.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sd_tpu.ops.conv import Conv3x3
from sd_tpu.ops.norms import GroupNorm32

__all__ = ["Upsample", "Downsample", "ResBlock", "VAEResnetBlock"]

zeros_init = nn.initializers.zeros_init()


def nearest_upsample_2x(x):
    """Nearest-neighbour 2x upsample on [B, H, W, C]."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


class Upsample(nn.Module):
    """Nearest x2 upsample + optional 3x3 conv. Ref: ``openaimodel.py:92-117``."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = Conv3x3(self.out_channels or self.channels,
                        dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv (or 2x2 avg-pool) downsample.

    Ref: ``openaimodel.py:134-160``; with ``asymmetric_pad=True`` it is the
    VAE variant (``model.py:60-80``): pad (0,1) on H and W, VALID conv.
    """

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            if self.asymmetric_pad:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                padding = "VALID"
            else:
                padding = 1
            return nn.Conv(
                self.out_channels or self.channels, (3, 3), strides=(2, 2),
                padding=padding, dtype=self.dtype, name="conv",
            )(x)
        assert (self.out_channels or self.channels) == self.channels
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """UNet residual block with timestep-embedding injection.

    GroupNorm->SiLU->conv, emb added (or FiLM scale-shift), GroupNorm->SiLU->
    dropout->zero-init conv, + skip (identity / 1x1 / 3x3). Optional
    in-block resampling (``up``/``down``) applied between the first norm-act
    and conv, to both branch and skip — exactly the reference's structure
    (``openaimodel.py:254-275``).
    """

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_conv: bool = False           # 3x3 skip instead of 1x1 when resizing
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        h = GroupNorm32(name="in_norm")(x)
        h = jax.nn.silu(h)
        if self.up:
            h = nearest_upsample_2x(h)
            x = nearest_upsample_2x(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = Conv3x3(out_ch, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_proj",
        )(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv3x3(out_ch, dtype=self.dtype, kernel_init=zeros_init,
                    name="out_conv")(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = Conv3x3(out_ch, dtype=self.dtype, name="skip")(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return skip + h


class VAEResnetBlock(nn.Module):
    """Autoencoder residual block. Ref: ``model.py:82-141``.

    eps=1e-6 GroupNorm, swish, optional temb projection added after conv1,
    1x1 (``nin_shortcut``) or 3x3 (``conv_shortcut``) skip on channel change.
    """

    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    temb_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels

        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = jax.nn.silu(h)
        h = Conv3x3(out_ch, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            h = h + nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(
                jax.nn.silu(temb)
            )[:, None, None, :]

        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv3x3(out_ch, dtype=self.dtype, name="conv2")(h)

        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h
