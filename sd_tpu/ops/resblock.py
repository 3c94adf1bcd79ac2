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
from sd_tpu.ops.norms import GroupNorm32, group_stats
from sd_tpu.ops.pallas.fused_conv import (
    fold_gn_affine, fused_conv3x3, fused_conv_enabled, fused_conv_supported)

__all__ = ["Upsample", "Downsample", "ResBlock", "VAEResnetBlock"]

zeros_init = nn.initializers.zeros_init()


def _fused_pair_supported(x_shape, out_ch, dtype) -> bool:
    b, h, w, cin = x_shape
    return (fused_conv_supported(x_shape, (3, 3, cin, out_ch), dtype)
            and fused_conv_supported((b, h, w, out_ch),
                                     (3, 3, out_ch, out_ch), dtype))


def _second_gn_folds(s1, s2, hw, offset, num_groups):
    """Group stats of (h + offset) from per-channel moments of h.

    ``s1``/``s2`` are the fused kernel's per-channel sums over H,W of the
    bf16-rounded conv output h; ``offset`` [B, C] is whatever the kernel did
    NOT add (previous conv bias, timestep embedding). Exact in fp32:
    E[(h+o)^2] = E[h^2] + 2 o E[h] + o^2 per channel, then averaged over the
    group — identical math to computing GroupNorm stats on h+o directly.
    """
    b, c = s1.shape
    g = num_groups
    mean_c = s1 / hw
    meansq_c = s2 / hw
    e_c = mean_c + offset
    e2_c = meansq_c + 2.0 * offset * mean_c + jnp.square(offset)
    mean_g = e_c.reshape(b, g, c // g).mean(-1)
    meansq_g = e2_c.reshape(b, g, c // g).mean(-1)
    return mean_g, meansq_g


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
    conv_impl: str = "auto"          # fused-kernel dispatch: auto|off|force
    interpret: bool = False          # interpret-mode kernels (CPU tests)

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        if (not (self.up or self.down)
                and (deterministic or self.dropout == 0.0)
                and fused_conv_enabled(self.conv_impl, self.interpret)
                and _fused_pair_supported(x.shape, out_ch, x.dtype)):
            return self._fused(x, emb, out_ch)

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

    def _fused(self, x, emb, out_ch):
        """Both convs via the fused GN+SiLU+conv Pallas kernel.

        Same param tree as the standard path; the second GroupNorm's
        statistics come from the first kernel's per-channel moment outputs
        (no read of h), with the conv bias and timestep embedding folded in
        exactly (``_second_gn_folds``). Gradients recompute through the XLA
        composite (custom_vjp in ops/pallas/fused_conv.py).
        """
        eps = 1e-5
        g1s, g1b = GroupNorm32(name="in_norm")(x, affine_only=True)
        g2s, g2b = GroupNorm32(name="out_norm")(
            affine_only=True, features=out_ch)
        k1, b1 = Conv3x3(out_ch, dtype=self.dtype, name="in_conv",
                         params_only=True)(x)
        k2, b2 = Conv3x3(out_ch, dtype=self.dtype, kernel_init=zeros_init,
                         name="out_conv", params_only=True)(
            jnp.zeros((1, 1, 1, out_ch), x.dtype))
        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_proj")(jax.nn.silu(emb))

        m1, m2 = group_stats(x, 32)
        a1, d1 = fold_gn_affine(m1, m2, g1s, g1b, eps)
        h_raw, s1, s2 = fused_conv3x3(
            x, k1.astype(x.dtype), a=a1, d=d1, emit_moments=True,
            interpret=self.interpret)

        hw = x.shape[1] * x.shape[2]
        ef = emb_out.astype(jnp.float32)
        if self.use_scale_shift_norm:
            offset = jnp.broadcast_to(
                b1.astype(jnp.float32)[None, :], s1.shape)
            scale, shift = jnp.split(ef, 2, axis=-1)
            extra_scale, extra_shift = 1.0 + scale, shift
        else:
            offset = b1.astype(jnp.float32)[None, :] + ef
            extra_scale = extra_shift = None
        mg, m2g = _second_gn_folds(s1, s2, hw, offset, 32)
        a2, d2 = fold_gn_affine(mg, m2g, g2s, g2b, eps,
                                extra_scale=extra_scale,
                                channel_offset=offset,
                                extra_shift=extra_shift)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = Conv3x3(out_ch, dtype=self.dtype, name="skip")(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return fused_conv3x3(
            h_raw, k2.astype(x.dtype), a=a2, d=d2,
            bias=b2.astype(jnp.float32), skip=skip.astype(x.dtype),
            interpret=self.interpret)


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
    conv_impl: str = "auto"          # fused-kernel dispatch: auto|off|force
    interpret: bool = False

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels

        if ((deterministic or self.dropout == 0.0)
                and fused_conv_enabled(self.conv_impl, self.interpret)
                and _fused_pair_supported(x.shape, out_ch, x.dtype)):
            return self._fused(x, temb, out_ch)

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

    def _fused(self, x, temb, out_ch):
        """Fused-kernel path (see ResBlock._fused); eps=1e-6, temb add."""
        eps = 1e-6
        g1s, g1b = GroupNorm32(eps=eps, name="norm1")(x, affine_only=True)
        g2s, g2b = GroupNorm32(eps=eps, name="norm2")(
            affine_only=True, features=out_ch)
        k1, b1 = Conv3x3(out_ch, dtype=self.dtype, name="conv1",
                         params_only=True)(x)
        k2, b2 = Conv3x3(out_ch, dtype=self.dtype, name="conv2",
                         params_only=True)(jnp.zeros((1, 1, 1, out_ch),
                                                     x.dtype))

        m1, m2 = group_stats(x, 32)
        a1, d1 = fold_gn_affine(m1, m2, g1s, g1b, eps)
        h_raw, s1, s2 = fused_conv3x3(
            x, k1.astype(x.dtype), a=a1, d=d1, emit_moments=True,
            interpret=self.interpret)

        offset = b1.astype(jnp.float32)[None, :]
        if temb is not None:
            offset = offset + nn.Dense(
                out_ch, dtype=self.dtype, name="temb_proj")(
                jax.nn.silu(temb)).astype(jnp.float32)
        else:
            offset = jnp.broadcast_to(offset, s1.shape)
        hw = x.shape[1] * x.shape[2]
        mg, m2g = _second_gn_folds(s1, s2, hw, offset, 32)
        a2, d2 = fold_gn_affine(mg, m2g, g2s, g2b, eps,
                                channel_offset=offset)

        if self.in_channels != out_ch:
            if self.conv_shortcut:
                skip = Conv3x3(out_ch, dtype=self.dtype,
                               name="conv_shortcut")(x)
            else:
                skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                               name="nin_shortcut")(x)
        else:
            skip = x
        return fused_conv3x3(
            h_raw, k2.astype(x.dtype), a=a2, d=d2,
            bias=b2.astype(jnp.float32), skip=skip.astype(x.dtype),
            interpret=self.interpret)
