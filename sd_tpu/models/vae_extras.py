"""Auxiliary first-stage decoders/rescalers.

Rebuild of the remaining ``ldm/modules/diffusionmodules/model.py`` modules
(SURVEY.md §2.3 "extras"): SimpleDecoder (``:571``), UpsampleDecoder
(``:607``), LatentRescaler (``:655``), MergedRescaleEncoder/Decoder
(``:692,711``), Upsampler (``:728``), Resize (``:747``),
FirstStagePostProcessor (``:770``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.distributions import DiagonalGaussian
from sd_tpu.models.vae import Decoder, Encoder
from sd_tpu.ops.attention import VAEAttnBlock
from sd_tpu.ops.norms import GroupNorm32
from sd_tpu.ops.resblock import Upsample, VAEResnetBlock

__all__ = [
    "SimpleDecoder", "UpsampleDecoder", "LatentRescaler",
    "MergedRescaleEncoder", "MergedRescaleDecoder", "Upsampler", "resize",
    "FirstStagePostProcessor", "TimestepVAEModel", "port_timestep_model",
]


class SimpleDecoder(nn.Module):
    """1x1 -> 3 ResnetBlocks (widen/narrow) -> 1x1 -> Upsample -> out conv.
    Ref: ``model.py:571-604``."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        x = nn.Dense(c, dtype=self.dtype, name="conv_in")(x)
        x = VAEResnetBlock(in_channels=c, out_channels=2 * c, dtype=self.dtype,
                           name="block_1")(x)
        x = VAEResnetBlock(in_channels=2 * c, out_channels=4 * c, dtype=self.dtype,
                           name="block_2")(x)
        x = VAEResnetBlock(in_channels=4 * c, out_channels=2 * c, dtype=self.dtype,
                           name="block_3")(x)
        x = nn.Dense(c, dtype=self.dtype, name="conv_mid")(x)
        x = Upsample(channels=c, use_conv=True, dtype=self.dtype, name="upsample")(x)
        x = GroupNorm32(eps=1e-6, name="norm_out")(x)
        x = jax.nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class UpsampleDecoder(nn.Module):
    """Per-level ResnetBlocks + upsampling. Ref: ``model.py:607-652``."""

    in_channels: int
    out_channels: int
    ch: int
    num_res_blocks: int
    resolution: int
    ch_mult: Sequence[int] = (2, 2)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_in = self.in_channels
        for i_level in range(len(self.ch_mult)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                x = VAEResnetBlock(
                    in_channels=block_in if i_block == 0 else block_out,
                    out_channels=block_out, dropout=self.dropout,
                    dtype=self.dtype, name=f"res_{i_level}_{i_block}",
                )(x)
            block_in = block_out
            if i_level != len(self.ch_mult) - 1:
                x = Upsample(channels=block_in, use_conv=True, dtype=self.dtype,
                             name=f"upsample_{i_level}")(x)
        x = GroupNorm32(eps=1e-6, name="norm_out")(x)
        x = jax.nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class LatentRescaler(nn.Module):
    """conv -> resblocks -> interpolate(factor) -> attn -> resblocks -> 1x1.
    Ref: ``model.py:655-689``."""

    factor: float
    in_channels: int
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i in range(self.depth):
            x = VAEResnetBlock(in_channels=self.mid_channels, dtype=self.dtype,
                               name=f"res1_{i}")(x)
        b, h, w, c = x.shape
        nh = int(round(h * self.factor))
        nw = int(round(w * self.factor))
        x = jax.image.resize(x, (b, nh, nw, c), method="nearest")
        x = VAEAttnBlock(in_channels=self.mid_channels, dtype=self.dtype,
                         name="attn")(x)
        for i in range(self.depth):
            x = VAEResnetBlock(in_channels=self.mid_channels, dtype=self.dtype,
                               name=f"res2_{i}")(x)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="conv_out")(x)


class MergedRescaleEncoder(nn.Module):
    """Encoder (double_z=False) + LatentRescaler. Ref: ``model.py:692-708``."""

    in_channels: int
    ch: int
    resolution: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inter = self.ch * self.ch_mult[-1]
        x = Encoder(
            in_channels=self.in_channels, num_res_blocks=self.num_res_blocks,
            ch=self.ch, ch_mult=self.ch_mult, z_channels=inter, double_z=False,
            resolution=self.resolution, attn_resolutions=self.attn_resolutions,
            dropout=self.dropout, resamp_with_conv=self.resamp_with_conv,
            dtype=self.dtype, name="encoder",
        )(x)
        return LatentRescaler(
            factor=self.rescale_factor, in_channels=inter, mid_channels=inter,
            out_channels=self.out_ch, depth=self.rescale_module_depth,
            dtype=self.dtype, name="rescaler",
        )(x)


class MergedRescaleDecoder(nn.Module):
    """LatentRescaler + Decoder. Ref: ``model.py:711-725``."""

    z_channels: int
    out_ch: int
    resolution: int
    num_res_blocks: int
    attn_resolutions: Sequence[int] = ()
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        tmp = self.z_channels * self.ch_mult[-1]
        x = LatentRescaler(
            factor=self.rescale_factor, in_channels=self.z_channels,
            mid_channels=tmp, out_channels=tmp,
            depth=self.rescale_module_depth, dtype=self.dtype, name="rescaler",
        )(x)
        return Decoder(
            out_ch=self.out_ch, z_channels=tmp,
            attn_resolutions=self.attn_resolutions, dropout=self.dropout,
            resamp_with_conv=self.resamp_with_conv,
            num_res_blocks=self.num_res_blocks, ch_mult=self.ch_mult,
            resolution=self.resolution, ch=self.ch, dtype=self.dtype,
            name="decoder",
        )(x)


class Upsampler(nn.Module):
    """LatentRescaler + Decoder stack doubling in_size to out_size.
    Ref: ``model.py:728-744``."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.out_size >= self.in_size
        num_blocks = int(np.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        x = LatentRescaler(
            factor=factor_up, in_channels=self.in_channels,
            mid_channels=2 * self.in_channels, out_channels=self.in_channels,
            dtype=self.dtype, name="rescaler",
        )(x)
        return Decoder(
            out_ch=self.out_channels, resolution=self.out_size,
            z_channels=self.in_channels, num_res_blocks=2, attn_resolutions=[],
            ch=self.in_channels, ch_mult=[self.ch_mult] * num_blocks,
            dtype=self.dtype, name="decoder",
        )(x)


def resize(x, scale_factor: float = 1.0, mode: str = "bilinear"):
    """Functional Resize (``model.py:747-765``; the learned path was
    NotImplemented in the reference too)."""
    if scale_factor == 1.0:
        return x
    b, h, w, c = x.shape
    return jax.image.resize(
        x, (b, int(h * scale_factor), int(w * scale_factor), c), method=mode
    )


class FirstStagePostProcessor(nn.Module):
    """Project + downsample a frozen first stage's latents into conditioning
    features. Ref: ``model.py:770-835``. The pretrained model/params are
    bound at call time (functional style) rather than owned as a submodule.
    """

    ch_mult: Sequence[int]
    in_channels: int
    n_channels: int
    reshape: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_fs):
        """z_fs: the frozen first stage's encoding (mode() for KL stages,
        computed by the caller — encode_with_pretrained, ``model.py:816-821``)."""
        if isinstance(z_fs, DiagonalGaussian):
            z_fs = z_fs.mode()
        z = GroupNorm32(num_groups=self.in_channels // 2, eps=1e-6,
                        name="proj_norm")(z_fs)
        z = nn.Conv(self.n_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="proj")(z)
        z = jax.nn.silu(z)
        ch_in = self.n_channels
        for i, m in enumerate(self.ch_mult):
            z = VAEResnetBlock(in_channels=ch_in, out_channels=m * self.n_channels,
                               dropout=self.dropout, dtype=self.dtype,
                               name=f"block_{i}")(z)
            ch_in = m * self.n_channels
            z = nn.avg_pool(z, (2, 2), strides=(2, 2))  # Downsample(with_conv=False)
        if self.reshape:
            b, h, w, c = z.shape
            z = z.reshape(b, h * w, c)
        return z


def _vae_timestep_embedding(t, dim: int):
    """``get_timestep_embedding`` (``model.py:13-31``): tensor2tensor flavor
    — ``half_dim - 1`` frequency denominator and sin-FIRST concat, unlike
    the UNet's ``util.timestep_embedding`` (cos-first, ``/half``)."""
    import math

    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * -(math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepVAEModel(nn.Module):
    """Timestep-conditioned encoder-decoder with UNet skips.

    Ref: ``ldm/modules/diffusionmodules/model.py:216-365`` (``Model``) — the
    first-stage-family denoiser: the VAE encoder/decoder topology plus a
    timestep embedding fed to every ResnetBlock and concat skip connections
    from every encoder stage to the decoder (num_res_blocks+1 up blocks per
    level). No shipped config instantiates it; kept for API completeness.
    ``context`` concatenates along channels before conv_in (``:321-324``).
    """

    ch: int
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    use_timestep: bool = True
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None, context=None, deterministic: bool = True):
        from sd_tpu.models.vae import _make_attn
        from sd_tpu.ops.conv import Conv3x3
        from sd_tpu.ops.resblock import Downsample

        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        temb_ch = 4 * self.ch
        temb = None
        if self.use_timestep:
            assert t is not None, "use_timestep model needs t"
            temb = _vae_timestep_embedding(t, self.ch)
            temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense_0")(
                temb.astype(self.dtype))
            temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense_1")(
                jax.nn.silu(temb))

        num_resolutions = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        curr_res = self.resolution
        hs = [Conv3x3(self.ch, dtype=self.dtype, name="conv_in")(x)]
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                block_in = self.ch * (in_ch_mult[i_level] if i_block == 0
                                      else self.ch_mult[i_level])
                h = VAEResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    temb_channels=temb_ch if temb is not None else 0,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(block_out, self.attn_type, self.dtype,
                                   name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(Downsample(
                    channels=block_out, use_conv=self.resamp_with_conv,
                    asymmetric_pad=True, dtype=self.dtype,
                    name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        block_in = self.ch * self.ch_mult[-1]
        h = VAEResnetBlock(in_channels=block_in, temb_channels=temb_ch,
                           dropout=self.dropout, dtype=self.dtype,
                           name="mid_block_1")(hs[-1], temb,
                                               deterministic=deterministic)
        h = _make_attn(block_in, self.attn_type, self.dtype,
                       name="mid_attn_1")(h)
        h = VAEResnetBlock(in_channels=block_in, temb_channels=temb_ch,
                           dropout=self.dropout, dtype=self.dtype,
                           name="mid_block_2")(h, temb,
                                               deterministic=deterministic)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                skip_in = self.ch * (in_ch_mult[i_level]
                                     if i_block == self.num_res_blocks
                                     else self.ch_mult[i_level])
                h = VAEResnetBlock(
                    in_channels=h.shape[-1] + skip_in, out_channels=block_out,
                    temb_channels=temb_ch if temb is not None else 0,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                  deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(block_out, self.attn_type, self.dtype,
                                   name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(channels=block_out,
                             use_conv=self.resamp_with_conv,
                             dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        return Conv3x3(self.out_ch, dtype=self.dtype, name="conv_out")(h)


def port_timestep_model(sd, cfg, prefix: str = ""):
    """Port reference ``Model`` weights (``model.py:216-318``) into
    ``TimestepVAEModel``'s param tree."""
    from sd_tpu.models.vae import _port_vae_attn, _port_vae_resblock
    from sd_tpu.utils import port

    pre = f"{prefix}." if prefix else ""
    ch_mult = tuple(cfg["ch_mult"])
    nrb = cfg["num_res_blocks"]
    attn_res = set(cfg.get("attn_resolutions", ()))
    num_res = len(ch_mult)

    params = {
        "conv_in": port.conv(sd, f"{pre}conv_in"),
        "conv_out": port.conv(sd, f"{pre}conv_out"),
        "norm_out": {"GroupNorm_0": port.norm(sd, f"{pre}norm_out")},
        "mid_block_1": _port_vae_resblock(sd, f"{pre}mid.block_1", 0, 0),
        "mid_attn_1": _port_vae_attn(sd, f"{pre}mid.attn_1"),
        "mid_block_2": _port_vae_resblock(sd, f"{pre}mid.block_2", 0, 0),
    }
    if f"{pre}temb.dense.0.weight" in sd:
        params["temb_dense_0"] = port.dense(sd, f"{pre}temb.dense.0")
        params["temb_dense_1"] = port.dense(sd, f"{pre}temb.dense.1")
    curr_res = cfg["resolution"]
    for i in range(num_res):
        for j in range(nrb):
            params[f"down_{i}_block_{j}"] = _port_vae_resblock(
                sd, f"{pre}down.{i}.block.{j}", 0, 0)
            if curr_res in attn_res:
                params[f"down_{i}_attn_{j}"] = _port_vae_attn(
                    sd, f"{pre}down.{i}.attn.{j}")
        if i != num_res - 1:
            params[f"down_{i}_downsample"] = {
                "conv": port.conv(sd, f"{pre}down.{i}.downsample.conv")}
            curr_res //= 2
    for i in reversed(range(num_res)):
        for j in range(nrb + 1):
            params[f"up_{i}_block_{j}"] = _port_vae_resblock(
                sd, f"{pre}up.{i}.block.{j}", 0, 0)
            if curr_res in attn_res:
                params[f"up_{i}_attn_{j}"] = _port_vae_attn(
                    sd, f"{pre}up.{i}.attn.{j}")
        if i != 0:
            params[f"up_{i}_upsample"] = {
                "conv": port.conv(sd, f"{pre}up.{i}.upsample.conv")}
            curr_res *= 2
    return params
