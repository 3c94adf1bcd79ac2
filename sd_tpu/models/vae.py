"""First-stage autoencoders: KL-VAE and VQ-VAE (NHWC, functional apply).

TPU-native rebuild of the reference's first-stage zoo (SURVEY.md §2.3):
- ``Encoder``/``Decoder`` conv ResNets with mid-block attention
  (``ldm/modules/diffusionmodules/model.py:368-459,462-568``),
- ``AutoencoderKL`` (``ldm/models/autoencoder.py:285-423``),
- ``VQModel``/``VQModelInterface`` (``autoencoder.py:14-282``) with the
  vector quantizer **reimplemented in-repo** (the reference imports it from
  taming-transformers; SURVEY.md §2.9 requires owning it),
- ``IdentityFirstStage`` (``autoencoder.py:426-443``).

Models are flax modules; training-time behavior (GAN losses, two-optimizer
step) lives in ``sd_tpu/training`` — here is pure compute.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.distributions import DiagonalGaussian
from sd_tpu.ops.attention import LinearAttention, VAEAttnBlock
from sd_tpu.ops.norms import GroupNorm32
from sd_tpu.ops.conv import Conv3x3
from sd_tpu.ops.resblock import Downsample, Upsample, VAEResnetBlock
from sd_tpu.utils import port

__all__ = [
    "Encoder",
    "Decoder",
    "AutoencoderKL",
    "VectorQuantizer",
    "VQModel",
    "IdentityFirstStage",
    "port_autoencoder_kl",
    "port_vq_model",
]


def _make_attn(channels: int, attn_type: str, dtype, name: str):
    if attn_type == "vanilla":
        return VAEAttnBlock(in_channels=channels, dtype=dtype, name=name)
    if attn_type == "linear":
        return LinearAttention(dim=channels, heads=1, dim_head=channels, dtype=dtype, name=name)
    if attn_type == "none":
        return lambda x: x
    raise ValueError(f"attn_type {attn_type} unknown")


class Encoder(nn.Module):
    """Conv ResNet encoder. Ref: ``model.py:368-459``.

    Input ``[B, H, W, in_channels]`` -> moments ``[B, H/f, W/f, (2)z_channels]``.
    """

    ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_resolutions = len(self.ch_mult)
        curr_res = self.resolution
        h = Conv3x3(self.ch, dtype=self.dtype, name="conv_in")(x)

        in_ch_mult = (1,) + tuple(self.ch_mult)
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                block_in = self.ch * (in_ch_mult[i_level] if i_block == 0 else self.ch_mult[i_level])
                h = VAEResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(block_out, self.attn_type, self.dtype,
                                   name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_resolutions - 1:
                h = Downsample(
                    channels=block_out, use_conv=self.resamp_with_conv,
                    asymmetric_pad=True, dtype=self.dtype,
                    name=f"down_{i_level}_downsample",
                )(h)
                curr_res //= 2

        block_in = self.ch * self.ch_mult[-1]
        h = VAEResnetBlock(in_channels=block_in, dropout=self.dropout,
                           dtype=self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = _make_attn(block_in, self.attn_type, self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(in_channels=block_in, dropout=self.dropout,
                           dtype=self.dtype, name="mid_block_2")(h, deterministic=deterministic)

        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv3x3(out_ch, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """Conv ResNet decoder. Ref: ``model.py:462-568``."""

    ch: int
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    z_channels: int = 4
    give_pre_end: bool = False
    tanh_out: bool = False
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        h = Conv3x3(block_in, dtype=self.dtype, name="conv_in")(z)

        h = VAEResnetBlock(in_channels=block_in, dropout=self.dropout,
                           dtype=self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = _make_attn(block_in, self.attn_type, self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(in_channels=block_in, dropout=self.dropout,
                           dtype=self.dtype, name="mid_block_2")(h, deterministic=deterministic)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(
                    in_channels=block_in if i_block == 0 else block_out,
                    out_channels=block_out, dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = _make_attn(block_out, self.attn_type, self.dtype,
                                   name=f"up_{i_level}_attn_{i_block}")(h)
            block_in = block_out
            if i_level != 0:
                h = Upsample(channels=block_in, use_conv=self.resamp_with_conv,
                             dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        h = Conv3x3(self.out_ch, dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


def _resolve_attn_type(dd: Dict[str, Any]) -> str:
    # Ref: model.py:373,469 — use_linear_attn forces attn_type="linear".
    if dd.get("use_linear_attn", False):
        return "linear"
    return dd.get("attn_type", "vanilla")


def _filter_fields(module_cls, dd: Dict[str, Any]) -> Dict[str, Any]:
    import dataclasses

    names = {f.name for f in dataclasses.fields(module_cls)}
    return {k: v for k, v in dd.items() if k in names}


def _build_encoder(ddconfig: Dict[str, Any], dtype) -> "Encoder":
    kw = _filter_fields(Encoder, ddconfig)
    kw.update(attn_type=_resolve_attn_type(ddconfig), dtype=dtype)
    return Encoder(name="encoder", **kw)


def _build_decoder(ddconfig: Dict[str, Any], dtype) -> "Decoder":
    kw = _filter_fields(Decoder, ddconfig)
    kw.update(attn_type=_resolve_attn_type(ddconfig), dtype=dtype)
    return Decoder(name="decoder", **kw)


class AutoencoderKL(nn.Module):
    """KL-regularized VAE. Ref: ``ldm/models/autoencoder.py:285-423``.

    ``encode`` returns a :class:`DiagonalGaussian`; ``decode`` maps latents
    back to images. 1x1 (post_)quant convs are Dense on NHWC.
    """

    ddconfig: Dict[str, Any]
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = _build_encoder(self.ddconfig, self.dtype)
        self.decoder = _build_decoder(self.ddconfig, self.dtype)
        assert self.ddconfig.get("double_z", True), "AutoencoderKL requires double_z"
        self.quant_conv = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Dense(self.ddconfig["z_channels"], dtype=self.dtype,
                                        name="post_quant_conv")

    def encode(self, x, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic=deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z, deterministic: bool = True):
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic=deterministic)

    def __call__(self, x, rng=None, sample_posterior: bool = True,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        # rng=None (e.g. during .init) degrades to the posterior mode.
        if sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior


class VectorQuantizer(nn.Module):
    """VQ codebook with straight-through estimator.

    In-repo replacement for taming-transformers' ``VectorQuantizer2``
    (imported by the reference at ``autoencoder.py:6``): nearest-codebook
    assignment via argmin of squared distances, commitment loss
    ``beta * ||z - sg(e)||^2 + ||sg(z) - e||^2``, straight-through gradients.
    The distance computation is a single MXU matmul (|z|^2 + |e|^2 - 2 z.e).
    """

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        # z: [B, H, W, C] with C == embed_dim (NHWC - no permute needed,
        # unlike the torch version's NCHW rearranges)
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
        )
        # (init matches taming's U(-1/n, 1/n) up to centering; ported
        # checkpoints overwrite it anyway)
        flat = z.reshape(-1, self.embed_dim)
        z32 = flat.astype(jnp.float32)
        cb32 = codebook.astype(jnp.float32)
        d = (
            jnp.sum(z32**2, axis=1, keepdims=True)
            + jnp.sum(cb32**2, axis=1)[None, :]
            - 2.0 * z32 @ cb32.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape).astype(z.dtype)

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        # straight-through
        z_q = z + jax.lax.stop_gradient(z_q - z)
        idx = idx.reshape(z.shape[:-1])
        return z_q, loss, idx

    def lookup(self, params, idx):
        codebook = params["embedding"]
        return codebook[idx]


class VQModel(nn.Module):
    """VQ-VAE first stage. Ref: ``autoencoder.py:14-282``.

    ``encode`` quantizes; ``encode_pre_quant``/``decode(force_not_quantize)``
    reproduce ``VQModelInterface`` (``autoencoder.py:264-282``), which lets
    latent diffusion operate on continuous pre-quant latents and quantize at
    decode time.
    """

    ddconfig: Dict[str, Any]
    n_embed: int
    embed_dim: int
    beta: float = 0.25
    dtype: jnp.dtype = jnp.float32
    # training-input augment (autoencoder.py:25,49-58,129-139): per-batch
    # random resize to a multiple of 16 in [lo, hi]; applied HOST-side by
    # training/vae_gan.py::BatchResizeWrapper (a device-side dynamic resize
    # would recompile per size on TPU)
    batch_resize_range: Optional[Tuple[int, int]] = None

    def setup(self):
        self.encoder = _build_encoder(self.ddconfig, self.dtype)
        self.decoder = _build_decoder(self.ddconfig, self.dtype)
        self.quantize = VectorQuantizer(n_embed=self.n_embed, embed_dim=self.embed_dim,
                                        beta=self.beta)
        self.quant_conv = nn.Dense(self.embed_dim, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Dense(self.ddconfig["z_channels"], dtype=self.dtype,
                                        name="post_quant_conv")

    def encode_pre_quant(self, x, deterministic: bool = True):
        """Continuous latent before quantization (VQModelInterface.encode)."""
        h = self.encoder(x, deterministic=deterministic)
        return self.quant_conv(h)

    def encode(self, x, deterministic: bool = True):
        h = self.encode_pre_quant(x, deterministic=deterministic)
        return self.quantize(h)

    def quantize_latent(self, z):
        """Quantize a continuous latent (samplers' quantize_denoised hook)."""
        return self.quantize(z)

    def decode(self, z, force_not_quantize: bool = False, deterministic: bool = True):
        if not force_not_quantize:
            z, _, _ = self.quantize(z)
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic=deterministic)

    def decode_code(self, code):
        z_q = self.quantize.lookup(self.variables["params"]["quantize"], code)
        return self.decode(z_q, force_not_quantize=True)

    def __call__(self, x, deterministic: bool = True):
        quant, diff, idx = self.encode(x, deterministic=deterministic)
        dec = self.decode(quant, force_not_quantize=True, deterministic=deterministic)
        return dec, diff, idx


class IdentityFirstStage:
    """No-op first stage for pixel-space diffusion. Ref: ``autoencoder.py:426-443``."""

    def encode(self, x, *a, **k):
        return x

    def decode(self, x, *a, **k):
        return x

    def __call__(self, x, *a, **k):
        return x


# --------------------------------------------------------------------------
# Weight port: reference torch state_dicts -> these modules' param pytrees
# --------------------------------------------------------------------------


def _port_vae_resblock(sd, prefix, in_ch, out_ch):
    p = {
        "norm1": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm1")},
        "conv1": port.conv(sd, f"{prefix}.conv1"),
        "norm2": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm2")},
        "conv2": port.conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = port.conv(sd, f"{prefix}.nin_shortcut")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = port.conv(sd, f"{prefix}.conv_shortcut")
    if f"{prefix}.temb_proj.weight" in sd:
        p["temb_proj"] = port.dense(sd, f"{prefix}.temb_proj")
    return p


def _port_vae_attn(sd, prefix):
    return {
        "norm": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm")},
        "q": port.dense_from_conv1x1(sd, f"{prefix}.q"),
        "k": port.dense_from_conv1x1(sd, f"{prefix}.k"),
        "v": port.dense_from_conv1x1(sd, f"{prefix}.v"),
        "proj_out": port.dense_from_conv1x1(sd, f"{prefix}.proj_out"),
    }


def port_encoder(sd, ddconfig: Dict[str, Any], prefix: str = "encoder") -> Dict:
    """Port reference ``Encoder`` weights (``model.py:368-459``)."""
    ch = ddconfig["ch"]
    ch_mult = tuple(ddconfig["ch_mult"])
    nrb = ddconfig["num_res_blocks"]
    attn_res = set(ddconfig.get("attn_resolutions", ()))
    resolution = ddconfig["resolution"]

    params: Dict[str, Any] = {
        "conv_in": port.conv(sd, f"{prefix}.conv_in"),
        "conv_out": port.conv(sd, f"{prefix}.conv_out"),
        "norm_out": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm_out")},
        "mid_block_1": _port_vae_resblock(sd, f"{prefix}.mid.block_1", 0, 0),
        "mid_attn_1": _port_vae_attn(sd, f"{prefix}.mid.attn_1"),
        "mid_block_2": _port_vae_resblock(sd, f"{prefix}.mid.block_2", 0, 0),
    }
    curr_res = resolution
    for i in range(len(ch_mult)):
        for j in range(nrb):
            params[f"down_{i}_block_{j}"] = _port_vae_resblock(
                sd, f"{prefix}.down.{i}.block.{j}", 0, 0
            )
            if curr_res in attn_res:
                params[f"down_{i}_attn_{j}"] = _port_vae_attn(
                    sd, f"{prefix}.down.{i}.attn.{j}"
                )
        if i != len(ch_mult) - 1:
            params[f"down_{i}_downsample"] = {
                "conv": port.conv(sd, f"{prefix}.down.{i}.downsample.conv")
            }
            curr_res //= 2
    return params


def port_decoder(sd, ddconfig: Dict[str, Any], prefix: str = "decoder") -> Dict:
    """Port reference ``Decoder`` weights (``model.py:462-568``)."""
    ch_mult = tuple(ddconfig["ch_mult"])
    nrb = ddconfig["num_res_blocks"]
    attn_res = set(ddconfig.get("attn_resolutions", ()))
    resolution = ddconfig["resolution"]
    num_res = len(ch_mult)

    params: Dict[str, Any] = {
        "conv_in": port.conv(sd, f"{prefix}.conv_in"),
        "conv_out": port.conv(sd, f"{prefix}.conv_out"),
        "norm_out": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm_out")},
        "mid_block_1": _port_vae_resblock(sd, f"{prefix}.mid.block_1", 0, 0),
        "mid_attn_1": _port_vae_attn(sd, f"{prefix}.mid.attn_1"),
        "mid_block_2": _port_vae_resblock(sd, f"{prefix}.mid.block_2", 0, 0),
    }
    curr_res = resolution // 2 ** (num_res - 1)
    for i in reversed(range(num_res)):
        for j in range(nrb + 1):
            params[f"up_{i}_block_{j}"] = _port_vae_resblock(
                sd, f"{prefix}.up.{i}.block.{j}", 0, 0
            )
            if curr_res in attn_res:
                params[f"up_{i}_attn_{j}"] = _port_vae_attn(sd, f"{prefix}.up.{i}.attn.{j}")
        if i != 0:
            params[f"up_{i}_upsample"] = {
                "conv": port.conv(sd, f"{prefix}.up.{i}.upsample.conv")
            }
            curr_res *= 2
    return params


def port_autoencoder_kl(sd, ddconfig: Dict[str, Any], prefix: str = "") -> Dict:
    """Port a full AutoencoderKL state_dict (``autoencoder.py:285-423``).

    ``prefix`` handles first-stage weights embedded in an LDM checkpoint
    (``first_stage_model.``) vs a standalone AE checkpoint ("").
    """
    p = lambda s: f"{prefix}{s}" if prefix else s
    return {
        "encoder": port_encoder(sd, ddconfig, p("encoder")),
        "decoder": port_decoder(sd, ddconfig, p("decoder")),
        "quant_conv": port.dense_from_conv1x1(sd, p("quant_conv")),
        "post_quant_conv": port.dense_from_conv1x1(sd, p("post_quant_conv")),
    }


def port_vq_model(sd, ddconfig: Dict[str, Any], prefix: str = "") -> Dict:
    """Port a VQModel state_dict incl. the taming quantizer codebook."""
    p = lambda s: f"{prefix}{s}" if prefix else s
    return {
        "encoder": port_encoder(sd, ddconfig, p("encoder")),
        "decoder": port_decoder(sd, ddconfig, p("decoder")),
        "quant_conv": port.dense_from_conv1x1(sd, p("quant_conv")),
        "post_quant_conv": port.dense_from_conv1x1(sd, p("post_quant_conv")),
        "quantize": {"embedding": port.to_numpy(sd[p("quantize.embedding.weight")])},
    }
