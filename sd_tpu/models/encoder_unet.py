"""EncoderUNetModel — half-UNet classifier trunk.

Rebuild of ``ldm/modules/diffusionmodules/openaimodel.py:745-961``: the UNet
input stack + middle block with a pooling head (adaptive average / attention
pool / spatial feature concat), used by the noisy-latent classifier for
classifier-guidance training (SURVEY.md §2.2/§2.6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import timestep_embedding
from sd_tpu.models.unet import UNetConfig, _head_config
from sd_tpu.ops.attention import AttentionPool2d, QKVAttentionBlock
from sd_tpu.ops.norms import GroupNorm32
from sd_tpu.ops.resblock import Downsample, ResBlock

__all__ = ["EncoderUNetConfig", "EncoderUNetModel"]


@dataclasses.dataclass(frozen=True)
class EncoderUNetConfig:
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    image_size: int = 64
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    pool: str = "adaptive"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "EncoderUNetConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items()
                      if k in names and k not in ("use_fp16", "dims")})


class EncoderUNetModel(nn.Module):
    """(x [B,H,W,C], t [B]) -> logits [B, out_channels]."""

    config: EncoderUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps):
        cfg = self.config
        emb_ch = 4 * cfg.model_channels
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(emb_ch, dtype=self.dtype, name="time_embed_0")(
            t_emb.astype(self.dtype))
        emb = nn.Dense(emb_ch, dtype=self.dtype, name="time_embed_2")(
            jax.nn.silu(emb))

        def attn(ch, name):
            heads = cfg.num_heads if cfg.num_head_channels == -1 else ch // cfg.num_head_channels
            return QKVAttentionBlock(
                channels=ch, num_heads=heads,
                num_head_channels=cfg.num_head_channels,
                use_new_attention_order=cfg.use_new_attention_order,
                dtype=self.dtype, name=name,
            )

        spatial = cfg.pool.startswith("spatial")
        results = []
        h = x.astype(self.dtype)
        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="input_blocks_0_0")(h)
        if spatial:
            results.append(h.mean(axis=(1, 2)))

        ch = cfg.model_channels
        ds = 1
        idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                out_ch = mult * cfg.model_channels
                h = ResBlock(channels=ch, emb_channels=emb_ch, dropout=cfg.dropout,
                             out_channels=out_ch,
                             use_scale_shift_norm=cfg.use_scale_shift_norm,
                             dtype=self.dtype, name=f"input_blocks_{idx}_0")(h, emb)
                ch = out_ch
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"input_blocks_{idx}_1")(h)
                if spatial:
                    results.append(h.mean(axis=(1, 2)))
                idx += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlock(channels=ch, emb_channels=emb_ch,
                                 dropout=cfg.dropout, down=True, dtype=self.dtype,
                                 name=f"input_blocks_{idx}_0")(h, emb)
                else:
                    h = Downsample(channels=ch, use_conv=cfg.conv_resample,
                                   dtype=self.dtype,
                                   name=f"input_blocks_{idx}_0")(h)
                ds *= 2
                if spatial:
                    results.append(h.mean(axis=(1, 2)))
                idx += 1

        h = ResBlock(channels=ch, emb_channels=emb_ch, dropout=cfg.dropout,
                     use_scale_shift_norm=cfg.use_scale_shift_norm,
                     dtype=self.dtype, name="middle_block_0")(h, emb)
        h = attn(ch, "middle_block_1")(h)
        h = ResBlock(channels=ch, emb_channels=emb_ch, dropout=cfg.dropout,
                     use_scale_shift_norm=cfg.use_scale_shift_norm,
                     dtype=self.dtype, name="middle_block_2")(h, emb)

        if cfg.pool == "adaptive":
            h = GroupNorm32(name="out_norm")(h)
            h = jax.nn.silu(h)
            h = h.mean(axis=(1, 2), keepdims=True)  # adaptive avg pool to 1x1
            h = nn.Conv(cfg.out_channels, (1, 1), dtype=self.dtype,
                        name="out_conv")(h)
            return h.reshape(h.shape[0], -1)
        if cfg.pool == "attention":
            h = GroupNorm32(name="out_norm")(h)
            h = jax.nn.silu(h)
            return AttentionPool2d(
                spacial_dim=cfg.image_size // ds, embed_dim=ch,
                num_heads_channels=max(cfg.num_head_channels, 1),
                output_dim=cfg.out_channels, dtype=self.dtype, name="out_pool",
            )(h)
        if spatial:
            results.append(h.mean(axis=(1, 2)))
            feats = jnp.concatenate(results, axis=-1)
            feats = nn.Dense(2048, dtype=self.dtype, name="out_fc1")(feats)
            if cfg.pool == "spatial_v2":
                feats = GroupNorm32(name="out_norm")(feats[:, None, None, :])[:, 0, 0]
                feats = jax.nn.silu(feats)
            else:
                feats = jax.nn.relu(feats)
            return nn.Dense(cfg.out_channels, dtype=self.dtype, name="out_fc2")(feats)
        raise NotImplementedError(cfg.pool)
