"""The diffusion UNet backbone (NHWC, flax).

TPU-native rebuild of the reference ``UNetModel``
(``ldm/modules/diffusionmodules/openaimodel.py:413-742``): time-conditioned
UNet with input/middle/output stacks, attention (legacy QKV blocks or
SpatialTransformer with cross-attention) at selected downsample rates,
optional class embedding, optional codebook-id prediction head, FiLM
scale-shift norm, resblock up/downsampling.

Design: a single **block plan** (:func:`build_unet_plan`) describes every
layer both for the flax module and for the torch weight porter
(:func:`port_unet`), so the two can never disagree. The plan also replicates
the reference's head-dim selection quirks exactly (``openaimodel.py:540-549,
594-600,645-653`` incl. the ``legacy`` branch) — required for checkpoint
parity (SURVEY.md §7.2 item 1).

Remat: with ``use_checkpoint=True`` every ResBlock/attention application is
wrapped in ``jax.checkpoint`` (the reference's custom ``CheckpointFunction``,
``diffusionmodules/util.py:119-148``, is torch autograd plumbing that JAX
replaces with one combinator).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import timestep_embedding
from sd_tpu.ops.attention import QKVAttentionBlock, SpatialTransformer
from sd_tpu.ops.norms import GroupNorm32
from sd_tpu.ops.resblock import Downsample, ResBlock, Upsample
from sd_tpu.utils import port

__all__ = ["UNetConfig", "UNetModel", "build_unet_plan", "port_unet"]

zeros_init = nn.initializers.zeros_init()


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """All constructor knobs used by the shipped YAML configs (SURVEY §2.2)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    image_size: int = 32  # kept for config compat; not used in compute
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    n_embed: Optional[int] = None  # codebook-id prediction head
    legacy: bool = True

    def __post_init__(self):
        if self.use_spatial_transformer:
            assert self.context_dim is not None, (
                "use_spatial_transformer requires context_dim"
            )
        if self.context_dim is not None:
            assert self.use_spatial_transformer, (
                "context_dim requires use_spatial_transformer"
            )
        if self.num_heads == -1:
            assert self.num_head_channels != -1, (
                "either num_heads or num_head_channels must be set"
            )

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "UNetConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        extra = {"use_fp16", "dims"}  # runtime policy / unsupported dims knob
        return cls(**{k: v for k, v in d.items() if k in names and k not in extra})


def _head_config(cfg: UNetConfig, ch: int, upsample_site: bool) -> Tuple[int, int]:
    """Replicate the reference's per-site (num_heads, dim_head) selection,
    including the ``legacy`` quirk. Ref: ``openaimodel.py:540-549``."""
    if cfg.num_head_channels == -1:
        heads = cfg.num_heads
        dim_head = ch // heads
    else:
        heads = ch // cfg.num_head_channels
        dim_head = cfg.num_head_channels
    if cfg.legacy:
        dim_head = ch // heads if cfg.use_spatial_transformer else cfg.num_head_channels
    if upsample_site and not cfg.use_spatial_transformer:
        # output-stack AttentionBlocks use num_heads_upsample (openaimodel.py:652)
        heads_up = cfg.num_heads_upsample if cfg.num_heads_upsample != -1 else cfg.num_heads
        if cfg.num_head_channels == -1:
            heads = heads_up
    return heads, dim_head


def _attn_layer(cfg: UNetConfig, ch: int, upsample_site: bool) -> Dict[str, Any]:
    heads, dim_head = _head_config(cfg, ch, upsample_site)
    if cfg.use_spatial_transformer:
        return dict(
            kind="spatial_transformer", ch=ch, heads=heads, dim_head=dim_head,
            depth=cfg.transformer_depth, context_dim=cfg.context_dim,
        )
    return dict(
        kind="attention", ch=ch, heads=heads, dim_head=dim_head,
        use_new_attention_order=cfg.use_new_attention_order,
    )


def build_unet_plan(cfg: UNetConfig) -> Dict[str, Any]:
    """Walk the constructor exactly as the reference does, emitting layer
    descriptors. Each descriptor carries the sub-index it would have inside
    the reference's TimestepEmbedSequential (for weight porting)."""
    input_blocks: List[List[Dict]] = [[dict(kind="conv_in", ch=cfg.model_channels)]]
    input_chans = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [dict(kind="res", ch=ch, out_ch=mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                layers.append(_attn_layer(cfg, ch, upsample_site=False))
            input_blocks.append(layers)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_blocks.append([dict(kind="res", ch=ch, out_ch=ch, down=True)])
            else:
                input_blocks.append([dict(kind="downsample", ch=ch)])
            input_chans.append(ch)
            ds *= 2

    middle = [
        dict(kind="res", ch=ch, out_ch=ch),
        _attn_layer(cfg, ch, upsample_site=False),
        dict(kind="res", ch=ch, out_ch=ch),
    ]

    output_blocks: List[List[Dict]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            layers = [dict(kind="res", ch=ch + ich, out_ch=cfg.model_channels * mult)]
            ch = cfg.model_channels * mult
            if ds in cfg.attention_resolutions:
                layers.append(_attn_layer(cfg, ch, upsample_site=True))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(dict(kind="res", ch=ch, out_ch=ch, up=True))
                else:
                    layers.append(dict(kind="upsample", ch=ch))
                ds //= 2
            output_blocks.append(layers)

    return dict(input_blocks=input_blocks, middle_block=middle,
                output_blocks=output_blocks, out_ch=ch)


class UNetModel(nn.Module):
    """Apply with ``(x, timesteps, context=None, y=None)``;
    x ``[B, H, W, C]``, timesteps ``[B]``, context ``[B, N, D]``, y ``[B]``.
    Ref forward: ``openaimodel.py:710-742``."""

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    def _make_layer(self, desc: Dict, name: str):
        cfg = self.config
        kind = desc["kind"]
        remat = cfg.use_checkpoint
        if kind == "conv_in":
            return nn.Conv(desc["ch"], (3, 3), padding=1, dtype=self.dtype, name=name)
        if kind == "res":
            # static_argnums: 0 is the module itself, 3 is `deterministic`
            cls = nn.remat(ResBlock, static_argnums=(3,)) if remat else ResBlock
            return cls(
                channels=desc["ch"], emb_channels=4 * cfg.model_channels,
                dropout=cfg.dropout, out_channels=desc["out_ch"],
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                up=desc.get("up", False), down=desc.get("down", False),
                dtype=self.dtype, name=name,
            )
        if kind == "attention":
            cls = nn.remat(QKVAttentionBlock) if remat else QKVAttentionBlock
            return cls(
                channels=desc["ch"], num_heads=desc["heads"],
                num_head_channels=desc["dim_head"],
                use_new_attention_order=desc["use_new_attention_order"],
                dtype=self.dtype, attn_impl=self.attn_impl, name=name,
            )
        if kind == "spatial_transformer":
            cls = (
                nn.remat(SpatialTransformer, static_argnums=(3,))
                if remat else SpatialTransformer
            )
            return cls(
                in_channels=desc["ch"], n_heads=desc["heads"],
                d_head=desc["dim_head"], depth=desc["depth"],
                context_dim=desc["context_dim"], dropout=cfg.dropout,
                dtype=self.dtype, attn_impl=self.attn_impl, name=name,
            )
        if kind == "downsample":
            return Downsample(channels=desc["ch"], use_conv=cfg.conv_resample,
                              dtype=self.dtype, name=name)
        if kind == "upsample":
            return Upsample(channels=desc["ch"], use_conv=cfg.conv_resample,
                            dtype=self.dtype, name=name)
        raise ValueError(kind)

    def _apply_layer(self, layer, desc, h, emb, context, deterministic):
        kind = desc["kind"]
        if kind in ("conv_in", "downsample", "upsample"):
            return layer(h)
        if kind == "res":
            return layer(h, emb, deterministic)
        if kind == "attention":
            return layer(h)
        if kind == "spatial_transformer":
            return layer(h, context, deterministic)
        raise ValueError(kind)

    @nn.compact
    def __call__(self, x, timesteps, context=None, y=None, deterministic: bool = True):
        cfg = self.config
        assert (y is not None) == (cfg.num_classes is not None), (
            "y must be given iff the model is class-conditional"
        )
        plan = build_unet_plan(cfg)

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(4 * cfg.model_channels, dtype=self.dtype, name="time_embed_0")(
            t_emb.astype(self.dtype)
        )
        emb = nn.Dense(4 * cfg.model_channels, dtype=self.dtype, name="time_embed_2")(
            jax.nn.silu(emb)
        )
        if cfg.num_classes is not None:
            emb = emb + nn.Embed(
                cfg.num_classes, 4 * cfg.model_channels, dtype=self.dtype,
                name="label_emb",
            )(y)

        h = x.astype(self.dtype)
        hs = []
        for i, block in enumerate(plan["input_blocks"]):
            for j, desc in enumerate(block):
                layer = self._make_layer(desc, name=f"input_blocks_{i}_{j}")
                h = self._apply_layer(layer, desc, h, emb, context, deterministic)
            hs.append(h)

        for j, desc in enumerate(plan["middle_block"]):
            layer = self._make_layer(desc, name=f"middle_block_{j}")
            h = self._apply_layer(layer, desc, h, emb, context, deterministic)

        for i, block in enumerate(plan["output_blocks"]):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, desc in enumerate(block):
                layer = self._make_layer(desc, name=f"output_blocks_{i}_{j}")
                h = self._apply_layer(layer, desc, h, emb, context, deterministic)

        if cfg.n_embed is not None:
            h = GroupNorm32(name="id_norm")(h)
            return nn.Dense(cfg.n_embed, dtype=self.dtype, name="id_predictor")(h)
        h = GroupNorm32(name="out_norm")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=zeros_init, name="out_conv",
        )(h)
        return h.astype(x.dtype)


# --------------------------------------------------------------------------
# Weight port
# --------------------------------------------------------------------------


def _port_res(sd, prefix: str) -> Dict:
    p = {
        "in_norm": {"GroupNorm_0": port.norm(sd, f"{prefix}.in_layers.0")},
        "in_conv": port.conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": port.dense(sd, f"{prefix}.emb_layers.1"),
        "out_norm": {"GroupNorm_0": port.norm(sd, f"{prefix}.out_layers.0")},
        "out_conv": port.conv(sd, f"{prefix}.out_layers.3"),
    }
    wkey = f"{prefix}.skip_connection.weight"
    if wkey in sd:
        p["skip"] = port.conv(sd, f"{prefix}.skip_connection")
    return p


def _port_attention(sd, prefix: str) -> Dict:
    # reference qkv/proj_out are Conv1d [O, I, 1] -> Dense [I, O]
    def conv1d_dense(name):
        w = port.to_numpy(sd[f"{prefix}.{name}.weight"])
        out = {"kernel": np.transpose(w[:, :, 0], (1, 0))}
        if f"{prefix}.{name}.bias" in sd:
            out["bias"] = port.to_numpy(sd[f"{prefix}.{name}.bias"])
        return out

    return {
        "norm": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm")},
        "qkv": conv1d_dense("qkv"),
        "proj_out": conv1d_dense("proj_out"),
    }


def _port_basic_transformer(sd, prefix: str) -> Dict:
    return {
        "attn1": {
            "to_q": port.dense(sd, f"{prefix}.attn1.to_q"),
            "to_k": port.dense(sd, f"{prefix}.attn1.to_k"),
            "to_v": port.dense(sd, f"{prefix}.attn1.to_v"),
            "to_out": port.dense(sd, f"{prefix}.attn1.to_out.0"),
        },
        "attn2": {
            "to_q": port.dense(sd, f"{prefix}.attn2.to_q"),
            "to_k": port.dense(sd, f"{prefix}.attn2.to_k"),
            "to_v": port.dense(sd, f"{prefix}.attn2.to_v"),
            "to_out": port.dense(sd, f"{prefix}.attn2.to_out.0"),
        },
        "ff": {
            "proj_in": {"proj": port.dense(sd, f"{prefix}.ff.net.0.proj")},
            "proj_out": port.dense(sd, f"{prefix}.ff.net.2"),
        },
        "norm1": {"LayerNorm_0": port.norm(sd, f"{prefix}.norm1")},
        "norm2": {"LayerNorm_0": port.norm(sd, f"{prefix}.norm2")},
        "norm3": {"LayerNorm_0": port.norm(sd, f"{prefix}.norm3")},
    }


def _port_spatial_transformer(sd, prefix: str, depth: int) -> Dict:
    p = {
        "norm": {"GroupNorm_0": port.norm(sd, f"{prefix}.norm")},
        "proj_in": port.dense_from_conv1x1(sd, f"{prefix}.proj_in"),
        "proj_out": port.dense_from_conv1x1(sd, f"{prefix}.proj_out"),
    }
    for d in range(depth):
        p[f"blocks_{d}"] = _port_basic_transformer(sd, f"{prefix}.transformer_blocks.{d}")
    return p


def _port_layer(sd, desc: Dict, prefix: str) -> Dict:
    kind = desc["kind"]
    if kind == "conv_in":
        return port.conv(sd, prefix)
    if kind == "res":
        return _port_res(sd, prefix)
    if kind == "attention":
        return _port_attention(sd, prefix)
    if kind == "spatial_transformer":
        return _port_spatial_transformer(sd, prefix, desc["depth"])
    if kind == "downsample":
        return {"conv": port.conv(sd, f"{prefix}.op")}
    if kind == "upsample":
        return {"conv": port.conv(sd, f"{prefix}.conv")}
    raise ValueError(kind)


def port_unet(sd, cfg: UNetConfig, prefix: str = "model.diffusion_model.") -> Dict:
    """Map a reference UNet state_dict onto this module's param pytree.

    ``prefix`` is ``model.diffusion_model.`` inside LDM checkpoints
    (``ddpm.py:1395-1421`` wraps the UNet in DiffusionWrapper as
    ``self.diffusion_model``), or "" for a bare UNet state_dict.
    """
    plan = build_unet_plan(cfg)
    p = lambda s: f"{prefix}{s}" if prefix else s
    params: Dict[str, Any] = {
        "time_embed_0": port.dense(sd, p("time_embed.0")),
        "time_embed_2": port.dense(sd, p("time_embed.2")),
    }
    if cfg.num_classes is not None:
        params["label_emb"] = {"embedding": port.to_numpy(sd[p("label_emb.weight")])}

    for i, block in enumerate(plan["input_blocks"]):
        for j, desc in enumerate(block):
            params[f"input_blocks_{i}_{j}"] = _port_layer(
                sd, desc, p(f"input_blocks.{i}.{j}")
            )
    for j, desc in enumerate(plan["middle_block"]):
        params[f"middle_block_{j}"] = _port_layer(sd, desc, p(f"middle_block.{j}"))
    for i, block in enumerate(plan["output_blocks"]):
        for j, desc in enumerate(block):
            params[f"output_blocks_{i}_{j}"] = _port_layer(
                sd, desc, p(f"output_blocks.{i}.{j}")
            )

    if cfg.n_embed is not None:
        params["id_norm"] = {"GroupNorm_0": port.norm(sd, p("id_predictor.0"))}
        params["id_predictor"] = port.dense_from_conv1x1(sd, p("id_predictor.1"))
    else:
        params["out_norm"] = {"GroupNorm_0": port.norm(sd, p("out.0"))}
        params["out_conv"] = port.conv(sd, p("out.2"))
    return params
