"""Conditioning encoders (``ldm/modules/encoders/modules.py`` rebuild).

The cond-stage zoo (SURVEY.md §2.4):
- :class:`ClassEmbedder` — class id -> embedding token (``modules.py:21-33``)
- :class:`TransformerEmbedder` / :class:`BERTEmbedder` — from-scratch text
  transformer (the vendored lucidrains x-transformer, ``x_transformer.py``;
  used by the LAION-400M 1.4B txt2img model). Rebuilt as a standard pre-LN
  encoder, weight-compatible with the reference's x-transformer layout via
  :func:`port_transformer_wrapper` below (parity test:
  ``tests/test_extras.py::test_transformer_embedder_xtransformer_parity``).
- :class:`SpatialRescaler` — resize + optional 1x1 channel map for
  segmentation conditioning (``modules.py:106-135``)
- :class:`FrozenCLIPEmbedder` — SD's text encoder (``modules.py:137-162``):
  tokenizer + CLIP text tower -> 77x768 last_hidden_state.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer
from sd_tpu.models.clip import CLIP_VIT_L_14_TEXT, CLIPTextConfig, CLIPTextModel
from sd_tpu.ops.norms import LayerNormFp32

__all__ = [
    "ClassEmbedder",
    "TransformerEmbedder",
    "BERTEmbedder",
    "SpatialRescaler",
    "FrozenCLIPEmbedder",
]


class ClassEmbedder(nn.Module):
    """Class id -> [B, 1, embed_dim] crossattn token. Ref: ``modules.py:21-33``."""

    embed_dim: int
    n_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        c = jnp.asarray(c).reshape(-1)
        emb = nn.Embed(self.n_classes, self.embed_dim, dtype=self.dtype,
                       name="embedding")(c)
        return emb[:, None, :]

    def encode(self, c):
        return self(c)


class _EncoderBlock(nn.Module):
    """One pre-norm (attn, ff) pair, matching x-transformers' AttentionLayers
    default block ('a','f') with dim_head=64 (``x_transformer.py:215-367``)."""

    dim: int
    heads: int
    dim_head: int = 64  # x-transformers DEFAULT_DIM_HEAD — NOT dim // heads
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from sd_tpu.ops.attention import dot_product_attention

        d = self.dim_head
        inner = self.heads * d
        y = LayerNormFp32(name="norm1")(x)
        b, n, _ = y.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(y)
        o = dot_product_attention(
            q.reshape(b, n, self.heads, d), k.reshape(b, n, self.heads, d),
            v.reshape(b, n, self.heads, d), scale=d**-0.5,
        ).reshape(b, n, inner)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="to_out")(o)
        y = LayerNormFp32(name="norm2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="ff_in")(y)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return x


class TransformerEmbedder(nn.Module):
    """From-scratch text transformer -> [B, N, n_embed].

    Functional equivalent of the reference's x-transformer wrapper
    (``modules.py:36-50`` over ``x_transformer.py:548-640``): token + learned
    positional embeddings, pre-LN attention/FF stack, final LayerNorm.
    """

    n_embed: int
    n_layer: int
    vocab_size: int
    max_seq_len: int = 77
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        b, n = tokens.shape
        x = nn.Embed(self.vocab_size, self.n_embed, dtype=self.dtype,
                     name="token_emb")(tokens)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_seq_len, self.n_embed))
        x = x + pos[None, :n].astype(x.dtype)
        for i in range(self.n_layer):
            x = _EncoderBlock(self.n_embed, self.heads, dtype=self.dtype,
                              name=f"layers_{i}")(x)
        return LayerNormFp32(name="norm")(x)

    def encode(self, tokens):
        return self(tokens)


class BERTEmbedder(nn.Module):
    """Text -> crossattn context for the LAION 1.4B model family.

    Ref: ``modules.py:53-103`` — BERT-tokenized input into a 32-layer
    x-transformer (n_embed 1280). Token ids must be produced by the caller
    (``sd_tpu.data.tokenizer`` or an external BERT vocab).
    """

    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        return TransformerEmbedder(
            n_embed=self.n_embed, n_layer=self.n_layer,
            vocab_size=self.vocab_size, max_seq_len=self.max_seq_len,
            dtype=self.dtype, name="transformer",
        )(tokens)

    def encode(self, tokens):
        return self(tokens)


class SpatialRescaler(nn.Module):
    """Resize (xN halvings/doublings) + optional 1x1 channel map.

    Ref: ``modules.py:106-135``. Operates on NHWC; 'bilinear' default.
    """

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: Optional[int] = None
    bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.method in ("nearest", "linear", "bilinear", "trilinear",
                               "bicubic", "area")
        method = {"area": "linear", "linear": "bilinear",
                  "trilinear": "trilinear"}.get(self.method, self.method)
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            new = (b, max(int(h * self.multiplier), 1),
                   max(int(w * self.multiplier), 1), c)
            x = jax.image.resize(x, new, method=method)
        if self.out_channels is not None:
            x = nn.Dense(self.out_channels, use_bias=self.bias,
                         dtype=self.dtype, name="channel_mapper")(x)
        return x

    def encode(self, x):
        return self(x)


class HybridConditioner(nn.Module):
    """Pairs a concat conditioner with a crossattn conditioner and returns the
    dict the DiffusionWrapper's hybrid mode consumes.
    Ref: ``ldm/modules/diffusionmodules/util.py:251-262``."""

    concat_conditioner: Any
    crossattn_conditioner: Any

    def __call__(self, c_concat, c_crossattn):
        return {
            "c_concat": [self.concat_conditioner(c_concat)],
            "c_crossattn": [self.crossattn_conditioner(c_crossattn)],
        }


@dataclasses.dataclass
class FrozenCLIPEmbedder:
    """Tokenizer + CLIP text tower, returning the 77-token context.

    Host-side tokenize (``tokenize``), device-side encode (``encode_tokens``)
    — split so the encode path stays jittable. The combined ``__call__``
    mirrors the reference contract (``modules.py:152-159``).
    """

    params: Any
    tokenizer: Any = None
    config: CLIPTextConfig = CLIP_VIT_L_14_TEXT
    max_length: int = 77
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.model = CLIPTextModel(self.config, dtype=self.dtype)
        if self.tokenizer is None:
            self.tokenizer = HashTokenizer(self.config.vocab_size)

    def tokenize(self, texts) -> np.ndarray:
        return self.tokenizer(texts, context_length=self.max_length)

    def encode_tokens(self, token_ids) -> jnp.ndarray:
        return self.model.apply({"params": self.params}, token_ids,
                                method=self.model.encode)

    def encode(self, texts) -> jnp.ndarray:
        return self.encode_tokens(jnp.asarray(self.tokenize(texts)))

    def __call__(self, texts):
        return self.encode(texts)


def port_transformer_wrapper(sd, n_layer: int, prefix: str = "") -> dict:
    """Map a reference x-transformers ``TransformerWrapper`` state_dict
    (``x_transformer.py:548-640``; layers at ``attn_layers.layers.{2l}`` =
    attention, ``{2l+1}`` = feedforward, each [norm, block]) onto
    :class:`TransformerEmbedder`."""
    from sd_tpu.utils import port

    p = lambda s_: f"{prefix}{s_}" if prefix else s_
    params = {
        "token_emb": {"embedding": port.to_numpy(sd[p("token_emb.weight")])},
        "pos_emb": port.to_numpy(sd[p("pos_emb.emb.weight")]),
        "norm": {"LayerNorm_0": port.norm(sd, p("norm"))},
    }
    for l in range(n_layer):
        a = p(f"attn_layers.layers.{2 * l}")
        f = p(f"attn_layers.layers.{2 * l + 1}")
        params[f"layers_{l}"] = {
            "norm1": {"LayerNorm_0": port.norm(sd, f"{a}.0")},
            "to_q": port.dense(sd, f"{a}.1.to_q"),
            "to_k": port.dense(sd, f"{a}.1.to_k"),
            "to_v": port.dense(sd, f"{a}.1.to_v"),
            "to_out": port.dense(sd, f"{a}.1.to_out"),
            "norm2": {"LayerNorm_0": port.norm(sd, f"{f}.0")},
            "ff_in": port.dense(sd, f"{f}.1.net.0.0"),
            "ff_out": port.dense(sd, f"{f}.1.net.2"),
        }
    return params


def port_bert_embedder(sd, n_layer: int, prefix: str = "transformer.") -> dict:
    """BERTEmbedder holds the wrapper as ``self.transformer``
    (``modules.py:88-90``); inside an LDM checkpoint the prefix is
    ``cond_stage_model.transformer.``."""
    return {"transformer": port_transformer_wrapper(sd, n_layer, prefix)}
