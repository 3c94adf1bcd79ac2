"""Attention — the hot path of the framework.

One core primitive, :func:`dot_product_attention`, backs every attention site
the reference has (SURVEY.md §2.2):

- ``CrossAttention`` (``ldm/modules/attention.py:152-193``) — the
  SpatialTransformer self/cross attention inside the SD UNet.
- ``VAEAttnBlock`` (``ldm/modules/diffusionmodules/model.py:150-202``) —
  single-head attention in the autoencoder mid-blocks.
- ``AttentionBlock`` + QKV attention (``openaimodel.py:278-409``) — legacy
  pixel-space UNet attention (class-cond ImageNet / LSUN LDMs).
- ``LinearAttention`` (``attention.py:80-96``) — O(N) variant config option.
- ``AttentionPool2d`` (``openaimodel.py:32-58``) — classifier pooling head.

TPU design: tensors are token-major ``[B, N, H, D]``; the core computes the
softmax in fp32 (matching the reference's fp16-stability upcasts at
``openaimodel.py:370`` et al.) and dispatches to a Pallas flash-attention
kernel on TPU for large N (``sd_tpu/ops/pallas/flash_attention.py``),
falling back to a fused XLA einsum elsewhere.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sd_tpu.ops.norms import GroupNorm32, LayerNormFp32

__all__ = [
    "dot_product_attention",
    "CrossAttention",
    "BasicTransformerBlock",
    "SpatialTransformer",
    "VAEAttnBlock",
    "LinearAttention",
    "QKVAttentionBlock",
    "AttentionPool2d",
    "GEGLU",
    "FeedForward",
]

zeros_init = nn.initializers.zeros_init()


def _xla_attention(q, k, v, scale, mask):
    """[B, Nq, H, D] x [B, Nk, H, D] -> [B, Nq, H, D], fp32 softmax."""
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.asarray(scale, jnp.float32)
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, big_neg)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if os.environ.get("SD_TPU_CROSS_BMM", "0") == "1":
        # Perf experiment, MEASURED IN-CONTEXT AND LOST (r3, keep OFF): the
        # natural "bhqk,bkhd->bqhd" AV einsum makes XLA fuse the trailing
        # head-merge reshape and lower the contraction as a dilated conv
        # that prices at ~29% of its padded-matmul bound at N=4096
        # (floor-table r3). Splitting it — tiny V transpose, clean batched
        # matmul, barrier so the output transpose stays a separate copy —
        # measured 113.97 ms/step vs 113.50 auto (tools/bench_attn.py unet
        # crossbmm, honest params-as-args graph): the isolated-bound "slack"
        # is an artifact of pricing XLA's fused lowering against a clean
        # matmul bound; in context the fusion wins. Don't re-walk without
        # a new idea.
        vt = jnp.transpose(v, (0, 2, 1, 3))  # [B,H,Nk,D] — Nk rows, cheap
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, vt)
        out = jax.lax.optimization_barrier(out)
        return jnp.transpose(out, (0, 2, 1, 3))
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def dot_product_attention(
    q, k, v, scale: Optional[float] = None, mask=None, impl: str = "auto"
):
    """Multi-head scaled dot-product attention.

    Args:
      q: ``[B, Nq, H, D]`` queries.
      k, v: ``[B, Nk, H, D]`` keys/values.
      scale: logit scale; defaults to ``D ** -0.5``.
      mask: optional boolean mask broadcastable to ``[B, H, Nq, Nk]``
        (True = attend).
      impl: ``"xla"`` | ``"flash"`` | ``"auto"``. ``auto`` picks the Pallas
        flash kernel on TPU when shapes qualify, XLA otherwise.

    Returns ``[B, Nq, H, D]`` in the dtype of ``q``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl in ("auto", "flash"):
        try:
            from sd_tpu.ops.pallas.flash_attention import (
                flash_attention,
                flash_supported,
            )

            # SD_TPU_FLASH_FORCE=interpret: route qualifying self-attention
            # sites through the Pallas kernel in interpret mode regardless
            # of platform — the dryrun/test hook that lets the virtual CPU
            # mesh exercise the kernel's SPMD custom_partitioning rule
            # inside real models (__graft_entry__ pipeline leg).
            if (os.environ.get("SD_TPU_FLASH_FORCE", "").lower()
                    == "interpret" and mask is None
                    and q.shape[1] == k.shape[1] and q.shape[1] >= 128
                    and q.shape[1] % 128 == 0):
                return flash_attention(q, k, v, scale=scale,
                                       interpret=True)
            if impl == "flash" or flash_supported(q, k, v, mask):
                return flash_attention(q, k, v, scale=scale, mask=mask)
        except ImportError:
            if impl == "flash":
                raise
    return _xla_attention(q, k, v, scale, mask)


class GEGLU(nn.Module):
    """Gated-GELU projection. Ref: ``attention.py:37-44``."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * jax.nn.gelu(gate, approximate=False)


class _DenseParams(nn.Module):
    """Declares the exact param tree of an ``nn.Dense`` (same names, shapes,
    initializers) WITHOUT applying it — lets the fused-FF kernel consume the
    weights while staying checkpoint/port-compatible with the unfused path."""

    features: int

    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _GEGLUParams(nn.Module):
    """Param-tree stand-in for :class:`GEGLU` (child Dense named ``proj``)."""

    dim_out: int

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(self.dim_out * 2, name="proj")(in_features)


class FeedForward(nn.Module):
    """Transformer MLP, optionally gated. Ref: ``attention.py:47-64``."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        if self.glu and (deterministic or self.dropout == 0.0):
            # fused GEGLU+gelu+out-proj kernel: one HBM read/write instead of
            # ~5 full-width passes (sd_tpu/ops/pallas/geglu_ff.py)
            from sd_tpu.ops.pallas.geglu_ff import ff_supported, geglu_ff

            if ff_supported(x, inner):
                w1, b1 = _GEGLUParams(inner, name="proj_in")(x.shape[-1])
                w2, b2 = _DenseParams(
                    self.dim_out or self.dim, name="proj_out")(inner)
                # load-time-quantized weights for the int8 FF path (the
                # "qw" overlay, ops/quant.py::prequantize_weights) — inline
                # per-step re-quantization is not LICM-hoisted out of
                # sampler scans (tools/exp_wq_hoist.py)
                prequant = None
                if self.has_variable("qw", "w2_q"):
                    gv = lambda n: self.variable("qw", n).value
                    prequant = (gv("w1a_q"), gv("w1a_s"), gv("w1g_q"),
                                gv("w1g_s"), gv("w2_q"), gv("w2_s"))
                return geglu_ff(x, w1, b1, w2, b2, prequant=prequant)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
            x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim_out or self.dim, dtype=self.dtype, name="proj_out")(x)


class CrossAttention(nn.Module):
    """Self/cross attention over ``[B, N, C]`` tokens.

    Ref: ``ldm/modules/attention.py:152-193``. ``context=None`` makes it
    self-attention, exactly as the reference's ``default(context, x)``.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, context=None, mask=None, deterministic: bool = True):
        h, d = self.heads, self.dim_head
        inner = h * d
        context = x if context is None else context

        # W8A8 projection bucket (SD_TPU_INT8=...,proj — opt-in, measured
        # in-context before shipping in any default; ops/pallas/int8_dense.py
        # has the pricing). Self-attention fuses QKV into ONE int8 matmul so
        # the activation quant pass is paid once; cross keeps K/V bf16 (the
        # 77-token context matmuls are tiny).
        from sd_tpu.ops.quant import int8_bucket_enabled

        i8proj = int8_bucket_enabled("proj", x.dtype)
        if i8proj:
            from sd_tpu.ops.pallas.int8_dense import int8_dense

            wq, _ = _DenseParams(inner, use_bias=False, name="to_q")(
                x.shape[-1])
            wk, _ = _DenseParams(inner, use_bias=False, name="to_k")(
                context.shape[-1])
            wv, _ = _DenseParams(inner, use_bias=False, name="to_v")(
                context.shape[-1])
            if context is x:
                qkv = int8_dense(x, jnp.concatenate([wq, wk, wv], axis=1))
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = int8_dense(x, wq)
                k = jnp.dot(context, wk.astype(context.dtype))
                v = jnp.dot(context, wv.astype(context.dtype))
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        if context is x and os.environ.get("SD_TPU_PROJ_BARRIER", "0") == "1":
            # Perf experiment, MEASURED IN-CONTEXT AND LOST (r3, keep OFF):
            # on the self-attention sites XLA fuses the head-split reshape +
            # the flash kernel's (0,2,1,3) transpose INTO the q/v projection
            # dots, lowering them as dilated convs priced at ~36-60% of
            # their matmul bounds (floor-table r3; to_k — fused with the kt
            # transpose instead — runs AT bound, which is why k is exempt).
            # The barrier forces clean [BN,C]x[C,C] dots + explicit copies:
            # measured 115.39 ms/step vs 113.50 auto (both flags together
            # 115.27; tools/bench_attn.py unet projbar/lowerboth, honest
            # graph). The fused dilated-conv lowering is in-context optimal;
            # the per-site "slack" was a bound-pricing artifact. Don't
            # re-walk without a new idea.
            q, v = jax.lax.optimization_barrier((q, v))

        b, nq = q.shape[0], q.shape[1]
        nk = k.shape[1]
        q = q.reshape(b, nq, h, d)
        k = k.reshape(b, nk, h, d)
        v = v.reshape(b, nk, h, d)

        if mask is not None:
            # [B, Nk] key-padding mask -> [B, 1, 1, Nk] (attention.py:183-186)
            mask = mask.reshape(b, 1, 1, nk)

        out = dot_product_attention(q, k, v, scale=d**-0.5, mask=mask, impl=self.attn_impl)
        out = out.reshape(b, nq, inner)
        if i8proj:
            from sd_tpu.ops.pallas.int8_dense import int8_dense

            wo, bo = _DenseParams(self.query_dim, name="to_out")(inner)
            out = int8_dense(out, wo, bo)
        else:
            out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> gated FF, each pre-LN residual.

    Ref: ``attention.py:196-215``.
    """

    dim: int
    n_heads: int
    d_head: int
    dropout: float = 0.0
    context_dim: Optional[int] = None
    gated_ff: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        x = CrossAttention(
            query_dim=self.dim, heads=self.n_heads, dim_head=self.d_head,
            dropout=self.dropout, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn1",
        )(LayerNormFp32(name="norm1")(x), deterministic=deterministic) + x
        x = CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            heads=self.n_heads, dim_head=self.d_head, dropout=self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, name="attn2",
        )(LayerNormFp32(name="norm2")(x), context=context, deterministic=deterministic) + x
        x = FeedForward(
            self.dim, glu=self.gated_ff, dropout=self.dropout, dtype=self.dtype,
            name="ff",
        )(LayerNormFp32(name="norm3")(x), deterministic=deterministic) + x
        return x


class SpatialTransformer(nn.Module):
    """The SD attention stack over ``[B, H, W, C]`` feature maps.

    GroupNorm -> 1x1 proj_in -> depth x BasicTransformerBlock on (h w) tokens
    -> zero-init 1x1 proj_out -> residual. Ref: ``attention.py:218-261``.
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        b, hh, ww, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm32(eps=1e-6, name="norm")(x)
        # 1x1 convs are Dense on NHWC
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, hh * ww, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                dropout=self.dropout, context_dim=self.context_dim,
                dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )(x, context=context, deterministic=deterministic)
        x = x.reshape(b, hh, ww, inner)
        x = nn.Dense(
            self.in_channels, dtype=self.dtype, kernel_init=zeros_init,
            name="proj_out",
        )(x)
        return x + x_in


class VAEAttnBlock(nn.Module):
    """Single-head attention in the VAE mid-blocks over ``[B, H, W, C]``.

    Ref: ``diffusionmodules/model.py:150-202`` (1x1 q/k/v/proj convs,
    scale C^-0.5, residual). On NHWC the 1x1 convs are Dense layers.
    """

    in_channels: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h_ = GroupNorm32(eps=1e-6, name="norm")(x)
        q = nn.Dense(c, dtype=self.dtype, name="q")(h_)
        k = nn.Dense(c, dtype=self.dtype, name="k")(h_)
        v = nn.Dense(c, dtype=self.dtype, name="v")(h_)
        n = hh * ww
        # single head, head_dim = C
        q = q.reshape(b, n, 1, c)
        k = k.reshape(b, n, 1, c)
        v = v.reshape(b, n, 1, c)
        out = dot_product_attention(q, k, v, scale=c**-0.5, impl=self.attn_impl)
        out = out.reshape(b, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out


class LinearAttention(nn.Module):
    """O(N) linear attention over ``[B, H, W, C]``. Ref: ``attention.py:80-96``.

    k is softmaxed over tokens; context = k^T v aggregated once.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
        # context[b,h,d,e] = sum_n k[b,n,h,d] v[b,n,h,e]
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, hh, ww, hidden)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class QKVAttentionBlock(nn.Module):
    """Legacy pixel-space attention block of the OpenAI UNet.

    Ref: ``openaimodel.py:278-325`` with the two QKV orderings
    (``QKVAttentionLegacy`` ``:347-376`` splits heads before qkv;
    ``QKVAttention`` ``:379-409`` splits qkv before heads). The ordering only
    changes the fused-qkv weight layout; both reduce to the same core
    attention here, with the reference's two-sided sqrt(scale) applied to q
    and k for fp16 stability.
    """

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0
            heads = c // self.num_head_channels
        d = c // heads
        n = hh * ww

        h_ = GroupNorm32(name="norm")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h_).reshape(b, n, 3 * c)
        if self.use_new_attention_order:
            # fused layout [3, H, D]
            qkv = qkv.reshape(b, n, 3, heads, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            # legacy layout [H, 3, D]
            qkv = qkv.reshape(b, n, heads, 3, d)
            q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        out = dot_product_attention(q, k, v, scale=d**-0.5, impl=self.attn_impl)
        out = out.reshape(b, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init, name="proj_out")(out)
        return x + out


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling head. Ref: ``openaimodel.py:32-58``.

    Prepends the spatial mean as a [CLS]-like token, adds a learned
    positional embedding, runs one attention layer, returns the CLS output.
    """

    spacial_dim: int
    embed_dim: int
    num_heads_channels: int
    output_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        n = hh * ww
        x = x.reshape(b, n, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # [B, N+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=1.0 / c**0.5),
            (self.spacial_dim**2 + 1, c),
        )
        x = x + pos[None].astype(x.dtype)
        heads = c // self.num_heads_channels
        d = c // heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(x)
        qkv = qkv.reshape(b, n + 1, 3, heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = dot_product_attention(q, k, v, scale=d**-0.5)
        out = out.reshape(b, n + 1, c)
        out = nn.Dense(self.output_dim or c, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]
