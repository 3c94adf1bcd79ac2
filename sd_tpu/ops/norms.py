"""Normalization layers.

The reference uses two GroupNorm flavours that matter for checkpoint parity
(SURVEY.md §7.2):
- UNet blocks: ``GroupNorm32`` — torch-default eps=1e-5 with an fp32 upcast
  (``ldm/modules/diffusionmodules/util.py:205,214-216``).
- VAE / SpatialTransformer: eps=1e-6 (``model.py:38-39``, ``attention.py:77``).

Here both are one module: GroupNorm is always computed in float32 and cast
back to the activation dtype — the TPU bf16 policy keeps the normalization
statistics exact, which is what the reference's ``.float()`` upcast does.

TPU perf note (r3, tools/trace_summary.py + tools/exp_gn_barrier.py): the
CFG step's ``convert_reduce_fusion`` convs run at 40-60% of their padded
bound while stat-free convs run at ~100%. Putting the GN statistics behind
an ``optimization_barrier`` (stats as a standalone read) was MEASURED WORSE
in-context (-2.3 ms/step): the slack is not the stats epilogue but the
normalize+SiLU PROLOGUE fused into the conv's input reads (recomputed per
tap). ``SD_TPU_GN_BARRIER=1`` keeps the losing variant reproducible; the
winning fixes are the conv input barrier (ops/conv.py) and the fused
GN+SiLU+conv Pallas kernel (ops/pallas/fused_conv.py).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["GroupNorm32", "LayerNormFp32", "set_norm_stats_dtype"]

# Normalization statistics dtype. fp32 matches the reference's .float()
# upcasts and is the parity-validated default. set_norm_stats_dtype(bf16) is
# an EXPERIMENTAL throughput knob (tools/bench_attn.py measures it) — it
# trades the fp32 islands for fewer HBM bytes around every norm.
_STATS_DTYPE = jnp.float32


def set_norm_stats_dtype(dtype) -> None:
    """Set the norm-statistics dtype for SUBSEQUENTLY TRACED programs.

    The value is read at trace time and is NOT part of any jit cache key:
    functions already compiled keep the dtype they were traced with. Call
    this before building/jitting the model (tools/bench_attn.py re-jits per
    variant for exactly this reason)."""
    global _STATS_DTYPE
    _STATS_DTYPE = dtype


def _stats_barrier_enabled() -> bool:
    return os.environ.get("SD_TPU_GN_BARRIER", "0") == "1"


class _GNAffine(nn.Module):
    """Declares GroupNorm's scale/bias with nn.GroupNorm's exact tree.

    Named ``GroupNorm_0`` by the parent so checkpoints written against the
    previous nn.GroupNorm-wrapping implementation (and the torch porters,
    which map onto ``*/GroupNorm_0/{scale,bias}``) keep loading unchanged.
    """

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return scale, bias


def group_stats(x, num_groups: int, stats_dtype=None, barrier=None):
    """Per-(batch, group) mean / E[x^2] of ``x`` [..., C] in fp32.

    Single-pass E[x^2]-E[x]^2 form (flax ``use_fast_variance`` — 35% faster
    on v5e, parity preserved at fp32, validated against torch at 1e-4).
    """
    if barrier is None:
        barrier = _stats_barrier_enabled()
    if barrier:
        x = jax.lax.optimization_barrier(x)
    sdt = stats_dtype or _STATS_DTYPE
    c = x.shape[-1]
    xg = x.astype(sdt).reshape(x.shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3))
    meansq = jnp.mean(jnp.square(xg), axis=(1, 3))
    return mean, meansq


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32, output cast back to the input dtype.

    ``affine_only=True`` returns the (scale, bias) parameters without
    computing — the fused resblock path reads them to fold the whole
    normalize+SiLU prologue into the conv kernel.
    """

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x=None, *, affine_only: bool = False,
                 features: Optional[int] = None):
        c = features if x is None else x.shape[-1]
        scale, bias = _GNAffine(features=c, name="GroupNorm_0")()
        if affine_only:
            return scale, bias
        orig_dtype = x.dtype
        sdt = _STATS_DTYPE
        mean, meansq = group_stats(x, self.num_groups, sdt)
        # clamp: the single-pass E[x^2]-E[x]^2 form can go slightly NEGATIVE
        # under fp32 cancellation on near-constant inputs (|err| ~ eps*mean^2
        # can exceed self.eps), making rsqrt NaN — flax's use_fast_variance
        # clamps identically
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + jnp.asarray(self.eps, sdt))
        cg = c // self.num_groups
        # broadcast (B, G) stats to (B, 1.., C) and fold with scale/bias so
        # the apply is one multiply-add over x
        a = jnp.repeat(rstd, cg, axis=-1) * scale.astype(sdt)
        b = bias.astype(sdt) - jnp.repeat(mean * rstd, cg, axis=-1) \
            * scale.astype(sdt)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        out = x.astype(sdt) * a.reshape(bshape) + b.reshape(bshape)
        return out.astype(orig_dtype)


class LayerNormFp32(nn.Module):
    """LayerNorm in fp32 (pre-LN sites in BasicTransformerBlock, CLIP)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        out = nn.LayerNorm(
            epsilon=self.eps,
            dtype=_STATS_DTYPE,
            param_dtype=jnp.float32,
            use_fast_variance=True,
        )(x.astype(_STATS_DTYPE))
        return out.astype(orig_dtype)
