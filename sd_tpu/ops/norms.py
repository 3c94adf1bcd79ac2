"""Normalization layers.

The reference uses two GroupNorm flavours that matter for checkpoint parity
(SURVEY.md §7.2):
- UNet blocks: ``GroupNorm32`` — torch-default eps=1e-5 with an fp32 upcast
  (``ldm/modules/diffusionmodules/util.py:205,214-216``).
- VAE / SpatialTransformer: eps=1e-6 (``model.py:38-39``, ``attention.py:77``).

Here both are one module: GroupNorm is always computed in float32 and cast
back to the activation dtype — the TPU bf16 policy keeps the normalization
statistics exact, which is what the reference's ``.float()`` upcast does.
"""

from __future__ import annotations

import flax.linen as nn
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


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32, output cast back to the input dtype."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        out = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            dtype=_STATS_DTYPE,
            param_dtype=jnp.float32,
            # single-pass E[x^2]-E[x]^2 in fp32: 35% faster on v5e, parity
            # preserved at fp32 (validated against torch at 1e-4)
            use_fast_variance=True,
        )(x.astype(_STATS_DTYPE))
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
