"""Fused GEGLU feed-forward Pallas kernel.

The transformer FF (``ldm/modules/attention.py:47-64`` — GEGLU projection,
exact-erf GELU gate, output projection) is the single least efficient part of
the SD UNet step on TPU as XLA ops: the gate projection materializes a
``[B·N, 8·dim]`` intermediate in HBM (336 MB per level-0 block at the bench
batch) and the exact GELU's ``erf`` runs as a separate elementwise pass.
Measured r2 (tools/bench_attn.py unet noff): the FF stack costs 23.2 ms of
the 114.7 ms CFG step against a 12.7 ms unpadded FLOP bound — 55% efficiency,
the worst in the model.

This kernel computes the whole FF block per row-tile in VMEM:

    s = x @ W1 + b1          # [bm, 2·I] fp32 accumulator, never leaves VMEM
    h = s[:, :I] * gelu(s[:, I:])
    y = h @ W2 + b2          # [bm, C] written once

HBM traffic drops from ~5 full-width passes to exactly one read of ``x`` and
one write of ``y`` (plus resident weights). ``gelu`` is the exact-erf form
(Mosaic has no ``erf`` primitive) with a dtype-dependent polynomial:
fp32 inputs use a two-piece approximation with max |err| 5.5e-7; the bf16
production path uses a single-piece degree-6 fit with max |err| 3.6e-4 —
still below bf16 output rounding (2^-8 relative) and ~45% fewer VPU ops,
a measured -2.7 ms/step on the gate's 735M elements (validated in
tests/test_geglu_ff.py).

Differentiation: ``custom_vjp`` whose backward recomputes through a plain-XLA
reference implementation — training pays the unfused cost, inference (the
bench path) pays none.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["geglu_ff", "ff_supported"]

_LOG2E = 1.4426950408889634
_SQRT_HALF = 0.7071067811865476

# erf(x) = x * P(x²) on |x| ≤ 2 (coefficients low→high, fit in f64, max f32
# error 5.4e-7 — see module docstring)
_ERF_P1 = (
    1.1283791, -0.37612432, 0.11282301, -0.02682472, 0.0051657218,
    -0.00080803805, 9.7733006e-05, -7.990441e-06, 3.2044426e-07,
)
# erfc(x) = exp(-x²) * Q(x) on 2 < x ≤ 4.2 (max f32 error 5.5e-8)
_ERF_P2 = (
    0.8523957, -0.66784686, 0.31853193, -0.09541887, 0.017546114,
    -0.0018116448, 8.047041e-05,
)
# fast single-piece fit erf(x) ≈ x·P6(x²) on |x| ≤ 3, clamped beyond —
# max |err| 3.6e-4, invisible after bf16 output rounding (2⁻⁸ ulp) and
# ~45% fewer VPU ops than the two-piece exact form. The GELU gate runs on
# 735M elements per CFG UNet step, so the gelu polynomial is a measured
# ~0.3-0.5 ms/site cost at the [65536,1280] sites (profile r2).
_ERF_FAST = (
    1.12646408, -0.366942461, 0.0998401577, -0.0183764236, 0.00211666563,
    -0.000135903813, 3.68124527e-06,
)

# VMEM cap for the fp32 [bm, 2I] accumulator when picking the row tile
_ACC_VMEM_BYTES = 12 * 1024 * 1024
_MAX_BLOCK_M = 1024


def _poly(t, coeffs):
    acc = jnp.full_like(t, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * t + c
    return acc


def _erf_f32(x):
    """Two-piece f32 erf approximation (Mosaic has no erf primitive)."""
    a = jnp.abs(x)
    a_in = jnp.minimum(a, 4.2)
    # |x| <= 2 : x * P(x²)
    small = a_in * _poly(a_in * a_in, _ERF_P1)
    # 2 < |x| <= 4.2 : 1 - exp(-x²) Q(x), exp via the VPU-native exp2
    tail = 1.0 - jnp.exp2(-(a_in * a_in) * _LOG2E) * _poly(a_in, _ERF_P2)
    r = jnp.where(a_in <= 2.0, small, tail)
    r = jnp.where(a > 4.2, 1.0, r)
    return jnp.sign(x) * r


def _gelu_f32(g):
    """Exact-erf GELU on fp32 (matches jax.nn.gelu(approximate=False))."""
    return 0.5 * g * (1.0 + _erf_f32(g * _SQRT_HALF))


def _erf_fast_f32(x):
    """Single-piece erf for bf16 outputs (max |err| 3.6e-4 — sub-bf16-ulp)."""
    a = jnp.minimum(jnp.abs(x), 3.0)
    r = a * _poly(a * a, _ERF_FAST)
    r = jnp.where(jnp.abs(x) > 3.0, 1.0, r)
    return jnp.sign(x) * r


def _gelu_fast_f32(g):
    """GELU via the short erf poly — used in-kernel where outputs are bf16."""
    return 0.5 * g * (1.0 + _erf_fast_f32(g * _SQRT_HALF))


def _kernel_int8(x_ref, w1aq_ref, w1gq_ref, sw1a_ref, sw1g_ref, b1a_ref,
                 b1g_ref, w2q_ref, sw2_ref, b2_ref, o_ref):
    """W8A8 variant (VERDICT r4 next-round #1a): activations quantized
    in-register per row (amortizing exactly the XLA-level dynamic-quant
    overhead that made dense int8 LOSE at these sites, ops/quant.py r4
    stage-A), weights pre-quantized outside per column. Both GEGLU dots and
    the output projection run int8xint8->int32 on the MXU (2x the bf16
    rate on v5e); dequant + bias + gelu stay fp32 in VMEM.
    """
    x = x_ref[...].astype(jnp.float32)                   # [bm, C]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
    a = jax.lax.dot(xq, w1aq_ref[...],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    a = a * (sx * sw1a_ref[...]) + b1a_ref[...]
    g = jax.lax.dot(xq, w1gq_ref[...],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    g = g * (sx * sw1g_ref[...]) + b1g_ref[...]
    h = a * _gelu_fast_f32(g)                            # [bm, I] fp32
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0,
                     1e-12)
    hq = jnp.clip(jnp.round(h / sh), -127.0, 127.0).astype(jnp.int8)
    o = jax.lax.dot(hq, w2q_ref[...],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    o_ref[...] = (o * (sh * sw2_ref[...]) + b2_ref[...]).astype(o_ref.dtype)


def _quantize_cols(w):
    """Per-output-channel symmetric weight quantization (fp32 math, done in
    XLA outside the kernel — loop-invariant, so LICM hoists it out of the
    sampler scan; weights stay jit ARGUMENTS per the zero-param-CSE rule)."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(wf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _kernel(x_ref, w1a_ref, w1g_ref, b1a_ref, b1g_ref, w2_ref, b2_ref,
            o_ref):
    # value/gate projections as two separate dots (the [bm, 2I] fused
    # accumulator + in-kernel split measured 2-3x slower: value slicing
    # forces relayouts of a huge fp32 register footprint)
    x = x_ref[...]                                      # [bm, C]
    a = jax.lax.dot(x, w1a_ref[...],
                    preferred_element_type=jnp.float32) + b1a_ref[...]
    g = jax.lax.dot(x, w1g_ref[...],
                    preferred_element_type=jnp.float32) + b1g_ref[...]
    # bf16 outputs can't see the short poly's 3.6e-4 error; fp32 callers
    # (interpret-mode tests) keep the exact two-piece erf
    gelu = _gelu_fast_f32 if x.dtype == jnp.bfloat16 else _gelu_f32
    h = (a * gelu(g)).astype(x.dtype)                   # [bm, I]
    o = jax.lax.dot(h, w2_ref[...],
                    preferred_element_type=jnp.float32)  # [bm, C_out]
    o_ref[...] = (o + b2_ref[...]).astype(o_ref.dtype)


# measured optima on v5e (tools/bench_attn.py ff, r2): kernel beats XLA at
# every SD FF site — 2.67 vs 3.38 ms (c320/i1280), 1.92 vs 2.36 (c640/i2560),
# 1.98 vs 2.10 (c1280/i5120)
_BM_BY_INNER = {1280: 1024, 2560: 256, 5120: 512}

# W8A8 optima + per-site gate (tools/bench_attn.py ff, v5e, r5 — int8 column
# vs the best bf16 block): c320/i1280 is a WASH at best (2.349 vs 2.349 at
# bm512, loses at other blocks) -> stays bf16 (zero quality cost for zero
# speed); c640/i2560 int8 bm256 1.584 vs bf16 1.776 (-11%); c1280/i5120 int8
# bm256 1.400 vs bf16 1.810 (-23%).
_BM_BY_INNER_INT8 = {2560: 256, 5120: 256}
_INT8_MIN_INNER = 2560


def _bm_table():
    """``SD_TPU_FF_BM=\"1280:512,2560:512\"`` overrides the measured block_m
    table for in-context sweeps (tools/profile_op.py)."""
    import os

    env = os.environ.get("SD_TPU_FF_BM")
    if not env:
        return _BM_BY_INNER
    table = dict(_BM_BY_INNER)
    for part in env.split(","):
        part = part.strip()
        if not part:
            continue
        try:
            k, v = part.split(":")
            table[int(k)] = int(v)
        except ValueError as e:
            raise ValueError(
                f"malformed SD_TPU_FF_BM entry {part!r} "
                f"(expected inner:block_m, e.g. 1280:512)") from e
    return table


def _block_m(m: int, inner: int, block_m: Optional[int]) -> int:
    bm = (block_m or _bm_table().get(inner)
          or min(_MAX_BLOCK_M, _ACC_VMEM_BYTES // (8 * inner)))
    bm = max(min(bm, m), 8)
    while bm > 8 and m % bm:
        bm //= 2
    if m % bm:
        # clamping back up would make the grid m//bm skip tail rows silently
        raise ValueError(
            f"geglu_ff: m={m} has no valid block_m (needs a divisor >= 8); "
            f"pad rows or use the XLA path")
    return bm


def ff_supported(x, inner: int) -> bool:
    """True where the fused kernel is usable and measured faster than XLA.

    ``SD_TPU_FUSED_FF=0`` disables (the kernel has no SPMD partition rule,
    so tensor-parallel layouts must take the XLA path — ``parallel/tp.py``
    sets this automatically when TP specs are built).
    """
    import os

    if os.environ.get("SD_TPU_FUSED_FF", "1").lower() in ("0", "off", "false"):
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    if x.dtype != jnp.bfloat16:
        return False
    if inner % 128 != 0:  # the gate slice must be lane-aligned
        return False
    m = 1
    for s in x.shape[:-1]:
        m *= s
    return m >= 1024 and m % 256 == 0


def _ff_reference(x, w1, b1, w2, b2):
    """Plain-XLA mirror of the kernel math (fp32 islands identical); used as
    the custom_vjp backward and in parity tests."""
    s = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    inner = w2.shape[0]
    a, g = s[..., :inner], s[..., inner:]
    h = (a * jax.nn.gelu(g, approximate=False)).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return o.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _geglu_ff(x2d, w1a, w1g, b1a, b1g, w2, b2,
              interpret: bool, block_m: Optional[int]):
    m, c = x2d.shape
    inner = w2.shape[0]
    c_out = w2.shape[1]
    bm = _block_m(m, inner, block_m)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, c_out), x2d.dtype),
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((c, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((inner, c_out), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_out), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, c_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * inner + 2 * m * inner * c_out,
            bytes_accessed=(x2d.size + m * c_out) * x2d.dtype.itemsize
            + (w1a.size + w1g.size + w2.size) * w2.dtype.itemsize,
            transcendentals=m * inner,
        ),
        interpret=interpret,
    )(x2d, w1a, w1g, b1a, b1g, w2, b2)


def _geglu_ff_fwd(x2d, w1a, w1g, b1a, b1g, w2, b2, interpret, block_m):
    return (_geglu_ff(x2d, w1a, w1g, b1a, b1g, w2, b2, interpret, block_m),
            (x2d, w1a, w1g, b1a, b1g, w2, b2))


def _split_reference(x, w1a, w1g, b1a, b1g, w2, b2):
    a = jnp.dot(x, w1a, preferred_element_type=jnp.float32) + b1a
    g = jnp.dot(x, w1g, preferred_element_type=jnp.float32) + b1g
    h = (a * jax.nn.gelu(g, approximate=False)).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return o.astype(x.dtype)


def _geglu_ff_bwd(interpret, block_m, res, g):
    _, vjp = jax.vjp(_split_reference, *res)
    return vjp(g)


_geglu_ff.defvjp(_geglu_ff_fwd, _geglu_ff_bwd)


def _geglu_ff_int8(x2d, w1a, w1g, b1a, b1g, w2, b2,
                   interpret: bool, block_m: Optional[int],
                   prequant=None):
    """Inference-only W8A8 path (no vjp: round() is zero-gradient a.e.;
    training is guarded off in LDMTrainer.train_step).

    ``prequant``: optional ``(w1aq, sw1a, w1gq, sw1g, w2q, sw2)`` quantized
    at load time (ops/quant.py::prequantize_weights — bitwise the same math
    as the inline ``_quantize_cols`` calls below, hoisted out of sampler
    scan programs; tools/exp_wq_hoist.py)."""
    m, c = x2d.shape
    inner = w2.shape[0]
    c_out = w2.shape[1]
    bm = _block_m(m, inner, block_m or _BM_BY_INNER_INT8.get(inner))
    if prequant is not None:
        w1aq, sw1a, w1gq, sw1g, w2q, sw2 = prequant
    else:
        w1aq, sw1a = _quantize_cols(w1a)
        w1gq, sw1g = _quantize_cols(w1g)
        w2q, sw2 = _quantize_cols(w2)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        _kernel_int8,
        out_shape=jax.ShapeDtypeStruct((m, c_out), x2d.dtype),
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((c, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((inner, c_out), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_out), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_out), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, c_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * inner + 2 * m * inner * c_out,
            bytes_accessed=(x2d.size + m * c_out) * x2d.dtype.itemsize
            + w1aq.size + w1gq.size + w2q.size,
            transcendentals=m * inner,
        ),
        interpret=interpret,
    )(x2d, w1aq, w1gq, sw1a, sw1g, b1a, b1g, w2q, sw2, b2)


def geglu_ff(x, w1, b1, w2, b2, *, interpret: bool = False,
             block_m: Optional[int] = None, int8: Optional[bool] = None,
             prequant=None):
    """Fused GEGLU feed-forward: ``(x@w1+b1) -> a * gelu(g) -> @w2+b2``.

    Args:
      x: ``[..., C]`` activations (bf16 on the fast path).
      w1: ``[C, 2*inner]`` GEGLU projection (value half first, gate second —
        the reference's ``chunk(2, dim=-1)`` order, ``attention.py:42-44``).
      b1: ``[2*inner]`` bias.
      w2: ``[inner, C_out]`` output projection. b2: ``[C_out]`` bias.
      int8: W8A8 path (``_kernel_int8``). None = dispatch on the
        ``SD_TPU_INT8`` 'ff' bucket (inference serving mode, quality-gated
        by tools/int8_quality.py).
      prequant: optional load-time-quantized weights
        ``(w1aq, sw1a, w1gq, sw1g, w2q, sw2)`` for the int8 path (the ``qw``
        overlay — ops/quant.py::prequantize_weights); ignored on the bf16
        path.
    """
    if int8 is None:
        from sd_tpu.ops.quant import int8_bucket_enabled

        # per-site gate: int8 only where it MEASURED faster (see
        # _BM_BY_INNER_INT8 table note) — the c320/inner=1280 site stays
        # bf16, so the 'ff' bucket costs no quality where it buys no speed
        int8 = (int8_bucket_enabled("ff", x.dtype)
                and w2.shape[0] >= _INT8_MIN_INNER)
    orig_shape = x.shape
    c = orig_shape[-1]
    inner = w2.shape[0]
    c_out = w2.shape[1]
    x2d = x.reshape(-1, c)
    w1 = w1.astype(x.dtype)
    b1 = b1.astype(jnp.float32)
    # value half first, gate second (the reference's chunk(2, dim=-1) order)
    w1a, w1g = w1[:, :inner], w1[:, inner:]
    b1a, b1g = b1[:inner].reshape(1, -1), b1[inner:].reshape(1, -1)
    b2 = b2.astype(jnp.float32).reshape(1, -1)
    w2 = w2.astype(x.dtype)
    if int8:
        out = _geglu_ff_int8(x2d, w1a, w1g, b1a, b1g, w2, b2, interpret,
                             block_m, prequant=prequant)
    else:
        out = _geglu_ff(x2d, w1a, w1g, b1a, b1g, w2, b2, interpret, block_m)
    return out.reshape(*orig_shape[:-1], c_out)
