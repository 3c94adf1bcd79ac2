"""W8A8 int8 dense matmul kernel — the attention-projection bucket.

VERDICT r4 #1 follow-through (r5): after int8 landed in the conv, GEGLU-FF
and flash-QK^T buckets (95.41 ms in-context vs 113.80 bf16), the remaining
MXU-bound work is the attention projections: to_q/to_k/to_v/to_out at every
SpatialTransformer block (~8.9 ms at 87% of the bf16 bound, floor-table r3)
plus the XLA cross einsums (~8.0 ms). XLA-level dynamic-quant dense LOSES
at these sites (quant overhead, ops/quant.py stage-A r4) — exactly the
overhead an in-register Pallas quant amortizes, which is how the FF bucket
went from losing (XLA-level) to -11/-23% (in-kernel).

Two structural advantages over per-projection XLA dots:
  - self-attention QKV fuses into ONE [BN,C]x[C,3C] int8 matmul — the
    activation row-max/quantize pass is paid once for all three projections;
  - the int8 MXU rate is 2x bf16 (394 vs 197 TOPS on v5e).

Known cost: XLA's bf16 lowering fuses the head-split reshape + flash
transpose INTO the projection dots (r3 projbar ablation: breaking that
fusion costs ~+1.9 ms/step) — the kernel re-pays those copies, so the net
is measured IN-CONTEXT (tools/bench_attn.py unet int8proj/int8fullproj)
before the bucket ships in any default.

Scheme matches the other W8A8 buckets: per-row dynamic symmetric activation
scale computed in-register, per-output-channel symmetric weight scales
computed in XLA outside (loop-invariant -> LICM hoists them out of sampler
scans; weights stay jit ARGUMENTS per the zero-param-CSE rule), int8xint8
-> int32 MXU dot, fp32 dequant + bias epilogue.

Inference-only (round() has zero gradient a.e.) — the trainer guard in
training/diffusion_loss.py refuses SD_TPU_INT8 during training.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sd_tpu.ops.pallas.geglu_ff import _quantize_cols

__all__ = ["int8_dense"]

_DEFAULT_BM = 256  # FF-kernel optimum at the wide-F sites (bench_attn ff r5)


def _kernel(x_ref, wq_ref, sw_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                    # [bm, C]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
    o = jax.lax.dot(xq, wq_ref[...],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    o_ref[...] = (o * (sx * sw_ref[...]) + b_ref[...]).astype(o_ref.dtype)


def _block_m(m: int, block_m: Optional[int]) -> Optional[int]:
    bm = min(block_m or _DEFAULT_BM, m)
    while bm > 8 and m % bm:
        bm //= 2
    return None if m % bm else bm


def int8_dense(x, w, b=None, *, block_m: Optional[int] = None,
               interpret: bool = False):
    """``x @ w + b`` with in-register W8A8 quantization.

    Args:
      x: ``[..., C]`` activations (bf16 on the fast path).
      w: ``[C, F]`` weight (fp32/bf16 — quantized per output channel here).
      b: optional ``[F]`` bias (fp32 epilogue).

    Falls back to the plain XLA dot when the row count has no valid block
    divisor (never silently drops rows).
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    f = w.shape[1]
    x2d = x.reshape(-1, c)
    m = x2d.shape[0]
    bm = _block_m(m, block_m)
    if bm is None:
        out = jnp.dot(x2d, w.astype(x.dtype))
        if b is not None:
            out = (out.astype(jnp.float32) + b.astype(jnp.float32)
                   ).astype(x.dtype)
        return out.reshape(*orig_shape[:-1], f)
    wq, sw = _quantize_cols(w)
    b2d = (jnp.zeros((1, f), jnp.float32) if b is None
           else b.astype(jnp.float32).reshape(1, -1))
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, f), x2d.dtype),
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * f,
            bytes_accessed=x2d.size * x2d.dtype.itemsize + wq.size
            + m * f * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, wq, sw, b2d)
    return out.reshape(*orig_shape[:-1], f)
