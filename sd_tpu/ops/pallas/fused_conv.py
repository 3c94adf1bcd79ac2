"""Fused GroupNorm-apply + SiLU + 3x3 conv (+bias/+residual/+stats) kernel.

Every resblock conv in the reference
(``ldm/modules/diffusionmodules/openaimodel.py:163-275``,
``model.py:82-141``) is the sequence GN -> SiLU -> conv3x3 (+bias, +emb,
+skip), and the NEXT GroupNorm immediately reduces the result for its
statistics. The r3 device profile (tools/trace_summary.py) showed XLA's
handling of that chain costs ~13 ms/step: the stats reduce fuses into the
conv fusion and drops the conv emitter to 40-60% of its padded-FLOP bound,
while the normalize/SiLU interludes burn extra HBM passes.

This kernel computes the whole chain in one VMEM residency:

  prologue   xn = x*A[b,c] + D[b,c]; h = silu(xn)       (A/D fold GN stats,
             gamma/beta, the previous conv's bias and the timestep
             embedding — computed as tiny [B,C] XLA ops by the caller)
  conv       y = conv3x3(h, w)  as 9 MXU dots (K=Cin per tap; the dy taps
             are free major-dim slices of the halo'd row window, the dx
             taps one-sublane ``pltpu.roll``s — zero layout-copy cost, the
             requirement distilled from the Winograd post-mortem in
             ``winograd_conv.py``)
  epilogue   y += bias [+ skip];  optional per-channel moments
             (sum, sum-of-squares over H,W) so the NEXT GroupNorm needs no
             read of y at all.

Input rows stream HBM->VMEM by explicit double-buffered DMA (overlapping
halo windows — BlockSpecs cannot overlap, and a host-side halo prep pass
was the measured kill factor for the Winograd kernel). Weights load once
per output-channel tile into a single-buffered scratch.

Differentiation follows the winograd/geglu policy: ``custom_vjp`` that
recomputes through the XLA reference composite — inference pays nothing,
training pays one extra forward inside the rematerialized backward.

Layout contract: NHWC x [B,H,W,C], HWIO w [3,3,C,N]; requires W % 16 == 0
(bf16 sublane-exact reshape [trh,W,C] -> [trh*W,C]), H % 8 == 0. 8x8 sites
(UNet l3) stay on XLA — measured at bound there.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv3x3", "fused_conv_supported", "fused_conv_enabled",
           "fold_gn_affine"]

_LOG2E = 1.4426950408889634
_VMEM_BUDGET = 13 * 1024 * 1024


class _Cfg(NamedTuple):
    prologue: bool
    has_bias: bool
    has_skip: bool
    emit_moments: bool
    trh: int
    tk: int
    interpret: bool


def _silu_f32(xf):
    # sigmoid via exp2 (measured faster than exp on v5e, fp32 > bf16)
    s = 1.0 / (1.0 + jnp.exp2(xf * (-_LOG2E)))
    return xf * s


def _kernel(cfg: _Cfg, ng: int, h_img: int, *refs):
    """One (cout-tile, batch, row-tile) grid cell."""
    trh, tk = cfg.trh, cfg.tk
    i = 0
    x_hbm = refs[i]; i += 1
    w_hbm = refs[i]; i += 1
    if cfg.prologue:
        a_ref = refs[i]; i += 1
        d_ref = refs[i]; i += 1
    if cfg.has_bias:
        bias_ref = refs[i]; i += 1
    if cfg.has_skip:
        skip_ref = refs[i]; i += 1
    y_ref = refs[i]; i += 1
    if cfg.emit_moments:
        m1_ref = refs[i]; i += 1
        m2_ref = refs[i]; i += 1
    xbuf = refs[i]; i += 1
    wbuf = refs[i]; i += 1
    sem_x = refs[i]; i += 1
    sem_w = refs[i]; i += 1

    ki = pl.program_id(0)
    bi = pl.program_id(1)
    ri = pl.program_id(2)
    w_img, c = x_hbm.shape[2], x_hbm.shape[3]

    # ---- weight tile: fetched once per ki sweep, single-buffered ----
    # (slice only when actually tiled: a pl.ds over the full lane dim trips
    # Mosaic's 128-alignment check for N like 320)
    w_src = w_hbm if w_hbm.shape[-1] == tk else w_hbm.at[:, :, pl.ds(
        pl.multiple_of(ki * tk, 128), tk)]

    @pl.when(jnp.logical_and(bi == 0, ri == 0))
    def _fetch_w():
        dma = pltpu.make_async_copy(w_src, wbuf, sem_w)
        dma.start()
        dma.wait()

    # ---- input row windows: double-buffered DMA with halo overlap ----
    # window r covers image rows [r*trh-1, r*trh+trh+1); edge windows read
    # one fewer row and the missing halo row is masked to zero after the
    # prologue (SAME padding zeros live in the normalized domain).
    def start_window(r, slot):
        if ng == 1:
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, trh)],
                xbuf.at[slot, pl.ds(1, trh)], sem_x.at[slot])
            dma.start()
            return
        @pl.when(r == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, trh + 1)],
                xbuf.at[slot, pl.ds(1, trh + 1)], sem_x.at[slot]).start()
        @pl.when(r == ng - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(h_img - trh - 1, trh + 1)],
                xbuf.at[slot, pl.ds(0, trh + 1)], sem_x.at[slot]).start()
        @pl.when(jnp.logical_and(r > 0, r < ng - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(r * trh - 1, trh + 2)],
                xbuf.at[slot], sem_x.at[slot]).start()

    def wait_window(r, slot):
        if ng == 1:
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, trh)],
                xbuf.at[slot, pl.ds(1, trh)], sem_x.at[slot]).wait()
            return
        @pl.when(r == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, trh + 1)],
                xbuf.at[slot, pl.ds(1, trh + 1)], sem_x.at[slot]).wait()
        @pl.when(r == ng - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(h_img - trh - 1, trh + 1)],
                xbuf.at[slot, pl.ds(0, trh + 1)], sem_x.at[slot]).wait()
        @pl.when(jnp.logical_and(r > 0, r < ng - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(r * trh - 1, trh + 2)],
                xbuf.at[slot], sem_x.at[slot]).wait()

    slot = jax.lax.rem(ri, 2)
    @pl.when(ri == 0)
    def _():  # first window of a (ki, bi) sweep has no prefetch behind it
        start_window(0, slot)
    wait_window(ri, slot)
    @pl.when(ri + 1 < ng)
    def _():  # prefetch the next window into the other buffer
        start_window(ri + 1, jax.lax.rem(ri + 1, 2))

    xw = xbuf[slot]                                   # [trh+2, W, C]

    # ---- prologue: folded GN affine + SiLU (fp32), bf16 once ----
    if cfg.prologue:
        af = a_ref[0, 0].astype(jnp.float32)
        df = d_ref[0, 0].astype(jnp.float32)
        xf = xw.astype(jnp.float32) * af[None, None, :] + df[None, None, :]
        h = _silu_f32(xf).astype(xw.dtype)
    else:
        h = xw
    # zero the halo rows that fell outside the image (also blanks the stale
    # buffer rows the edge DMAs never wrote)
    row = jax.lax.broadcasted_iota(jnp.int32, (trh + 2, 1, 1), 0)
    pad = jnp.logical_or(jnp.logical_and(ri == 0, row == 0),
                         jnp.logical_and(ri == ng - 1, row == trh + 1))
    h = jnp.where(pad, jnp.zeros((), h.dtype), h)

    # dx taps as one-sublane shifts with SAME-pad zero columns (concat, not
    # pltpu.roll — Mosaic's rotate only supports 32-bit element types)
    zcol = jnp.zeros((trh + 2, 1, c), h.dtype)
    hl = jnp.concatenate([zcol, h[:, :-1, :]], axis=1)   # reads column q-1
    hr = jnp.concatenate([h[:, 1:, :], zcol], axis=1)    # reads column q+1

    # ---- conv: 9 MXU dots, dy via free major-dim slices ----
    acc = jnp.zeros((trh * w_img, tk), jnp.float32)
    for dy in range(3):
        for dx, src in ((0, hl), (1, h), (2, hr)):
            lhs = src[dy:dy + trh].reshape(trh * w_img, c)
            acc = acc + jax.lax.dot(
                lhs, wbuf[3 * dy + dx],
                preferred_element_type=jnp.float32)

    # ---- epilogue ----
    if cfg.has_bias:
        acc = acc + bias_ref[0].astype(jnp.float32)[None, :]
    if cfg.has_skip:
        acc = acc + skip_ref[0].reshape(trh * w_img, tk).astype(jnp.float32)
    yb = acc.astype(y_ref.dtype)
    y_ref[0] = yb.reshape(trh, w_img, tk)
    if cfg.emit_moments:
        # row-sums as MXU dots with a ones block — a VPU jnp.sum over the
        # sublane axis costs ~0.5 ms/call in cross-sublane shuffles
        # (measured, tools/exp_fused_kernel_tpu.py); the MXU does it free.
        # fp32 accumulation keeps the sums exact; the squares round through
        # the compute dtype (exact in fp32, ~2e-4 relative in bf16).
        ones = jnp.ones((8, trh * w_img), yb.dtype)
        m1_ref[0, 0] = jax.lax.dot(ones, yb,
                                   preferred_element_type=jnp.float32)
        ysq = jnp.square(yb.astype(jnp.float32)).astype(yb.dtype)
        m2_ref[0, 0] = jax.lax.dot(ones, ysq,
                                   preferred_element_type=jnp.float32)


def _pad128(v):
    return -(-v // 128) * 128


def _vmem_estimate(trh, w_img, c, tk, itemsize):
    cp, tkp = _pad128(c), _pad128(tk)
    win = (trh + 2) * w_img * cp * itemsize
    win_f32 = (trh + 2) * w_img * cp * 4
    return (9 * c * tkp * itemsize          # wbuf
            + 2 * win                        # xbuf double buffer
            + 3 * win                        # h/hl/hr temporaries
            + win_f32                        # fp32 prologue intermediate
            + trh * w_img * tkp * 4          # acc
            + 4 * trh * w_img * tkp * itemsize)  # y (+skip) pipelined blocks


def _pick_tiles(h_img, w_img, c, n, itemsize):
    # W % 16: the free [trh, W, C] <-> [trh*W, C] reshape needs W to be a
    # multiple of the bf16 sublane tile. C % 128: Mosaic requires sliced
    # DMAs (the halo row windows) to have a 128-aligned lane extent — the
    # C=320/960 UNet level-0 sites stay on XLA, where they already run at
    # 97-100% of their padded bound (tools/floor_table.py).
    if h_img % 8 or w_img % 16 or w_img < 16 or c % 128:
        return None, None
    trh = 8
    candidates = [n] + [t for t in (1280, 1024, 768, 640, 512, 384, 256, 128)
                        if t < n and n % t == 0 and t % 128 == 0]
    for tk in candidates:
        if tk != n and tk % 128:
            continue
        if _vmem_estimate(trh, w_img, c, tk, itemsize) <= _VMEM_BUDGET:
            return trh, tk
    return None, None


def fused_conv_enabled(mode: str = "auto", interpret: bool = False) -> bool:
    """Dispatch decision (shape gate is ``fused_conv_supported``).

    MEASURED IN-CONTEXT LOSS (v5e, r3 — tools/exp_fused_conv.py): the CFG
    UNet step runs 111.3 ms with this kernel dispatched at every supported
    site vs 107.0 ms on XLA. Two causes, isolated with
    tools/exp_fused_kernel_tpu.py + tools/profile_op.py:
    (1) XLA lays activations out as {3,0,2,1} (batch on sublanes) and its
        conv emitter runs 83-100% of the padded-FLOP bound in-context
        (0.63 ms at l1 incl. fused GN stats); the Pallas boundary forces
        row-major operands, inserting layout copies both ways per call;
    (2) even ignoring copies, the 9-dot kernel's best standalone time
        (~0.85 ms at l1 after subtracting the ~1 ms dispatch bias) does not
        beat XLA's in-context conv.
    Dispatch is therefore OFF by default — the same evidence-based policy
    as the Winograd kernel. ``SD_TPU_FUSED_CONV=1``/``force`` re-enables
    for experiments; the kernel stays parity-tested and differentiable.
    """
    env = os.environ.get("SD_TPU_FUSED_CONV", "auto")
    if env in ("0", "off") or mode == "off":
        return False
    if interpret:
        return True
    return env in ("1", "force") or mode == "force"


def fused_conv_supported(x_shape, w_shape, dtype) -> bool:
    """Shape/dtype gate (not the dispatch decision — see ops/conv dispatch)."""
    if len(x_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    _, h_img, w_img, c = x_shape
    n = w_shape[3]
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if h_img % 8 or w_img % 16 or w_img < 16 or c < 128 or n < 128:
        return False
    trh, tk = _pick_tiles(h_img, w_img, c, n,
                          jnp.dtype(dtype).itemsize)
    return trh is not None


def _fused_pallas(cfg: _Cfg, x, w9, a, d, bias, skip):
    b, h_img, w_img, c = x.shape
    n = w9.shape[-1]
    trh, tk = cfg.trh, cfg.tk
    ng, kt = h_img // trh, n // tk
    grid = (kt, b, ng)

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),   # x (manual DMA)
                pl.BlockSpec(memory_space=pltpu.ANY)]   # w9 (manual DMA)
    args = [x, w9.astype(x.dtype)]
    if cfg.prologue:
        # [B, 1, C] blocks: a bare (1, C) block of a [B, C] array violates
        # Mosaic's second-to-last-dim rule (divisible by 8 or full)
        in_specs += [pl.BlockSpec((1, 1, c), lambda ki, bi, ri: (bi, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [a[:, None, :], d[:, None, :]]
    if cfg.has_bias:
        in_specs.append(pl.BlockSpec((1, tk), lambda ki, bi, ri: (0, ki),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, n))
    if cfg.has_skip:
        in_specs.append(pl.BlockSpec(
            (1, trh, w_img, tk), lambda ki, bi, ri: (bi, ri, 0, ki),
            memory_space=pltpu.VMEM))
        args.append(skip)

    out_shapes = [jax.ShapeDtypeStruct((b, h_img, w_img, n), x.dtype)]
    out_specs = [pl.BlockSpec((1, trh, w_img, tk),
                              lambda ki, bi, ri: (bi, ri, 0, ki),
                              memory_space=pltpu.VMEM)]
    if cfg.emit_moments:
        # [B, NG, 8, N]: the kernel's ones-dot emits 8 identical sum rows
        # (sublane-aligned block); the host reads row 0
        out_shapes += [jax.ShapeDtypeStruct((b, ng, 8, n), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, 1, 8, tk),
                                   lambda ki, bi, ri: (bi, ri, 0, ki),
                                   memory_space=pltpu.VMEM)] * 2

    flops = 2 * b * h_img * w_img * 9 * c * n
    out = pl.pallas_call(
        functools.partial(_kernel, cfg, ng, h_img),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, trh + 2, w_img, c), x.dtype),
            pltpu.VMEM((9, c, tk), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(kt * x.size + 9 * c * n + 2 * x.size
                            ) * x.dtype.itemsize,
            transcendentals=b * h_img * w_img * c if cfg.prologue else 0),
        interpret=cfg.interpret,
    )(*args)
    if cfg.emit_moments:
        y, m1, m2 = out
        return y, m1[:, :, 0].sum(axis=1), m2[:, :, 0].sum(axis=1)
    return out[0] if isinstance(out, (list, tuple)) else out


def _reference(cfg: _Cfg, x, w9, a, d, bias, skip):
    """XLA composite with the kernel's exact numerics (vjp + CPU path)."""
    if cfg.prologue:
        xf = (x.astype(jnp.float32) * a[:, None, None, :]
              + d[:, None, None, :])
        h = _silu_f32(xf).astype(x.dtype)
    else:
        h = x
    c, n = w9.shape[1], w9.shape[2]
    w = w9.reshape(3, 3, c, n).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if cfg.has_bias:
        y = y + bias.astype(jnp.float32)
    if cfg.has_skip:
        y = y + skip.astype(jnp.float32)
    yb = y.astype(x.dtype)
    if cfg.emit_moments:
        yf = yb.astype(jnp.float32)
        return yb, jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))
    return yb


def _dispatch(cfg: _Cfg, x, w9, a, d, bias, skip):
    platform = jax.devices()[0].platform
    if cfg.interpret or platform == "tpu":
        return _fused_pallas(cfg, x, w9, a, d, bias, skip)
    return _reference(cfg, x, w9, a, d, bias, skip)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fc(cfg, x, w9, a, d, bias, skip):
    return _dispatch(cfg, x, w9, a, d, bias, skip)


def _fc_fwd(cfg, x, w9, a, d, bias, skip):
    return _fc(cfg, x, w9, a, d, bias, skip), (x, w9, a, d, bias, skip)


def _fc_bwd(cfg, res, g):
    x, w9, a, d, bias, skip = res
    _, vjp = jax.vjp(
        lambda *ar: _reference(cfg, *ar), x, w9, a, d, bias, skip)
    return vjp(g)


_fc.defvjp(_fc_fwd, _fc_bwd)


def fused_conv3x3(x, w, *, a=None, d=None, bias=None, skip=None,
                  emit_moments: bool = False, trh: Optional[int] = None,
                  tk: Optional[int] = None, interpret: bool = False):
    """Fused (affine+SiLU) -> conv3x3 -> (+bias, +skip, moments).

    ``a``/``d`` are the folded GroupNorm(+emb) affine [B, C] (fp32); both or
    neither. Returns ``y`` or ``(y, sum_c, sumsq_c)`` with the per-channel
    moments [B, N] of the bf16-rounded output (exactly what the next
    GroupNorm's statistics need). Differentiable via recompute-through-XLA.
    """
    if (a is None) != (d is None):
        raise ValueError("a and d must be given together")
    b, h_img, w_img, c = x.shape
    n = w.shape[-1]
    trh0, tk0 = _pick_tiles(h_img, w_img, c, n, x.dtype.itemsize)
    trh = trh or trh0
    tk = tk or tk0
    if trh is None or tk is None or h_img % trh or n % tk:
        raise ValueError(
            f"fused_conv3x3: unsupported shape x={x.shape} n={n} "
            f"(trh={trh}, tk={tk}) — gate with fused_conv_supported")
    cfg = _Cfg(prologue=a is not None, has_bias=bias is not None,
               has_skip=skip is not None, emit_moments=emit_moments,
               trh=trh, tk=tk, interpret=interpret)
    w9 = w.reshape(9, c, n)
    return _fc(cfg, x, w9, a, d, bias, skip)


def fold_gn_affine(mean, meansq, scale, bias, eps, extra_scale=None,
                   channel_offset=None, extra_shift=None):
    """Fold GroupNorm stats + gamma/beta (+FiLM scale/shift, +channel
    offsets already inside the input) into per-(batch, channel) A/D.

    ``mean``/``meansq`` are per-(B, G) fp32 statistics of the PROLOGUE INPUT
    t = x + channel_offset (``channel_offset`` [B, C] or None covers the
    previous conv's bias and the timestep embedding, which the kernel never
    materialized into x). Returns A, D [B, C] with
    normalized = x*A + D  ==  ((t - mean)*rstd*scale + bias)*extra_scale
                              + extra_shift.
    """
    g = mean.shape[-1]
    c = scale.shape[-1]
    cg = c // g
    # clamped like GroupNorm32: E[x^2]-E[x]^2 can round negative past eps on
    # near-constant inputs (fp32 cancellation) and NaN the rsqrt
    rstd = jax.lax.rsqrt(jnp.maximum(meansq - jnp.square(mean), 0.0) + eps)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    mean_c = jnp.repeat(mean, cg, axis=-1)
    a = rstd_c * scale[None, :]
    off = -mean_c
    if channel_offset is not None:
        off = off + channel_offset
    dd = off * rstd_c * scale[None, :] + bias[None, :]
    if extra_scale is not None:
        a = a * extra_scale
        dd = dd * extra_scale
    if extra_shift is not None:
        dd = dd + extra_shift
    return a.astype(jnp.float32), dd.astype(jnp.float32)
