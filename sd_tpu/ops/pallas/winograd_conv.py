"""Winograd F(2x2, 3x3) convolution Pallas kernel for TPU.

Every stride-1 SAME 3x3 conv in the UNet/VAE resblock stacks
(``ldm/modules/diffusionmodules/openaimodel.py:163-275``, ``model.py:82-141``)
costs 9 MACs/output when lowered directly to the MXU, and the level-0
Cout=320 convs additionally pad to 384 lanes (tools/conv_inventory.py: 34.0 ms
unpadded / 36.3 ms lane-padded bound vs 42.2 ms measured for the CFG step's
conv path). XLA-TPU does not use Winograd; F(2x2,3x3) needs only 4
MACs/output (2.25x fewer), which is the only way through that floor.

Math (Lavin & Gray 2015, correlation convention — matches
``lax.conv_general_dilated`` NHWC/HWIO):

    Y = A^T [ (G g G^T) .* (B^T d B) ] A        per 4x4 input tile -> 2x2 out
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

Layout strategy (the part that makes it fast on TPU): the input transform
walks 4x4 tiles at stride 2, which would need stride-2 sublane slicing in
VMEM. Instead the host-side prep splits the padded input into four
(row,col)-parity planes ``P[i][j][b,r,s,:] = x_pad[b,2r+i,2s+j,:]`` so every
transform step inside the kernel is a UNIT-stride slice plus a VPU add:

    row combos   (leading dim, free):   d0-d2, d1+d2, d2-d1, d1-d3
    column combos (one-sublane shift):  b0-b2, b1+b2, b2-b1, b1-b3

The 16 transform-domain matmuls ``V_ab @ U_ab`` run back-to-back on the MXU
with fp32 accumulation and are folded straight into the inverse transform
(24 VPU adds per tile instead of 64 by combining over b first). Outputs are
written as four parity planes and re-interleaved by one fused XLA pass.

Weight transform ``U = (G w G^T)`` is computed in fp32 by XLA per call
(16*Cin*Cout FLOPs — noise). Differentiation: ``custom_vjp`` recomputing
through ``lax.conv_general_dilated`` (training pays the direct cost,
inference pays none) — same policy as ``geglu_ff``.

Numerics: fp32 exact to ~1e-6; in bf16 the Winograd result differs from the
direct bf16 conv by the same order as the direct conv differs from fp32
truth (tools/exp_winograd.py, tests/test_winograd_conv.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["winograd_conv3x3", "winograd_supported", "weight_transform"]

# A^T row coefficients: y_p = sum_a AT[p][a] * (.)
_AT = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))


def weight_transform(w):
    """``w [3,3,Cin,Cout] -> U [16, Cin, Cout]``: G w G^T per channel pair."""
    g = jnp.array(
        [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]],
        jnp.float32)
    u = jnp.einsum("ai,bj,ijco->abco", g, g, w.astype(jnp.float32))
    return u.reshape(16, w.shape[2], w.shape[3])


def _parity_planes(x):
    """Pad SAME and split into the four parity planes [B, R+1, S+1, C]."""
    b, h, w, c = x.shape
    r, s = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return [xp[:, i:i + 2 * r + 1:2, j:j + 2 * s + 1:2, :]
            for i in (0, 1) for j in (0, 1)]  # order: P00 P01 P10 P11


def _acc_signed(cur, m, coeff):
    """Accumulate ``coeff*m`` with coeff in {-1, 0, 1} as pure adds/subs."""
    if coeff == 0.0:
        return cur
    if cur is None:
        return m if coeff > 0 else -m
    return cur + m if coeff > 0 else cur - m


def _kernel(p00, p01, p10, p11, u_ref, *outs_and_scratch, s: int, trh: int,
            interleave: bool, scratch: bool):
    """One (batch, row-tile, cout-tile) cell.

    p_ij: [1, 1, trh+1, S1, C] parity-plane row groups. The prep pass groups
    body rows WITH their halo row (one duplicated row per group) so every
    BlockSpec is a standard non-overlapping Blocked spec: pl.Element windows
    defeat the DMA pipeliner (measured +0.3 ms/conv with >1 cout tile), and
    an in-kernel body+halo concat costs a relayout (measured +0.2 ms/conv).
    u_ref: [16, C, TK]. Outputs: four [1, trh, S, TK] parity planes, or one
    [1, 2*trh, 2*S, TK] interleaved block when ``interleave``. Trailing
    scratch ref: V [16, trh*S, C], computed once per (batch, row) cell and
    reused across cout tiles (the ki grid dim iterates fastest).
    """
    if scratch:
        outs, v_scratch = outs_and_scratch[:-1], outs_and_scratch[-1]
    else:
        outs, v_scratch = outs_and_scratch, None
    c = p00.shape[-1]
    tk = u_ref.shape[-1]

    # B^T row combo for a single a (leading-dim slices, VPU adds); computed
    # lazily per a to keep at most two t arrays live
    def row_t(a):
        d = ((p00[0, 0][:-1], p01[0, 0][:-1]), (p10[0, 0][:-1], p11[0, 0][:-1]),
             (p00[0, 0][1:], p01[0, 0][1:]), (p10[0, 0][1:], p11[0, 0][1:]))
        if a == 0:
            return d[0][0] - d[2][0], d[0][1] - d[2][1]
        if a == 1:
            return d[1][0] + d[2][0], d[1][1] + d[2][1]
        if a == 2:
            return d[2][0] - d[1][0], d[2][1] - d[1][1]
        return d[1][0] - d[3][0], d[1][1] - d[3][1]

    def col_v(a):
        ta0, ta1 = row_t(a)
        # column combos: b0/b1 = t at s, b2/b3 = t at s+1 (one-sublane shift)
        b0, b1 = ta0[:, :s, :], ta1[:, :s, :]
        b2, b3 = ta0[:, 1:s + 1, :], ta1[:, 1:s + 1, :]
        return (b0 - b2, b1 + b2, b2 - b1, b1 - b3)

    use_scratch = v_scratch is not None
    if use_scratch:
        # >1 cout tile: compute V once per (batch,row) cell, reuse across ki
        @pl.when(pl.program_id(2) == 0)
        def _compute_v():
            for a in range(4):
                v = col_v(a)
                for bb in range(4):
                    v_scratch[4 * a + bb] = v[bb].reshape(trh * s, c)

    acc = {}
    for a in range(4):
        v = None if use_scratch else col_v(a)
        z0 = z1 = None
        for bb in range(4):
            lhs = (v_scratch[4 * a + bb] if use_scratch
                   else v[bb].reshape(trh * s, c))
            m = jax.lax.dot(lhs, u_ref[4 * a + bb],
                            preferred_element_type=jnp.float32)
            z0 = _acc_signed(z0, m, _AT[0][bb])
            z1 = _acc_signed(z1, m, _AT[1][bb])
        for p in range(2):
            for q, zq in ((0, z0), (1, z1)):
                acc[(p, q)] = _acc_signed(acc.get((p, q)), zq, _AT[p][a])

    ys = {k: v.reshape(trh, s, tk) for k, v in acc.items()}
    if interleave:
        # out[2r+p, 2s+q] = Y_pq : VMEM relayout instead of an XLA pass
        z0 = jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=2)   # [trh, s, 2, tk]
        z1 = jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=2)
        zz = jnp.stack([z0, z1], axis=1)                   # [trh, 2, s, 2, tk]
        outs[0][0] = zz.reshape(2 * trh, 2 * s, tk).astype(outs[0].dtype)
    else:
        for i, key in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            outs[i][0] = ys[key].astype(outs[i].dtype)


def _pick_tiles(r: int, k: int):
    # v5e sweep (tools/exp_winograd.py): whole-image row groups win when the
    # image fits (r<=16); larger grids prefer trh=8 cells
    trh = r if r <= 16 else 8
    # Mosaic: the U block's last dim must be 128-divisible or the full K
    tk = 256 if k % 256 == 0 and k > 640 else (
        128 if k % 128 == 0 and k > 320 else k)
    return trh, tk


def _wino_pallas(x, u, *, trh: Optional[int] = None,
                 tk: Optional[int] = None, interpret: bool = False,
                 interleave: bool = True):
    b, h, w, c = x.shape
    k = u.shape[-1]
    if h % 2 or w % 2:
        raise ValueError(
            f"winograd_conv3x3 needs even H/W, got {h}x{w} — the parity "
            f"planes (and the r//trh grid) would silently drop rows")
    r, s = h // 2, w // 2
    trh0, tk0 = _pick_tiles(r, k)
    trh = trh or trh0
    tk = tk or tk0
    if r % trh or k % tk:
        raise ValueError(
            f"winograd_conv3x3: grid does not cover the output "
            f"(r={r} % trh={trh} or k={k} % tk={tk} nonzero) — rows/cols "
            f"past the last tile would never be written")
    full = _parity_planes(x)               # [B, R+1, S+1, C] each
    s1 = s + 1
    ng = r // trh
    # group body rows with their halo row: [B, R/trh, trh+1, S1, C]
    groups = [jnp.concatenate(
        [p[:, :r].reshape(b, ng, trh, s1, c), p[:, trh::trh][:, :, None]],
        axis=2) for p in full]
    u = u.astype(x.dtype)

    group_spec = pl.BlockSpec(
        (1, 1, trh + 1, s1, c), lambda bi, ri, ki: (bi, ri, 0, 0, 0),
        memory_space=pltpu.VMEM)
    if interleave:
        out_specs = pl.BlockSpec(
            (1, 2 * trh, 2 * s, tk),
            lambda bi, ri, ki: (bi, ri, 0, ki),
            memory_space=pltpu.VMEM)
        out_shapes = jax.ShapeDtypeStruct((b, h, w, k), x.dtype)
    else:
        out_specs = (pl.BlockSpec(
            (1, trh, s, tk),
            lambda bi, ri, ki: (bi, ri, 0, ki),
            memory_space=pltpu.VMEM),) * 4
        out_shapes = (jax.ShapeDtypeStruct((b, r, s, k), x.dtype),) * 4

    # cache V across cout tiles only when the scratch fits comfortably —
    # a 15.7 MB scratch at c=1920 crashed the TPU worker (VMEM blowup)
    use_scratch = (k // tk > 1
                   and 16 * trh * s * c * x.dtype.itemsize
                   <= 4 * 1024 * 1024)
    flops = 2 * b * r * s * 16 * c * k
    out = pl.pallas_call(
        functools.partial(_kernel, s=s, trh=trh, interleave=interleave,
                          scratch=use_scratch),
        out_shape=out_shapes,
        grid=(b, r // trh, k // tk),
        in_specs=[group_spec] * 4 + [
            pl.BlockSpec((16, c, tk), lambda bi, ri, ki: (0, 0, ki),
                         memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        scratch_shapes=([pltpu.VMEM((16, trh * s, c), x.dtype)]
                        if use_scratch else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * x.size + 16 * c * k) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*groups, u)

    if interleave:
        return out

    # re-interleave parity planes: out[b, 2r+p, 2s+q] = y_planes[p*2+q]
    y = jnp.stack(out)                            # [4, B, R, S, K]
    y = y.reshape(2, 2, b, r, s, k)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, w, k)
    return y


def _direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _wino_conv(x, w, trh, tk, interpret, interleave):
    u = weight_transform(w)
    return _wino_pallas(x, u, trh=trh, tk=tk, interpret=interpret,
                        interleave=interleave)


def _wino_fwd(x, w, trh, tk, interpret, interleave):
    return _wino_conv(x, w, trh, tk, interpret, interleave), (x, w)


def _wino_bwd(trh, tk, interpret, interleave, res, g):
    _, vjp = jax.vjp(_direct_conv, *res)
    return vjp(g)


_wino_conv.defvjp(_wino_fwd, _wino_bwd)


def winograd_supported(x_shape, w_shape, dtype) -> bool:
    """Whether the kernel CAN run at this shape — not whether it should.

    MEASURED IN-CONTEXT LOSS (v5e, r2): the full UNet conv path runs 50.35 ms
    with Winograd dispatched vs 42.31 ms direct (tools/bench_attn.py noattn).
    The 2.25x MAC saving is eaten by (profile, tools/profile_op.py): the
    parity-plane prep pass (~0.40 ms/l0-conv of strided slices + layout
    copies XLA can't fuse away), the prologue/epilogue fusion the direct
    conv gets for free (GN+SiLU in, bias+residual out), and in-kernel
    transform overhead (kernel 0.58 ms vs 0.39 padded floor). In-kernel
    parity splitting is worse: stride-2 slices lower to unsupported gathers,
    and the reshape-based split's sublane relayout costs +1 ms/conv
    (tools/exp_winograd.py split). Dispatch is therefore OFF by default —
    set ``SD_TPU_CONV_IMPL=winograd`` to force (tests/experiments only).
    """
    import os

    if os.environ.get("SD_TPU_CONV_IMPL") != "winograd":
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    if dtype != jnp.bfloat16:
        return False
    if len(x_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    _, h, w, c = x_shape
    k = w_shape[3]
    if h % 2 or w % 2 or h < 16 or w < 16:
        return False
    # row grouping needs trh | (h//2): trh = h//2 when it fits (<=16), else 8
    if h // 2 > 16 and (h // 2) % 8:
        return False
    # the relayout-free [trh, S, C] -> [trh*S, C] flatten needs S to be a
    # multiple of the bf16 sublane tile (16); S = W/2. c>1280 exhausts VMEM
    # (c=1920 crashed the worker) — those skip-concat convs stay direct.
    return (w // 2) % 16 == 0 and 128 <= c <= 1280 and k >= 128


def winograd_conv3x3(x, w, *, trh: Optional[int] = None,
                     tk: Optional[int] = None, interpret: bool = False,
                     interleave: bool = True):
    """F(2x2,3x3) SAME stride-1 conv (NHWC / HWIO), bias-free.

    Drop-in for ``lax.conv_general_dilated(x, w, (1,1), 'SAME')`` at
    supported shapes; callers add bias outside. Differentiable (backward
    recomputes through the direct conv). ``interleave`` writes NHWC directly
    from the kernel (VMEM relayout); off = four parity planes + an XLA
    re-interleave pass.
    """
    return _wino_conv(x, w, trh, tk, interpret, interleave)
