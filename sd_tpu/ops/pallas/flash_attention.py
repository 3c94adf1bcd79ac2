"""Fused attention Pallas kernels for SD's attention shapes.

The hot attention sites (SURVEY.md §2.2 TPU notes) are the UNet's
self-attention over latent tokens — N = 4096/1024/256 at head_dim 40/80/160
(512² images, f8 latents) — and the 77-token cross-attention against the CLIP
context at every transformer block (``ldm/modules/attention.py:180-192`` is
the reference einsum being replaced). The XLA einsum path materializes the
``[B, H, Nq, Nk]`` fp32 logits in HBM — at N=4096 that is >1 GB of traffic
per layer per step and dominates the UNet step time.

Design (full-KV-in-VMEM): for each (batch, head, q-block) the FULL K/V rows
live in VMEM (N ≤ 4096, d ≤ 512 → ≤ 4 MB per operand in bf16), one MXU matmul
produces the ``[block_q, N]`` scores in VMEM, an exact fp32 softmax reduces
them, and a second matmul accumulates the output. No online-softmax state is
needed because the whole row is visible — simpler and faster than the tiled
flash scheme at these sizes. The softmax uses ``exp2`` (the logit scale is
pre-multiplied by log2(e)) — exp2 is the VPU's native transcendental and
measurably cheaper than exp at N=4096 where the softmax is a large share of
kernel time.

Two forward kernels share that scheme:

- ``_kernel`` — grid ``(B, H, Nq/bq)``, one head per step. Used for large-N
  self-attention.
- ``_kernel_allheads`` — grid ``(B, Nq/bq)``, loops the (few) heads inside
  the step. Used when the KV side is small (cross-attention's 77 tokens
  padded to 128, and N=256 self-attention): K/V for every head stay resident
  across the whole batch row and the per-step DMA is 8× larger, which is what
  matters for these bandwidth/overhead-bound sites.

Differentiation: ``flash_attention`` carries a ``jax.custom_vjp``. The
backward pass recomputes the softmax row statistics inside the kernel (the
full row is visible, so no LSE needs to be saved by the forward — the
inference path stays residual-free) and accumulates dK/dV across q-blocks in
VMEM via output revisiting (the q-block grid axis is innermost). Small-KV
shapes use a plain-XLA einsum backward instead — at Nk ≤ 256 the materialized
probability matrix is cheap and the einsum is already near bandwidth.

Padded-key masking (``kv_len``) supports cross-attention's 77-token context
padded to a lane multiple; padding happens inside :func:`flash_attention`.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ["flash_attention", "flash_supported"]

# q-block caps: [block_q, N] fp32 scores must live in VMEM next to K/V.
# r2 sweep on v5e: bq=512 optimal at N=4096; the WHOLE row (bq=N) wins at
# N<=1024 (1.67 vs 1.78 ms at N=1024), so the cap only binds for large N.
_BLOCK_Q = 512
_BLOCK_Q_WHOLE_ROW_MAX = 1024  # nq <= this: single q-block per (b, h)
_BLOCK_Q_BWD = 256  # bwd keeps two [bq, N] fp32 buffers (p and dp) live
_BLOCK_Q_ALLHEADS = 2048
_MAX_KV_VMEM = 4096   # full-KV-in-VMEM design limit
_SMALL_KV = 256       # at/below this KV length use the all-heads kernel
_LOG2E = math.log2(math.e)


def flash_supported(q, k, v, mask=None) -> bool:
    """Dispatch predicate used by sd_tpu.ops.attention.dot_product_attention.

    True where the Pallas kernels are MEASURED faster than XLA on v5e
    (tools/bench_attn.py, r2 sweep at B=16 CFG batch — re-measure before
    changing). XLA:TPU ships its own fused attention and wins the
    in-context cross-attention (it fuses the 77-key sites into the
    surrounding projections; standalone cross microbenches mislead); the
    Pallas kernels win every self-attention site:

      self N=4096 d40:  XLA 8.24 ms vs flash 7.52 (chunked online-softmax)
      self N=1024 d80:  XLA 2.72 ms vs flash 1.62
      self N=256  d160: XLA 1.52 ms vs flash 1.20
      cross (77 keys):  XLA in-context ~0.2/layer  -> XLA

    Cross ruling RE-CONFIRMED on the honest params-as-args graph (r3,
    tools/bench_attn.py unet): auto 113.50 ms/step vs flash at the N=4096
    cross sites 114.75 vs flash at every cross site 116.17. The floor
    table prices XLA's five N=4096 cross einsums at 0.80 ms/site against
    a ~0.25 one-pass bound, but that slack is a bound-pricing artifact of
    XLA's fused dilated-conv lowering — routing them to the Pallas kernel
    loses in context. Don't re-walk without a new idea.

    The kernels are differentiable (custom_vjp), so this predicate is safe
    under ``jax.grad`` — training and inference share one dispatch rule.
    """
    if mask is not None:
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if nq % 128 != 0:
        return False
    if nk != nq:  # cross-attention: XLA fuses it into the projections
        return False
    return 128 <= nk <= _MAX_KV_VMEM


def _padded_kv(nk: int) -> int:
    return max(128, -(-nk // 128) * 128)


def _block_q(nq: int, cap: int) -> int:
    bq = min(cap, nq)
    while nq % bq:
        bq //= 2
    return max(bq, 128) if nq % max(bq, 128) == 0 else bq


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _softmax_rows(s2, kv_len, nk, exp_bf16: bool):
    """exp2 softmax over the last axis of fp32 ``s2`` (already * log2e).

    ``exp_bf16`` computes the exponentials in bf16. MEASURED SLOWER on v5e
    (9.59 vs 8.80 ms at N=4096 — bf16 transcendentals lower with pack/unpack
    overhead) and therefore OFF by default; the flag is kept for re-tuning
    on other TPU generations.
    """
    if kv_len < nk:  # padded keys (cross-attention): mask them out
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, dimension=1)
        s2 = jnp.where(col < kv_len, s2, jnp.finfo(jnp.float32).min)
    m = jnp.max(s2, axis=1, keepdims=True)
    if exp_bf16:
        p = jnp.exp2((s2 - m).astype(jnp.bfloat16))
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    else:
        p = jnp.exp2(s2 - m)
        l = jnp.sum(p, axis=1, keepdims=True)
    return p, l


def _attend_block(q, k, v, scale, kv_len, exp_bf16, kt: bool):
    """One q-block against the full K/V row. ``kt`` means k is [D, Nk]
    (pre-transposed outside so the MXU contraction hits k's sublane dim)."""
    if q.dtype == jnp.bfloat16:
        # fold scale*log2e into q before the matmul: saves a full-width
        # [bq, Nk] fp32 multiply pass (error ~2^-9 relative, below the bf16
        # matmul's own rounding)
        q = q * jnp.bfloat16(scale * _LOG2E)
        post = 1.0
    else:
        post = scale * _LOG2E
    if kt:
        s2 = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        nk = k.shape[1]
    else:
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        nk = k.shape[0]
    if post != 1.0:
        s2 = s2 * post
    p, l = _softmax_rows(s2, kv_len, nk, exp_bf16)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return o / l


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
            exp_bf16: bool, kt: bool):
    o = _attend_block(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                      scale, kv_len, exp_bf16, kt)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _kernel_chunked(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    kv_len: int, kt: bool, chunk: int):
    """Online-softmax variant: the KV row (resident in VMEM) is processed in
    ``chunk``-sized pieces with running (m, l, acc) state. Statically
    unrolled so Mosaic can overlap chunk i+1's QK matmul (MXU) with chunk
    i's softmax (VPU) — the monolithic kernel serializes them.
    Full rows must be unmasked (kv_len == Nk); dispatch guarantees it.
    """
    q = q_ref[0, 0]  # [bq, d]
    if q.dtype == jnp.bfloat16:
        q = q * jnp.bfloat16(scale * _LOG2E)
        post = 1.0
    else:
        post = scale * _LOG2E
    nk = k_ref.shape[3] if kt else k_ref.shape[2]
    bq, d = q.shape
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)
    for c in range(nk // chunk):
        if kt:
            kc = k_ref[0, 0, :, pl.ds(c * chunk, chunk)]  # [d, ck]
            s = jax.lax.dot_general(
                q, kc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            kc = k_ref[0, 0, pl.ds(c * chunk, chunk), :]  # [ck, d]
            s = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if post != 1.0:
            s = s * post
        vc = v_ref[0, 0, pl.ds(c * chunk, chunk), :]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * corr + jax.lax.dot(
            p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _kernel_chunked_int8(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         kt: bool, chunk: int, pv_int8: bool):
    """W8A8 online-softmax kernel (VERDICT r4 next-round #1b): QK^T runs
    int8xint8->int32 on the MXU — the d=40->128 lane padding that caps the
    bf16 kernel at its padded bound is priced at the 2x int8 rate instead.
    Q is quantized per row once (in-register), K per key per chunk. The
    SageAttention split: P@V stays bf16 by default (softmax probabilities
    carry the signal; quantizing them costs real quality), ``pv_int8``
    additionally quantizes P (per-row, known max 1) and V (per feature).
    Full rows only (kv_len == Nk); dispatch guarantees it. Inference-only:
    no vjp — the backward recomputes through the bf16 kernels.
    """
    q = q_ref[0, 0].astype(jnp.float32)  # [bq, d]
    sq = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0,
                     1e-12)
    qq = jnp.clip(jnp.round(q / sq), -127.0, 127.0).astype(jnp.int8)
    sq_post = sq * (scale * _LOG2E)       # fold the logit scale into dequant
    nk = k_ref.shape[3] if kt else k_ref.shape[2]
    bq, d = q.shape
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)
    for c in range(nk // chunk):
        if kt:
            kc = k_ref[0, 0, :, pl.ds(c * chunk, chunk)].astype(jnp.float32)
            skc = jnp.maximum(
                jnp.max(jnp.abs(kc), axis=0, keepdims=True) / 127.0, 1e-12)
            kqc = jnp.clip(jnp.round(kc / skc), -127.0, 127.0).astype(jnp.int8)
            s_i32 = jax.lax.dot_general(
                qq, kqc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            kc = k_ref[0, 0, pl.ds(c * chunk, chunk), :].astype(jnp.float32)
            skc = jnp.maximum(
                jnp.max(jnp.abs(kc), axis=1, keepdims=True).T / 127.0, 1e-12)
            kqc = jnp.clip(jnp.round(kc / skc.T), -127.0,
                           127.0).astype(jnp.int8)
            s_i32 = jax.lax.dot_general(
                qq, kqc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        s = s_i32.astype(jnp.float32) * sq_post * skc     # [bq, ck]
        vc = v_ref[0, 0, pl.ds(c * chunk, chunk), :]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        if pv_int8:
            # p in [0,1] after the exp2 (rowwise max is 0): scale 1/127 known
            pq = jnp.round(p * 127.0).astype(jnp.int8)
            vf = vc.astype(jnp.float32)
            svc = jnp.maximum(
                jnp.max(jnp.abs(vf), axis=0, keepdims=True) / 127.0, 1e-12)
            vqc = jnp.clip(jnp.round(vf / svc), -127.0,
                           127.0).astype(jnp.int8)
            pv = jax.lax.dot(pq, vqc, preferred_element_type=jnp.int32)
            acc = acc * corr + pv.astype(jnp.float32) * (svc / 127.0)
        else:
            acc = acc * corr + jax.lax.dot(
                p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _kernel_allheads(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     kv_len: int, heads: int, exp_bf16: bool, kt: bool):
    for i in range(heads):
        o = _attend_block(q_ref[0, i], k_ref[0, i], v_ref[0, i],
                          scale, kv_len, exp_bf16, kt)
        o_ref[0, i] = o.astype(o_ref.dtype)


def _resolve_int8(int8_mode: Optional[str], dtype, kv_len: int, nk: int,
                  d: int = 128) -> str:
    """Trace-time int8 mode: explicit override, else the SD_TPU_INT8
    attn/attn_pv buckets, gated to the sites where int8 MEASURED faster
    (tools/bench_attn.py int8attn, v5e, r5):

        self4096 d40:  off 7.325  qk 6.891 (-6%)   qkpv 8.174 (LOSES)
        self1024 d80:  off 1.449  qk 1.499 (LOSES) qkpv 1.577 (LOSES)
        vae4096 d512:  off 3.762  qk 3.298 (-12%)  qkpv 2.941 (-22%)

    -> int8 engages only on full rows with Nk >= 2048; the int8 P@V only
    pays where the PV matmul is lane-wide (d >= 256 — the VAE decode
    attention), so ``attn_pv`` resolves to plain qk at the d=40 UNet sites.
    """
    if int8_mode is None:
        from sd_tpu.ops.quant import int8_bucket_enabled

        if int8_bucket_enabled("attn_pv", dtype):
            int8_mode = "qkpv" if d >= 256 else "qk"
        elif int8_bucket_enabled("attn", dtype):
            int8_mode = "qk"
        else:
            int8_mode = "off"
    if int8_mode != "off" and (kv_len != nk or nk < 2048):
        int8_mode = "off"
    return int8_mode


def _fwd_bhnd(qt, kt, vt, scale: float, kv_len: int,
              interpret: bool = False, block_q: Optional[int] = None,
              exp_bf16: Optional[bool] = None, kt_layout: bool = True,
              kv_chunk: Optional[int] = None,
              int8_mode: Optional[str] = None):
    """Forward on [B, H, N, D]-layout operands (kt/vt already lane-padded).

    ``kt_layout=True`` feeds K pre-transposed as [B, H, D, Nk] so the QK^T
    contraction hits K's sublane axis directly (no in-VMEM transpose).
    ``exp_bf16=None`` resolves to False (measured slower — see
    :func:`_softmax_rows`). ``int8_mode``: None = SD_TPU_INT8 env dispatch,
    else "off"/"qk"/"qkpv" (see :func:`_kernel_chunked_int8`).
    """
    b, h, nq, d = qt.shape
    nk = kt.shape[2]
    int8_mode = _resolve_int8(int8_mode, qt.dtype, kv_len, nk, d)
    if exp_bf16 is None:
        # measured SLOWER on v5e (9.59 vs 8.80 ms at N=4096 — bf16
        # transcendentals lower with pack/unpack overhead); keep fp32 exp2
        exp_bf16 = False
    if kt_layout:
        kt = jnp.swapaxes(kt, 2, 3)  # [B, H, D, Nk]
    cost = pl.CostEstimate(
        flops=4 * b * h * nq * kv_len * d,
        bytes_accessed=(qt.size * 2 + kt.size + vt.size) * qt.dtype.itemsize,
        transcendentals=b * h * nq * kv_len,
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    kshape = (lambda bh: (1, bh, d, nk)) if kt_layout else (lambda bh: (1, bh, nk, d))
    if nk <= _SMALL_KV:
        bq = _block_q(nq, block_q or _BLOCK_Q_ALLHEADS)
        kernel = functools.partial(
            _kernel_allheads, scale=float(scale), kv_len=kv_len, heads=h,
            exp_bf16=exp_bf16, kt=kt_layout,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            grid_spec=pl.GridSpec(
                grid=(b, nq // bq),
                in_specs=[
                    pl.BlockSpec((1, h, bq, d), lambda bi, qi: (bi, 0, qi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(kshape(h), lambda bi, qi: (bi, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, h, nk, d), lambda bi, qi: (bi, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, h, bq, d), lambda bi, qi: (bi, 0, qi, 0),
                    memory_space=pltpu.VMEM),
            ),
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(qt, kt, vt)

    if kv_chunk is None and kv_len == nk:
        # r2 sweep: online-softmax chunking wins once the row is long enough
        # for MXU/VPU overlap — 7.52 ms vs 8.80 monolithic (and 8.24 XLA) at
        # N=4096 with (bq=1024, ck=1024); 1.62 vs 1.64 at N=1024 with ck=512
        if nk >= 2048:
            kv_chunk = 1024
        elif nk == 1024:
            kv_chunk = 512
    # chunking needs unmasked, evenly-divisible rows; resolve BEFORE picking
    # the block size (the monolithic kernel's measured optimum is bq=512)
    if kv_chunk and not (kv_len == nk and nk % kv_chunk == 0):
        kv_chunk = None
    if int8_mode != "off" and not kv_chunk:
        int8_mode = "off"  # the W8A8 kernel is chunked-only
    default_bq = nq if nq <= _BLOCK_Q_WHOLE_ROW_MAX else (
        1024 if kv_chunk else _BLOCK_Q)
    bq = _block_q(nq, block_q or default_bq)
    if int8_mode != "off":
        kernel = functools.partial(
            _kernel_chunked_int8, scale=float(scale), kt=kt_layout,
            chunk=kv_chunk, pv_int8=int8_mode == "qkpv")
    elif kv_chunk:
        kernel = functools.partial(_kernel_chunked, scale=float(scale),
                                   kv_len=kv_len, kt=kt_layout, chunk=kv_chunk)
    else:
        kernel = functools.partial(_kernel, scale=float(scale), kv_len=kv_len,
                                   exp_bf16=exp_bf16, kt=kt_layout)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, h, nq // bq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(kshape(1), lambda bi, hi, qi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM),
        ),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(qt, kt, vt)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, kv_len: int):
    """Per-(b, h, q-block) backward; dK/dV accumulate across the (innermost)
    q-block grid axis via output revisiting.

    Softmax row stats are recomputed from the full row in VMEM — no LSE
    residual. Gradient identities (non-causal):
      p     = softmax(s * scale)         (recomputed, fp32)
      dV    = pᵀ · dO
      dP    = dO · Vᵀ
      δ     = rowsum(dO ∘ O)
      dS    = p ∘ (dP − δ) * scale       (the exp2/log2e factors cancel)
      dQ    = dS · K,   dK = dSᵀ · Q
    """
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]    # [bq, d]
    k = k_ref[0, 0]    # [Nk, d]
    v = v_ref[0, 0]
    o = o_ref[0, 0]
    do = do_ref[0, 0]
    nk = k.shape[0]

    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    p, l = _softmax_rows(s2, kv_len, nk, exp_bf16=False)
    p = p / l  # normalized probabilities, fp32
    p_lo = p.astype(v.dtype)

    # dV += pᵀ dO   (contract over the q-block axis)
    dv_ref[0, 0] += jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = dO Vᵀ
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq_ref[0, 0] = jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bwd_bhnd_pallas(qt, kt, vt, ot, dot_, scale: float, kv_len: int,
                     interpret: bool = False):
    b, h, nq, d = qt.shape
    nk = kt.shape[2]
    bq = _block_q(nq, _BLOCK_Q_BWD)
    kernel = functools.partial(_bwd_kernel, scale=float(scale), kv_len=kv_len)
    qspec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, nk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct(kt.shape, jnp.float32),
            jax.ShapeDtypeStruct(vt.shape, jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, h, nq // bq),
            in_specs=[qspec, kvspec, kvspec, qspec, qspec],
            out_specs=(qspec, kvspec, kvspec),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * nq * kv_len * d,
            bytes_accessed=(qt.size * 3 + kt.size * 3 + vt.size * 3)
            * qt.dtype.itemsize,
            transcendentals=b * h * nq * kv_len,
        ),
        interpret=interpret,
    )(qt, kt, vt, ot, dot_)
    return dq, dk.astype(kt.dtype), dv.astype(vt.dtype)


def _bwd_bhnd_xla(qt, kt, vt, ot, dot_, scale: float, kv_len: int):
    """Einsum backward for small-KV shapes ([B, H, N, D] layout)."""
    nk = kt.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                   preferred_element_type=jnp.float32) * scale
    if kv_len < nk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=3)
        s = jnp.where(col < kv_len, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    p_lo = p.astype(vt.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p_lo, dot_)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dot_, vt,
                    preferred_element_type=jnp.float32)
    delta = jnp.sum(dot_.astype(jnp.float32) * ot.astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(qt.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kt)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qt)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# SPMD partitioning (multi-chip)
# ---------------------------------------------------------------------------
# A Pallas call is an opaque custom-call to the XLA SPMD partitioner: without
# a partitioning rule GSPMD must all-gather every operand to replicated and
# run the kernel whole on every device — silently deleting the parallelism of
# any sharded program that contains it (DP serving, tensor-parallel UNet).
# The kernels here are embarrassingly parallel over the batch and head dims
# of their [B, H, N, D] operands (the grid iterates (b, h, q-block) and no
# program crosses b or h), so we register exactly that with
# `jax.experimental.custom_partitioning`: B and H may shard, N and D must be
# replicated (each program needs the full KV row). Under data parallelism the
# kernel then runs per-shard with ZERO collectives; under a megatron-style
# tensor-parallel layout (`sd_tpu/parallel/tp.py`) the head axis shards over
# 'model' and the collectives stay where GSPMD puts them — at the projection
# boundaries, not around the kernel.
#
# Dispatch: the partitioned wrapper is used only when tracing under jit on a
# multi-device runtime (single-chip programs keep the direct pallas_call —
# byte-identical lowering to r3, no fusion-boundary risk to the benched
# path). `SD_TPU_FLASH_SPMD=0` disables. custom_partitioning is not
# differentiable, so the forward and backward kernels are wrapped SEPARATELY
# inside the custom_vjp below — grads partition the same way.


# jax.core.Tracer has survived the jax.core deprecation sweeps (still public
# in 0.9, no jax.extend equivalent exists); pin a fallback to the private
# path so a future removal degrades to an import of jax._src.core, not a
# crash in every multi-device trace (VERDICT r4 item 8).
try:
    _Tracer = jax.core.Tracer
except AttributeError:  # pragma: no cover - future-jax safety net
    from jax._src.core import Tracer as _Tracer


def _spmd_partition_wanted(x) -> bool:
    if os.environ.get("SD_TPU_FLASH_SPMD", "1").lower() in ("0", "off", "false"):
        return False
    return isinstance(x, _Tracer) and jax.device_count() > 1


def _bh_spec(sharding) -> PartitionSpec:
    """Project an operand spec onto the supported (batch, head) dims."""
    spec = getattr(sharding, "spec", None)
    parts = (list(spec) if spec is not None else []) + [None] * 4
    return PartitionSpec(parts[0], parts[1], None, None)


@functools.lru_cache(maxsize=None)
def _fwd_spmd(scale: float, kv_len: int, interpret: bool,
              block_q: Optional[int], exp_bf16: Optional[bool],
              kt_layout: bool, kv_chunk: Optional[int],
              int8_mode: Optional[str]):
    @custom_partitioning
    def fwd(qt, kt, vt):
        return _fwd_bhnd(qt, kt, vt, scale, kv_len, interpret, block_q,
                         exp_bf16, kt_layout, kv_chunk, int8_mode)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, _bh_spec(arg_shapes[0].sharding))

    def part(mesh, arg_shapes, result_shape):
        sh = NamedSharding(mesh, _bh_spec(arg_shapes[0].sharding))

        def lower(qt, kt, vt):
            return _fwd_bhnd(qt, kt, vt, scale, kv_len, interpret, block_q,
                             exp_bf16, kt_layout, kv_chunk, int8_mode)

        return mesh, lower, sh, (sh, sh, sh)

    fwd.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        # Shardy rule: batch/head factors propagate, token/lane factors must
        # be replicated (each kernel program consumes the full KV row).
        sharding_rule="b h n d, b h m d, b h m d -> b h n d",
        need_replication_factors=("n", "d", "m"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_spmd(scale: float, kv_len: int, interpret: bool):
    @custom_partitioning
    def bwd(qt, kt, vt, ot, g):
        return _bwd_bhnd_pallas(qt, kt, vt, ot, g, scale, kv_len, interpret)

    def infer(mesh, arg_shapes, result_shape):
        sh = NamedSharding(mesh, _bh_spec(arg_shapes[0].sharding))
        return (sh, sh, sh)

    def part(mesh, arg_shapes, result_shape):
        sh = NamedSharding(mesh, _bh_spec(arg_shapes[0].sharding))

        def lower(qt, kt, vt, ot, g):
            return _bwd_bhnd_pallas(qt, kt, vt, ot, g, scale, kv_len,
                                    interpret)

        return mesh, lower, (sh, sh, sh), (sh,) * 5

    bwd.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        sharding_rule=("b h n d, b h m d, b h m d, b h n d, b h n d "
                       "-> b h n d, b h m d, b h m d"),
        need_replication_factors=("n", "d", "m"),
    )
    return bwd


def _dispatch_fwd(qt, kt, vt, scale: float, kv_len: int, interpret: bool,
                  block_q: Optional[int], exp_bf16: Optional[bool],
                  kt_layout: bool, kv_chunk: Optional[int],
                  int8_mode: Optional[str] = None):
    if _spmd_partition_wanted(qt):
        # resolve the env-dispatched int8 mode BEFORE the lru_cache so the
        # partitioned callable is keyed by what will actually run
        int8_mode = _resolve_int8(int8_mode, qt.dtype, kv_len,
                                  kt.shape[2], qt.shape[3])
        return _fwd_spmd(float(scale), kv_len, interpret, block_q, exp_bf16,
                         kt_layout, kv_chunk, int8_mode)(qt, kt, vt)
    return _fwd_bhnd(qt, kt, vt, scale, kv_len, interpret, block_q,
                     exp_bf16, kt_layout, kv_chunk, int8_mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _flash_bhnd(qt, kt, vt, scale: float, kv_len: int,
                interpret: bool = False, block_q: Optional[int] = None,
                exp_bf16: Optional[bool] = None, kt_layout: bool = True,
                kv_chunk: Optional[int] = None,
                int8_mode: Optional[str] = None):
    return _dispatch_fwd(qt, kt, vt, scale, kv_len, interpret, block_q,
                         exp_bf16, kt_layout, kv_chunk, int8_mode)


def _flash_bhnd_fwd(qt, kt, vt, scale: float, kv_len: int,
                    interpret: bool = False, block_q: Optional[int] = None,
                    exp_bf16: Optional[bool] = None, kt_layout: bool = True,
                    kv_chunk: Optional[int] = None,
                    int8_mode: Optional[str] = None):
    ot = _dispatch_fwd(qt, kt, vt, scale, kv_len, interpret, block_q,
                       exp_bf16, kt_layout, kv_chunk, int8_mode)
    return ot, (qt, kt, vt, ot)


def _flash_bhnd_bwd(scale: float, kv_len: int, interpret: bool,
                    block_q: Optional[int], exp_bf16: Optional[bool],
                    kt_layout: bool, kv_chunk: Optional[int],
                    int8_mode: Optional[str], res, g):
    qt, kt, vt, ot = res
    nq, nk = qt.shape[2], kt.shape[2]
    if nk <= _SMALL_KV or nq % _BLOCK_Q_BWD != 0:
        # einsum backward: GSPMD partitions plain XLA ops natively
        return _bwd_bhnd_xla(qt, kt, vt, ot, g, scale, kv_len)
    if _spmd_partition_wanted(qt):
        return _bwd_spmd(float(scale), kv_len, interpret)(qt, kt, vt, ot, g)
    return _bwd_bhnd_pallas(qt, kt, vt, ot, g, scale, kv_len, interpret)


_flash_bhnd.defvjp(_flash_bhnd_fwd, _flash_bhnd_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def flash_attention(
    q, k, v, scale: Optional[float] = None, mask=None, *,
    interpret: bool = False, block_q: Optional[int] = None,
    exp_bf16: Optional[bool] = None, kt_layout: bool = True,
    kv_chunk: Optional[int] = None, int8: Optional[str] = None,
):
    """Fused attention on ``[B, N, H, D]`` tensors (differentiable).

    ``k``/``v`` with a token count that is not a lane multiple (e.g. the
    77-token CLIP context) are zero-padded here and masked inside the kernel.
    ``interpret=True`` runs the kernels in the Pallas interpreter (CPU tests).
    ``int8``: "qk"/"qkpv" force the W8A8 kernel, "off" forces bf16, None
    dispatches on the SD_TPU_INT8 attn/attn_pv buckets (inference-only).
    """
    assert mask is None, "use the XLA path for masked attention"
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    nk_pad = _padded_kv(nk)
    if nk_pad != nk:
        pad = [(0, 0), (0, nk_pad - nk), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # Mosaic blocks want (sublane, lane) = (tokens, head_dim) as the last two
    # dims -> kernel layout is [B, H, N, D]. The transposes are a few MB of
    # traffic, fused by XLA into producers/consumers.
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _flash_bhnd(qt, kt, vt, float(scale), nk, interpret, block_q,
                      exp_bf16, kt_layout, kv_chunk, int8)
    return jnp.transpose(out, (0, 2, 1, 3))
