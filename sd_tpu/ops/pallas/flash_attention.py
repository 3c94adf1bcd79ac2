"""Fused attention Pallas kernel for SD's attention shapes.

The hot attention sites (SURVEY.md §2.2 TPU notes) are the UNet's
self-attention over latent tokens: N = 4096/1024/256 at head_dim 40/80/160
(512² images, f8 latents). The XLA einsum path materializes the
``[B, H, N, N]`` fp32 logits in HBM — at N=4096 that is >1 GB of traffic per
layer per step and dominates the UNet step time.

This kernel never materializes logits in HBM: for each (batch, head,
q-block), the FULL K/V rows live in VMEM (N ≤ 4096, d ≤ 160 → ≤ 1.3 MB per
operand in bf16), one MXU matmul produces the ``[block_q, N]`` scores in
VMEM, an exact fp32 softmax reduces them, and a second matmul accumulates the
output. No online-softmax state is needed because the whole row is visible —
simpler and faster than the tiled flash scheme for these sizes. Inputs stay
in the framework's token-major ``[B, N, H, D]`` layout; the grid slices the
head axis directly so no transpose is ever issued.

Padded-key masking (``kv_len``) supports cross-attention's 77-token context
padded to a lane multiple.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_supported"]

# largest q-block: [block_q, N] fp32 scores must fit VMEM next to K/V.
# 512 is the measured optimum at N=4096 on v5e (256: 11.9ms, 512/1024: 10.4ms)
_BLOCK_Q = 512
_MAX_KV_VMEM = 4096  # full-KV-in-VMEM design limit


def flash_supported(q, k, v, mask=None) -> bool:
    """Dispatch predicate used by sd_tpu.ops.attention.dot_product_attention."""
    if mask is not None:
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # measured on v5e (B=16 CFG batch): flash wins decisively at N=4096
    # (10.4ms vs ~21ms XLA; no [N,N] fp32 HBM round-trip) and at N=256
    # (4.1ms vs 11.7ms — XLA lowers the d=160 einsum badly); N=1024 is a
    # wash (3.1 vs 3.4) with batch-dependent flips, left to XLA. Cross-attn
    # (77 keys) stays XLA (2.4ms vs 3.3ms padded-flash).
    if nk > _MAX_KV_VMEM:
        return False
    if not (nk >= 2048 or nk <= 256):
        return False
    if nk < 128:
        return False
    if nq % _min_block_q(nq) != 0 or nk % 128 != 0:
        return False
    return True


def _min_block_q(nq: int) -> int:
    return min(_BLOCK_Q, nq) if nq % min(_BLOCK_Q, nq) == 0 else 8


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [Nk, d]
    v = v_ref[0, 0]  # [Nk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    nk = k.shape[0]
    if kv_len < nk:  # padded keys (cross-attention): mask them out
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, jnp.finfo(jnp.float32).min)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o = o / l
    o_ref[0, 0] = o.astype(o_ref.dtype)


def flash_attention(
    q, k, v, scale: Optional[float] = None, mask=None, *,
    block_q: Optional[int] = None, interpret: bool = False,
):
    """Fused attention on ``[B, N, H, D]`` tensors.

    ``k``/``v`` may be zero-padded along tokens; pass the true length via a
    right-aligned implicit convention: any padding must be at the END and the
    caller communicates it by padding — here we infer nothing and attend to
    all Nk rows unless the caller pre-padded and sliced. (The cross-attention
    wrapper in ``sd_tpu.ops.attention`` pads K/V to a lane multiple and
    passes ``kv_len`` via closure when needed.)
    """
    assert mask is None, "use the XLA path for masked attention"
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    bq = block_q or _min_block_q(nq)
    assert nq % bq == 0, (nq, bq)

    # Mosaic blocks want (sublane, lane) = (tokens, head_dim) as the last two
    # dims -> kernel layout is [B, H, N, D]. The transposes are a few MB of
    # traffic, fused by XLA into producers/consumers.
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    grid = (b, h, nq // bq)
    kernel = functools.partial(_kernel, scale=float(scale), kv_len=nk)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, nk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, nk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))
