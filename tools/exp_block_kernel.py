"""PROTOTYPE: fused self-attention sub-block kernel (LN + QKV + attn + out).

Measures whether a single Pallas kernel per (batch,) computing

    y = to_out(attend(split_heads(ln(x) @ Wq), K, V)) + x
    with K = ln(x) @ Wk, V = ln(x) @ Wv computed in-kernel

beats the current XLA sequence (LayerNorm -> 3 dots -> transposes -> flash
kernel -> transpose -> out dot -> residual add). The open question is the
cost of Mosaic lane-slicing q[:, h*d:(h+1)*d] at d=40 — if relayouts are
cheap this saves ~6 ms/step of HBM passes at the three SD self-attn sites.

Usage: python tools/exp_block_kernel.py [N] [C]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 16
_LOG2E = 1.4426950408889634


def _ln(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * gamma + beta).astype(x.dtype)


def _attend_head(qh, kh, vh, nk, chunk):
    """qh [N, d] (pre-scaled by scale*log2e), kh/vh [N, d] -> [N, d] f32."""
    n, d = qh.shape
    m = jnp.full((n, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((n, 1), jnp.float32)
    acc = jnp.zeros((n, d), jnp.float32)
    for c in range(nk // chunk):
        kc = kh[c * chunk:(c + 1) * chunk, :]
        s = jax.lax.dot_general(
            qh, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        vc = vh[c * chunk:(c + 1) * chunk, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * corr + jax.lax.dot(
            p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        m = m_new
    return acc / l


def _kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
            o_ref, *, heads, d, chunk):
    x = x_ref[0]                       # [N, C]
    n = x.shape[0]
    xln = _ln(x, g_ref[...], b_ref[...])
    # MXU accumulates in fp32 (bf16 acc rejected by Mosaic); cast after
    q = jax.lax.dot(xln, wq_ref[...],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    k = jax.lax.dot(xln, wk_ref[...],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    v = jax.lax.dot(xln, wv_ref[...],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    outs = []
    for h in range(heads):
        lo, hi = h * d, (h + 1) * d
        oh = _attend_head(q[:, lo:hi], k[:, lo:hi], v[:, lo:hi], n, chunk)
        # serialize heads: without a dependency Mosaic hoists every head's QK
        # matmuls and keeps all 32 score buffers live -> 538M VMEM OOM.
        # optimization_barrier isn't lowerable; (oh - oh) is a float zero the
        # compiler cannot fold (NaN semantics), so q gains a true data dep.
        z = (oh[:, :1] - oh[:, :1]).astype(q.dtype)
        q = q + z
        outs.append(oh.astype(x.dtype))
    out = jnp.concatenate(outs, axis=1)          # [N, C]
    y = jax.lax.dot(out, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (y + bo_ref[...]).astype(o_ref.dtype) + x


def fused_block(x, gamma, beta, wq, wk, wv, wo, bo, heads, d, chunk=1024):
    b, n, c = x.shape
    scale = d ** -0.5
    wq = (wq.astype(jnp.float32) * (scale * _LOG2E)).astype(x.dtype)
    spec_w = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, d=d, chunk=min(chunk, n)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                spec_v, spec_v, spec_w, spec_w, spec_w, spec_w, spec_v,
            ],
            out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * c * c + 4 * b * heads * n * n * d,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
    )(x, gamma.reshape(1, -1).astype(jnp.float32),
      beta.reshape(1, -1).astype(jnp.float32),
      wq, wk.astype(x.dtype), wv.astype(x.dtype), wo.astype(x.dtype),
      bo.reshape(1, -1).astype(jnp.float32))


def xla_block(x, gamma, beta, wq, wk, wv, wo, bo, heads, d):
    from sd_tpu.ops.attention import dot_product_attention

    b, n, c = x.shape
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xln = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(x.dtype)
    q = (xln @ wq.astype(x.dtype)).reshape(b, n, heads, d)
    k = (xln @ wk.astype(x.dtype)).reshape(b, n, heads, d)
    v = (xln @ wv.astype(x.dtype)).reshape(b, n, heads, d)
    out = dot_product_attention(q, k, v, impl="auto")
    out = out.reshape(b, n, c)
    return (out @ wo.astype(x.dtype) + bo.astype(x.dtype)) + x


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_chain(step, x0, iters=30, reps=2):
    x = step(x0)
    sync(x)
    best = float("inf")
    for _ in range(reps):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        sync(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    heads, d = 8, c // 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x0 = jax.random.normal(ks[0], (B, n, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    wq = jax.random.normal(ks[1], (c, c), jnp.float32) * 0.03
    wk = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.03
    wv = jax.random.normal(ks[3], (c, c), jnp.float32) * 0.03
    wo = jax.random.normal(ks[4], (c, c), jnp.float32) * 0.03
    bo = jax.random.normal(ks[5], (c,), jnp.float32) * 0.1

    args = (gamma, beta, wq, wk, wv, wo, bo, heads, d)

    @jax.jit
    def step_fused(x):
        return fused_block(x, *args)

    @jax.jit
    def step_xla(x):
        return xla_block(x, *args)

    # correctness first
    y1 = step_fused(x0)
    y2 = step_xla(x0)
    import numpy as np
    diff = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
    print(f"maxdiff fused vs xla: {diff:.4f}", flush=True)

    ms_f = time_chain(step_fused, x0)
    ms_x = time_chain(step_xla, x0)
    print(json.dumps({"fused": round(ms_f, 3), "xla": round(ms_x, 3),
                      "n": n, "c": c}))





# ---------------------------------------------------------------------------
# tail-kernel prototype: LN2 + cross-attn (77-key) + LN3 + GEGLU FF, fused
# ---------------------------------------------------------------------------


def _tail_kernel(x_ref, g2_ref, b2_ref, wq_ref, wo_ref, bo_ref,
                 kc_ref, vc_ref, g3_ref, b3_ref,
                 w1a_ref, w1g_ref, b1a_ref, b1g_ref, w2_ref, bff_ref,
                 o_ref, *, heads, d, kv_len):
    from sd_tpu.ops.pallas.geglu_ff import _gelu_f32

    x = x_ref[0]                                    # [bq, C]
    # ---- cross attention (attn2) ----
    xln = _ln(x, g2_ref[...], b2_ref[...])
    q = jax.lax.dot(xln, wq_ref[...],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    nk = kc_ref.shape[1]
    outs = []
    for h in range(heads):
        lo, hi = h * d, (h + 1) * d
        s = jax.lax.dot_general(
            q[:, lo:hi], kc_ref[0, :, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # [bq, nk]
        if kv_len < nk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        oh = jax.lax.dot(p.astype(x.dtype), vc_ref[0, :, lo:hi],
                         preferred_element_type=jnp.float32) / l
        outs.append(oh.astype(x.dtype))
    att = jnp.concatenate(outs, axis=1)             # [bq, C]
    y = jax.lax.dot(att, wo_ref[...], preferred_element_type=jnp.float32)
    x = (y + bo_ref[...]).astype(x.dtype) + x       # residual
    # ---- feed-forward (LN3 + GEGLU) ----
    xln3 = _ln(x, g3_ref[...], b3_ref[...])
    a = jax.lax.dot(xln3, w1a_ref[...],
                    preferred_element_type=jnp.float32) + b1a_ref[...]
    g = jax.lax.dot(xln3, w1g_ref[...],
                    preferred_element_type=jnp.float32) + b1g_ref[...]
    h2 = (a * _gelu_f32(g)).astype(x.dtype)
    o = jax.lax.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (o + bff_ref[...]).astype(o_ref.dtype) + x


def tail_fused(x, g2, b2, wq, wo, bo, kc, vc, g3, b3, w1, b1, w2, bff,
               heads, d, kv_len, block_q=1024):
    b, n, c = x.shape
    inner = w2.shape[0]
    scale = d ** -0.5
    wq = (wq.astype(jnp.float32) * (scale * _LOG2E)).astype(x.dtype)
    w1 = w1.astype(x.dtype)
    w1a, w1g = w1[:, :inner], w1[:, inner:]
    b1 = b1.astype(jnp.float32)
    b1a, b1g = b1[:inner].reshape(1, -1), b1[inner:].reshape(1, -1)
    nk = kc.shape[1]
    bq = min(block_q, n)
    vec = lambda v: v.reshape(1, -1).astype(jnp.float32)
    spec_w = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tail_kernel, heads=heads, d=d, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, n // bq),
            in_specs=[
                pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                spec_w(1, c), spec_w(1, c), spec_w(c, c), spec_w(c, c),
                spec_w(1, c),
                pl.BlockSpec((1, nk, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                spec_w(1, c), spec_w(1, c),
                spec_w(c, inner), spec_w(c, inner),
                spec_w(1, inner), spec_w(1, inner),
                spec_w(inner, c), spec_w(1, c),
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * c + 6 * b * n * c * inner,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * n * (heads * nk + inner),
        ),
    )(x, vec(g2), vec(b2), wq, wo.astype(x.dtype), vec(bo), kc, vc,
      vec(g3), vec(b3), w1a, w1g, b1a, b1g, w2.astype(x.dtype), vec(bff))


def tail_xla(x, g2, b2, wq, wo, bo, kc, vc, g3, b3, w1, b1, w2, bff,
             heads, d, kv_len):
    from sd_tpu.ops.attention import dot_product_attention

    b, n, c = x.shape
    inner = w2.shape[0]

    def ln(x, gm, bt):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gm + bt).astype(x.dtype)

    xln = ln(x, g2, b2)
    q = (xln @ wq.astype(x.dtype)).reshape(b, n, heads, d)
    k = kc[:, :kv_len].reshape(b, kv_len, heads, d)
    v = vc[:, :kv_len].reshape(b, kv_len, heads, d)
    att = dot_product_attention(q, k, v, impl="xla").reshape(b, n, c)
    x = (att @ wo.astype(x.dtype) + bo.astype(x.dtype)) + x
    xln3 = ln(x, g3, b3)
    s = xln3 @ w1.astype(x.dtype) + b1.astype(x.dtype)
    a, gt = s[..., :inner], s[..., inner:]
    h = a * jax.nn.gelu(gt, approximate=False)
    return (h @ w2.astype(x.dtype) + bff.astype(x.dtype)) + x


def main_tail():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    heads, d = 8, c // 8
    inner, kv_len, nk = 4 * c, 77, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    x0 = jax.random.normal(ks[0], (B, n, c), jnp.bfloat16)
    g2 = jnp.ones((c,), jnp.float32); b2 = jnp.zeros((c,), jnp.float32)
    g3 = jnp.ones((c,), jnp.float32); b3 = jnp.zeros((c,), jnp.float32)
    wq = jax.random.normal(ks[1], (c, c), jnp.float32) * 0.03
    wo = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.03
    bo = jax.random.normal(ks[3], (c,), jnp.float32) * 0.1
    kc = jax.random.normal(ks[4], (B, nk, c), jnp.bfloat16) * 0.5
    kc = kc.at[:, kv_len:].set(0)
    vc = jax.random.normal(ks[5], (B, nk, c), jnp.bfloat16) * 0.5
    vc = vc.at[:, kv_len:].set(0)
    w1 = jax.random.normal(ks[6], (c, 2 * inner), jnp.float32) * 0.03
    b1 = jax.random.normal(ks[7], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[8], (inner, c), jnp.float32) * 0.03
    bff = jax.random.normal(ks[9], (c,), jnp.float32) * 0.1
    args = (g2, b2, wq, wo, bo, kc, vc, g3, b3, w1, b1, w2, bff)

    @jax.jit
    def step_fused(x):
        return tail_fused(x, *args, heads=heads, d=d, kv_len=kv_len)

    @jax.jit
    def step_xla(x):
        return tail_xla(x, *args, heads=heads, d=d, kv_len=kv_len)

    y1 = step_fused(x0); y2 = step_xla(x0)
    diff = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
    print(f"tail maxdiff: {diff:.4f}", flush=True)
    ms_f = time_chain(step_fused, x0)
    ms_x = time_chain(step_xla, x0)
    print(json.dumps({"tail_fused": round(ms_f, 3), "tail_xla": round(ms_x, 3),
                      "n": n, "c": c}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tail":
        main_tail()
    else:
        main()
