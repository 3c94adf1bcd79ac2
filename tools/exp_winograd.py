"""Winograd F(2x2, 3x3) experiment for the UNet conv path.

XLA does NOT use Winograd on TPU: every stride-1 SAME 3x3 conv pays 9
MACs/output on the MXU. F(2,3) pays 4 (2.25x fewer), which breaks through
the lane-padded conv floor (36.3 ms padded bound vs 42.2 measured for the
whole CFG step conv path — tools/conv_inventory.py).

This script:
  numerics  — CPU fp32 check of the parity-plane Winograd vs lax.conv
  time      — TPU timing at the four UNet levels: direct conv vs
              XLA-composed Winograd (strided slices + batched matmul)

The parity-plane trick: pre-split x_pad into the four (row,col) parity
planes so every transform step is a UNIT-stride slice + add — the layout
a Pallas kernel can also use without strided sublane access.

1-D F(2,3) (Lavin & Gray, correlation convention, matching
lax.conv_general_dilated NHWC/HWIO):
  B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
  G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
  A^T = [[1,1,1,0],[0,1,-1,-1]]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16

LEVELS = [
    ("l0_64x64x320", 64, 64, 320, 320),
    ("l1_32x32x640", 32, 32, 640, 640),
    ("l2_16x16x1280", 16, 16, 1280, 1280),
    ("l3_8x8x1280", 8, 8, 1280, 1280),
]


def weight_transform(w):
    """w [3,3,Cin,Cout] -> U [16, Cin, Cout] (shared with the kernel)."""
    from sd_tpu.ops.pallas.winograd_conv import weight_transform as wt
    return wt(w)


def winograd_conv3x3(x, w, compute_dtype=None):
    """F(2x2,3x3) SAME stride-1 conv, parity-plane formulation. NHWC/HWIO."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    r, s = h // 2, wd // 2
    cdt = compute_dtype or x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # parity planes [B, R+1, S+1, C]: P[i][j][:, r, s] = xp[:, 2r+i, 2s+j]
    p = [[xp[:, i:i + 2 * r + 1:2, j:j + 2 * s + 1:2, :] for j in (0, 1)]
         for i in (0, 1)]

    def row_t(p0, p1):
        d0, d1, d2, d3 = p0[:, :-1], p1[:, :-1], p0[:, 1:], p1[:, 1:]
        return (d0 - d2, d1 + d2, d2 - d1, d1 - d3)

    tj0 = row_t(p[0][0], p[1][0])
    tj1 = row_t(p[0][1], p[1][1])
    v = []
    for a in range(4):
        b0, b1 = tj0[a][:, :, :-1], tj1[a][:, :, :-1]
        b2, b3 = tj0[a][:, :, 1:], tj1[a][:, :, 1:]
        v += [b0 - b2, b1 + b2, b2 - b1, b1 - b3]
    v = jnp.stack(v)                                   # [16, B, R, S, C]
    u = weight_transform(w)                            # [16, C, Cout]
    m = jnp.einsum("pbrsc,pck->pbrsk", v.astype(cdt), u.astype(cdt),
                   preferred_element_type=jnp.float32)
    m = m.reshape(4, 4, b, r, s, cout)
    z0 = m[0] + m[1] + m[2]
    z1 = m[1] - m[2] - m[3]
    y00, y01 = z0[0] + z0[1] + z0[2], z0[1] - z0[2] - z0[3]
    y10, y11 = z1[0] + z1[1] + z1[2], z1[1] - z1[2] - z1[3]
    y = jnp.stack([jnp.stack([y00, y01], axis=0),
                   jnp.stack([y10, y11], axis=0)])     # [2(p),2(q),B,R,S,K]
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, wd, cout)
    return y.astype(x.dtype)


def direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def numerics():
    jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(0)
    for h, wd, c, cout in [(8, 8, 16, 24), (16, 12, 32, 32)]:
        kx, kw = jax.random.split(jax.random.fold_in(key, h))
        x = jax.random.normal(kx, (3, h, wd, c), jnp.float32)
        w = jax.random.normal(kw, (3, 3, c, cout), jnp.float32) * 0.1
        y_ref = direct_conv(x, w)
        y_win = winograd_conv3x3(x, w)
        err = float(jnp.max(jnp.abs(y_ref - y_win)))
        rel = err / float(jnp.max(jnp.abs(y_ref)))
        print(f"fp32 {h}x{wd}x{c}->{cout}: max abs {err:.2e} rel {rel:.2e}")
        xb = x.astype(jnp.bfloat16)
        yb_ref = direct_conv(xb, w.astype(jnp.bfloat16)).astype(jnp.float32)
        yb_win = winograd_conv3x3(xb, w).astype(jnp.float32)
        errb = float(jnp.max(jnp.abs(yb_ref - yb_win)))
        scale = float(jnp.max(jnp.abs(y_ref)))
        print(f"bf16 {h}x{wd}x{c}->{cout}: win-vs-directbf16 {errb:.3e} "
              f"({errb/scale:.2%} of max), direct-bf16-vs-fp32 "
              f"{float(jnp.max(jnp.abs(yb_ref - y_ref))):.3e}")


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_chain(step, x0, iters=30, reps=3):
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


def timing():
    out = {}
    for name, h, wd, c, cout in LEVELS:
        key = jax.random.PRNGKey(hash(name) % 2**31)
        x0 = jax.random.normal(key, (B, h, wd, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, cout), jnp.float32) * 0.02
        flops = 2 * B * h * wd * 9 * c * cout
        bound = flops / 197e12 * 1e3

        @jax.jit
        def step_d(x, _w=w):
            return direct_conv(x, _w)

        @jax.jit
        def step_w(x, _w=w):
            return winograd_conv3x3(x, _w)

        d = float(jnp.max(jnp.abs(step_d(x0).astype(jnp.float32)
                                  - step_w(x0).astype(jnp.float32))))
        ms_d = time_chain(step_d, x0)
        ms_w = time_chain(step_w, x0)
        out[name] = {"direct": round(ms_d, 3), "wino_xla": round(ms_w, 3),
                     "bound": round(bound, 3), "maxdiff": round(d, 4)}
        print(f"{name:16s} direct {ms_d:7.3f}  wino_xla {ms_w:7.3f}  "
              f"(bound {bound:5.2f}, wino bound {bound/2.25:5.2f})  "
              f"maxdiff {d:.4f}", flush=True)
    print(json.dumps(out))


def timing_pallas():
    """Fused Pallas kernel vs direct conv, with a (trh, tk) sweep."""
    from sd_tpu.ops.pallas.winograd_conv import winograd_conv3x3

    levels = LEVELS if len(sys.argv) < 3 else [
        l for l in LEVELS if l[0].startswith(sys.argv[2])]
    # (trh, tk, interleave)
    sweep = {
        "l0_64x64x320": [(16, None, True), (16, None, False),
                         (8, None, True)],
        "l1_32x32x640": [(8, None, True), (16, None, True), (8, 320, True)],
        "l2_16x16x1280": [(8, None, True), (8, 320, True)],
        "l3_8x8x1280": [(4, None, True)],
    }
    out = {}
    for name, h, wd, c, cout in levels:
        key = jax.random.PRNGKey(hash(name) % 2**31)
        x0 = jax.random.normal(key, (B, h, wd, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, cout), jnp.float32) * 0.02
        bound = 2 * B * h * wd * 9 * c * cout / 197e12 * 1e3

        @jax.jit
        def step_d(x, _w=w):
            return direct_conv(x, _w)

        ms_d = time_chain(step_d, x0)
        out[f"{name}/direct"] = round(ms_d, 3)
        print(f"{name:16s} direct          {ms_d:7.3f}  (bound {bound:5.2f}, "
              f"wino bound {bound/2.25:5.2f})", flush=True)
        for trh, tk, il in sweep.get(name, [(8, None, True)]):
            @jax.jit
            def step_p(x, _w=w, _t=trh, _k=tk, _il=il):
                return winograd_conv3x3(x, _w, trh=_t, tk=_k, interleave=_il)

            try:
                d = float(jnp.max(jnp.abs(
                    step_d(x0).astype(jnp.float32)
                    - step_p(x0).astype(jnp.float32))))
                ms_p = time_chain(step_p, x0)
            except Exception as e:
                print(f"{name} trh={trh} tk={tk} il={il}: FAIL "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                continue
            out[f"{name}/wino_trh{trh}_tk{tk}_il{int(il)}"] = round(ms_p, 3)
            print(f"{name:16s} wino trh={trh:2d} tk={tk} il={int(il)} "
                  f"{ms_p:7.3f}  maxdiff {d:.4f}", flush=True)
    print(json.dumps(out))


def timing_split():
    """v3 probe: parity split INSIDE the kernel (stride-2 slices on loaded
    values) — kills the XLA prep pass if Mosaic lowers the strided slice
    well."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from sd_tpu.ops.pallas.winograd_conv import (_AT, _acc_signed,
                                                 weight_transform)

    def kernel(x_ref, u_ref, o_ref, *, s, trh):
        xb = x_ref[0]                       # [2*trh+2, W+2, C]
        c = xb.shape[-1]
        tk = u_ref.shape[-1]
        # row parity: free leading-dim reshape; col parity: one sublane-pair
        # reshape (Mosaic relayout) per row-parity plane
        xr = xb.reshape(trh + 1, 2, xb.shape[1], c)
        p = {}
        for i in (0, 1):
            xi = xr[:, i].reshape(trh + 1, xb.shape[1] // 2, 2, c)
            p[(i, 0)] = xi[:, :s + 1, 0, :]
            p[(i, 1)] = xi[:, :s + 1, 1, :]

        def row_t(a):
            d = ((p[(0, 0)][:-1], p[(0, 1)][:-1]),
                 (p[(1, 0)][:-1], p[(1, 1)][:-1]),
                 (p[(0, 0)][1:], p[(0, 1)][1:]),
                 (p[(1, 0)][1:], p[(1, 1)][1:]))
            if a == 0:
                return d[0][0] - d[2][0], d[0][1] - d[2][1]
            if a == 1:
                return d[1][0] + d[2][0], d[1][1] + d[2][1]
            if a == 2:
                return d[2][0] - d[1][0], d[2][1] - d[1][1]
            return d[1][0] - d[3][0], d[1][1] - d[3][1]

        acc = {}
        for a in range(4):
            ta0, ta1 = row_t(a)
            b0, b1 = ta0[:, :s, :], ta1[:, :s, :]
            b2, b3 = ta0[:, 1:s + 1, :], ta1[:, 1:s + 1, :]
            v = (b0 - b2, b1 + b2, b2 - b1, b1 - b3)
            z0 = z1 = None
            for bb in range(4):
                m = jax.lax.dot(v[bb].reshape(trh * s, c), u_ref[4 * a + bb],
                                preferred_element_type=jnp.float32)
                z0 = _acc_signed(z0, m, _AT[0][bb])
                z1 = _acc_signed(z1, m, _AT[1][bb])
            for pp in range(2):
                for q, zq in ((0, z0), (1, z1)):
                    acc[(pp, q)] = _acc_signed(acc.get((pp, q)), zq,
                                               _AT[pp][a])
        ys = {k: v.reshape(trh, s, tk) for k, v in acc.items()}
        z0 = jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=2)
        z1 = jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=2)
        zz = jnp.stack([z0, z1], axis=1)
        o_ref[0] = zz.reshape(2 * trh, 2 * s, tk).astype(o_ref.dtype)

    def wino_split(x, w, trh):
        b, h, wd, c = x.shape
        k = w.shape[-1]
        r, s = h // 2, wd // 2
        u = weight_transform(w).astype(x.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        rows = 2 * trh + 2
        return pl.pallas_call(
            ft.partial(kernel, s=s, trh=trh),
            out_shape=jax.ShapeDtypeStruct((b, h, wd, k), x.dtype),
            grid_spec=pl.GridSpec(
                grid=(b, r // trh),
                in_specs=[
                    pl.BlockSpec((pl.Element(1), pl.Element(rows),
                                  pl.Element(wd + 2), pl.Element(c)),
                                 lambda bi, ri: (bi, 2 * ri * trh, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, c, k), lambda bi, ri: (0, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 2 * trh, wd, k),
                                       lambda bi, ri: (bi, ri, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * r * s * 16 * c * k,
                bytes_accessed=2 * x.size * x.dtype.itemsize,
                transcendentals=0),
        )(xp, u)

    name, h, wd, c, cout = LEVELS[0] if len(sys.argv) < 3 else [
        l for l in LEVELS if l[0].startswith(sys.argv[2])][0]
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, h, wd, c), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, c, cout), jnp.float32) * 0.02

    @jax.jit
    def step_d(x, _w=w):
        return direct_conv(x, _w)

    ms_d = time_chain(step_d, x0)
    print(f"{name} direct {ms_d:.3f}", flush=True)
    for trh in (8, 16):
        @jax.jit
        def step_s(x, _w=w, _t=trh):
            return wino_split(x, _w, _t)

        try:
            d = float(jnp.max(jnp.abs(step_d(x0).astype(jnp.float32)
                                      - step_s(x0).astype(jnp.float32))))
            ms = time_chain(step_s, x0)
            print(f"{name} wino_split trh={trh} {ms:.3f}  maxdiff {d:.4f}",
                  flush=True)
        except Exception as e:
            print(f"{name} wino_split trh={trh}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "time":
        timing()
    elif len(sys.argv) > 1 and sys.argv[1] == "pallas":
        timing_pallas()
    elif len(sys.argv) > 1 and sys.argv[1] == "split":
        timing_split()
    else:
        numerics()
