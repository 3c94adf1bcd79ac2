"""GroupNorm implementation shootout — the profile's biggest surprise.

tools/profile_op.py unet shows `convert_reduce_fusion` (GN stats) events
totalling 31.2 ms/step — single reduces costing 40x their bandwidth bound
(1.96 ms for [16,32,32,640] -> f32[16,640]) when the input sits in XLA's
batch-minor conv layout {3,0,2,1}. This tool times GN variants INSIDE a
conv->GN->silu->conv sandwich (reproducing the in-context layout) to find a
formulation XLA lowers sanely.

Variants:
  flax    — current GroupNorm32 (nn.GroupNorm fast-variance on fp32 cast)
  grouped — reshape to [B,H,W,G,C/G], reduce over (1,2,4) in f32
  dot     — stats via ones-matmul on the MXU: sum = ones @ x2d,
            sumsq = ones @ x2d**2 (square materializes once in bf16)
  twopass — reduce H first (keeps minor dims), then W
  nogn    — sandwich without GN (floor)
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
    ("l0", 64, 64, 320),
    ("l1", 32, 32, 640),
]


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


def gn_flax(x, gamma, beta, groups=32, eps=1e-5):
    from sd_tpu.ops.norms import GroupNorm32
    raise RuntimeError("use module path")


def _affine(xn, gamma, beta, dtype):
    return (xn * gamma + beta).astype(dtype)


def gn_grouped(x, gamma, beta, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(b, h * w, groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)       # [B, G]
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32)), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(b, 1, 1, c)
    xn = (x.astype(jnp.float32) - mean_c) * rstd_c
    return _affine(xn, gamma, beta, x.dtype)


def gn_dot(x, gamma, beta, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    cg = c // groups
    n = h * w
    x2 = x.reshape(b, n, c)
    ones = jnp.ones((n,), x.dtype)
    s1 = jnp.einsum("n,bnc->bc", ones, x2,
                    preferred_element_type=jnp.float32)
    s2 = jnp.einsum("bnc,bnc->bc", x2, x2,
                    preferred_element_type=jnp.float32)
    s1 = s1.reshape(b, groups, cg).sum(-1)
    s2 = s2.reshape(b, groups, cg).sum(-1)
    cnt = n * cg
    mean = s1 / cnt
    var = s2 / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(b, 1, 1, c)
    xn = (x.astype(jnp.float32) - mean_c) * rstd_c
    return _affine(xn, gamma, beta, x.dtype)


def gn_twopass(x, gamma, beta, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32)
    sh = xf.sum(axis=1)                       # [B, W, C]
    s1 = sh.sum(axis=1)                       # [B, C]
    sh2 = jnp.square(xf).sum(axis=1)
    s2 = sh2.sum(axis=1)
    s1 = s1.reshape(b, groups, cg).sum(-1)
    s2 = s2.reshape(b, groups, cg).sum(-1)
    cnt = h * w * cg
    mean = s1 / cnt
    var = s2 / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(b, 1, 1, c)
    xn = (xf - mean_c) * rstd_c
    return _affine(xn, gamma, beta, x.dtype)


def main():
    from sd_tpu.ops.norms import GroupNorm32

    out = {}
    for name, h, w, c in LEVELS:
        key = jax.random.PRNGKey(hash(name) % 2**31)
        x0 = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
        k1 = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
        k2 = jax.random.normal(jax.random.fold_in(key, 1),
                               (3, 3, c, c), jnp.bfloat16) * 0.02
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        gn_mod = GroupNorm32()
        gp = gn_mod.init(key, x0)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def sandwich(gn_fn):
            @jax.jit
            def step(x):
                y = conv(x, k1)
                y = gn_fn(y)
                y = jax.nn.silu(y)
                return conv(y, k2).astype(jnp.bfloat16)
            return step

        variants = {
            "nogn": sandwich(lambda y: y),
            "flax": sandwich(lambda y: gn_mod.apply(gp, y)),
            "grouped": sandwich(lambda y: gn_grouped(y, gamma, beta)),
            "dot": sandwich(lambda y: gn_dot(y, gamma, beta)),
            "twopass": sandwich(lambda y: gn_twopass(y, gamma, beta)),
        }
        ref = None
        for vn, step in variants.items():
            try:
                y = step(x0)
                if vn == "flax":
                    ref = y
                ms = time_chain(step, x0)
            except Exception as e:
                print(f"{name}/{vn}: FAIL {type(e).__name__} {str(e)[:200]}",
                      flush=True)
                continue
            d = ""
            if ref is not None and vn not in ("nogn", "flax"):
                d = f"  maxdiff {float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)))):.4f}"
            out[f"{name}/{vn}"] = round(ms, 3)
            print(f"{name}/{vn:8s} {ms:7.3f} ms{d}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
