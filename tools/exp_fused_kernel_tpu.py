"""Standalone on-chip check of the fused conv kernel (one shape, one compile).

Isolates the Mosaic INTERNAL error seen in the full-UNet ablation: run a
single fused_conv3x3 at one resblock shape, compare against the XLA
reference composite, and time it. Usage:
  python tools/exp_fused_kernel_tpu.py [l0|l1|l2|skip] [--plain]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 16
SHAPES = {
    "l0": (64, 64, 320, 320),      # unsupported (C%128) — expect ValueError
    "dec0": (64, 64, 640, 320),
    "l1": (32, 32, 640, 640),
    "l2": (16, 16, 1280, 1280),
    "skip": (16, 16, 2560, 1280),
}


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    level = sys.argv[1] if len(sys.argv) > 1 else "l1"
    plain = "--plain" in sys.argv
    h, w, c, n = SHAPES[level]
    from sd_tpu.ops.pallas.fused_conv import _Cfg, _reference, fused_conv3x3

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
    wk = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, n), jnp.float32)
          * 0.02)
    a = jax.random.normal(jax.random.PRNGKey(2), (B, c), jnp.float32) * 0.1 + 1
    d = jax.random.normal(jax.random.PRNGKey(3), (B, c), jnp.float32) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(4), (n,), jnp.float32) * 0.1

    kw = dict(bias=bias, emit_moments="--nomom" not in sys.argv)
    if not plain:
        kw.update(a=a, d=d)

    emit = kw["emit_moments"]

    @jax.jit
    def fused(x):
        out = fused_conv3x3(x, wk, **kw)
        return out if emit else (out,)

    print(f"compiling fused {level} plain={plain} moments={emit} ...",
          flush=True)
    out = fused(x)
    y = out[0]
    sync(y)
    print("fused kernel compiled + ran", flush=True)

    cfg = _Cfg(not plain, True, False, emit, 8, 0, False)

    @jax.jit
    def ref(x):
        out = _reference(cfg, x, wk.reshape(9, c, n),
                         a if not plain else None,
                         d if not plain else None, bias, None)
        return out if emit else (out,)

    refout = ref(x)
    yr = refout[0]
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                - yr.astype(jnp.float32))))
    merr = (float(jnp.max(jnp.abs(out[1] - refout[1]))) / (h * w)
            if emit else 0.0)
    print(f"parity: y maxerr {err:.3e}  moments/px {merr:.3e}", flush=True)

    def time_chain(f, iters=30):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = f(x)
            sync(o[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1000

    tf = time_chain(fused)
    tr = time_chain(ref)
    flops = 2 * B * h * w * 9 * c * n
    bound = flops / 197e12 * 1e3
    print(f"{level}: fused {tf:.3f} ms  xla-composite {tr:.3f} ms  "
          f"unpadded bound {bound:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
