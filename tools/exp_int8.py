"""Int8 (W8A8) MXU-rate experiment — VERDICT r4 #6.

The 4x A100 target is priced against bf16's 197 TFLOP/s; v5e doubles MXU
throughput for int8 (394 TOPS). The floor table says convs (36.3 ms), FF
(15.4) and projections (8.9) of the 111.35 ms CFG step are at 87-96% of
their *bf16* lane-padded bounds — int8 is the only lever that moves the
bound itself. This tool answers, in order:

  stage A (this file, microbench): does XLA:TPU actually lower int8
    convolutions / dot_generals to the double-rate MXU through this
    runtime, and what does dynamic per-tensor activation quantization
    cost on top? Variants per site:
      bf16      — baseline conv/dot
      int8pure  — both operands pre-quantized int8, int32 accum
                  (isolates the MXU rate; no quant/dequant)
      int8dyn   — bf16 in, per-tensor dynamic act quant + per-channel
                  weight scales + dequant epilogue (the shippable W8A8)
  stage B (ops/quant.py + dispatch flag): if stage A shows a real win,
    gate W8A8 into the UNet's conv/projection/FF sites and measure
    in-context like every other r2/r3 kernel.

Usage: python tools/exp_int8.py [conv|dense|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16
ITERS = 30


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(step, x, iters=ITERS):
    y = step(x)
    sync(y)  # compile + warm
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = step(y)
    sync(y)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def quant_per_tensor(x):
    scale = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def quant_weight_per_cout(w):
    """HWIO conv kernel or [K,M] dense weight: per-output-channel scales."""
    ax = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=ax) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return wq.astype(jnp.int8), scale  # scale: [cout]


def conv_site(h, w, cin, cout, label):
    """cin must be a multiple of cout; the chain is restored by tiling the
    output back to cin channels (same op in every variant, cancels out)."""
    assert cin % cout == 0
    rep = cin // cout
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, w, cin), jnp.bfloat16)
    wt = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                            jnp.float32) * 0.02)
    wt_bf = wt.astype(jnp.bfloat16)
    wq, wscale = quant_weight_per_cout(wt)
    wq = jax.device_put(wq)
    wscale = jax.device_put(wscale)
    dn = ("NHWC", "HWIO", "NHWC")

    def rechain(y):
        return jnp.concatenate([y] * rep, axis=-1) if rep > 1 else y

    @jax.jit
    def f_bf16(xx):
        y = jax.lax.conv_general_dilated(xx, wt_bf, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return rechain(y)

    xq0, _ = quant_per_tensor(x)

    @jax.jit
    def f_int8pure(xxq):
        y = jax.lax.conv_general_dilated(
            xxq, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return rechain((y >> 4).astype(jnp.int8))  # renorm to keep chaining

    @jax.jit
    def f_int8dyn(xx):
        xxq, sx = quant_per_tensor(xx)
        y = jax.lax.conv_general_dilated(
            xxq, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * wscale)
        return rechain(y.astype(jnp.bfloat16))

    t_bf = bench(f_bf16, x)
    try:
        t_pure = bench(f_int8pure, xq0)
    except Exception as e:  # int8 conv may not lower on this backend
        t_pure = float("nan")
        print(f"  int8pure FAILED: {type(e).__name__}: {str(e)[:120]}")
    try:
        t_dyn = bench(f_int8dyn, x)
    except Exception as e:
        t_dyn = float("nan")
        print(f"  int8dyn FAILED: {type(e).__name__}: {str(e)[:120]}")
    print(f"conv3x3 {label:28s} bf16 {t_bf:7.3f}  int8pure {t_pure:7.3f} "
          f"({t_bf / t_pure:4.2f}x)  int8dyn {t_dyn:7.3f} ({t_bf / t_dyn:4.2f}x)")


def dense_site(n, k, m, label):
    """Chained via a second [m,k] projection back to k — present in every
    variant (bf16 in all three so the delta isolates the FIRST matmul
    only when m==k; for m!=k read the pure/dyn columns as lower bounds)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, k), jnp.bfloat16)
    wt = jax.random.normal(jax.random.PRNGKey(1), (k, m), jnp.float32) * 0.02
    wt_bf = wt.astype(jnp.bfloat16)
    wq, wscale = quant_weight_per_cout(wt)
    wback = (jax.random.normal(jax.random.PRNGKey(2), (m, k), jnp.float32)
             * 0.02).astype(jnp.bfloat16) if m != k else None

    def rechain(y):
        return jnp.dot(y.astype(jnp.bfloat16), wback) if m != k else y

    @jax.jit
    def f_bf16(xx):
        return rechain(jnp.dot(xx, wt_bf))

    xq0, _ = quant_per_tensor(x)

    @jax.jit
    def f_int8pure(xxq):
        y = jax.lax.dot_general(xxq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        if m != k:
            y = rechain(y.astype(jnp.bfloat16))
            return jnp.clip(jnp.round(y.astype(jnp.float32)), -127,
                            127).astype(jnp.int8)
        return (y >> 4).astype(jnp.int8)

    @jax.jit
    def f_int8dyn(xx):
        xxq, sx = quant_per_tensor(xx)
        y = jax.lax.dot_general(xxq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (sx * wscale)).astype(jnp.bfloat16)
        return rechain(y)

    t_bf = bench(f_bf16, x)
    try:
        t_pure = bench(f_int8pure, xq0)
    except Exception as e:
        t_pure = float("nan")
        print(f"  int8pure FAILED: {type(e).__name__}: {str(e)[:120]}")
    try:
        t_dyn = bench(f_int8dyn, x)
    except Exception as e:
        t_dyn = float("nan")
        print(f"  int8dyn FAILED: {type(e).__name__}: {str(e)[:120]}")
    print(f"dense   {label:28s} bf16 {t_bf:7.3f}  int8pure {t_pure:7.3f} "
          f"({t_bf / t_pure:4.2f}x)  int8dyn {t_dyn:7.3f} ({t_bf / t_dyn:4.2f}x)")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device: {jax.devices()[0]}, B={B}, iters={ITERS}")
    if mode in ("conv", "all"):
        conv_site(64, 64, 320, 320, "64x64 c320 (L0)")
        conv_site(32, 32, 640, 640, "32x32 c640 (L1)")
        conv_site(16, 16, 1280, 1280, "16x16 c1280 (L2)")
        conv_site(32, 32, 1920, 640, "32x32 c1920->640 (skip)")
    if mode in ("dense", "all"):
        dense_site(B * 4096, 320, 320, "N=65536 K=320 (L0 proj)")
        dense_site(B * 1024, 640, 640, "N=16384 K=640 (L1 proj)")
        dense_site(B * 4096, 320, 2560, "L0 FF in (GEGLU)")
        dense_site(B * 4096, 1280, 320, "L0 FF out")


if __name__ == "__main__":
    main()
