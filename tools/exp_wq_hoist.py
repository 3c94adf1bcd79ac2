"""Weight-quantize hoisting experiment (round 5).

Question: the W8A8 int8 serving mode re-quantizes WEIGHTS from bf16 on every
call — `int8_conv3x3` per conv site (an extra full pass over every 3x3-conv
kernel: abs-max reduce + round + int8 store) and `geglu_ff._quantize_cols`
per FF site. Weights are loop-invariant across sampler steps, so this work
is hoistable. Does it cost real time, and does XLA's while-loop LICM already
hoist it out of scan programs (bench.py's cached-sampler path)?

Four in-context measurements on the CFG UNet step, SD_TPU_INT8=all
(tools/bench_attn.py methodology: async chains, one terminal sync,
params/context as jit args — never closures):

  A. inline    today's path: weights quantized inside every step call
  B. pre       weights pre-quantized OUTSIDE the program and threaded in as
               jit args via a trace-order FIFO monkeypatch — the hoisted
               ceiling for step-loop serving (scripts/serve.py, bench_attn)
  C. scan10    a 10-step lax.scan over the inline step (the production
               sampler/bench.py program shape)
  D. scan10pre the same scan with pre-quantized weights as scan constants —
               C−D is the prize actually available in production; C==D
               means XLA's while-loop LICM already hoists the weight
               re-quantization out of the loop.

NOTE: `sd_tpu/ops/conv.py` binds int8_conv3x3 by from-import — patch BOTH
namespaces or the conv sites silently keep the real function (the first run
of this experiment recorded 0 conv sites that way).

Run: SD_TPU_INT8=all python tools/exp_wq_hoist.py [iters]
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

os.environ.setdefault("SD_TPU_INT8", "all")

import jax
import jax.numpy as jnp

from bench_attn import build_unet, sync, time_chain  # noqa: E402

import sd_tpu.ops.quant as quant_mod  # noqa: E402
import sd_tpu.ops.conv as conv_mod  # noqa: E402
import sd_tpu.ops.pallas.geglu_ff as ff_mod  # noqa: E402


def _patch_conv(fn):
    quant_mod.int8_conv3x3 = fn
    conv_mod.int8_conv3x3 = fn


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    unet, params, x0, t0, c0 = build_unet()

    # ---- record pass: conv-kernel / FF-weight shapes in trace order -------
    conv_shapes, ff_shapes = [], []
    real_conv = quant_mod.int8_conv3x3
    real_qcols = ff_mod._quantize_cols

    def rec_conv(x, kernel, bias, out_dtype):
        conv_shapes.append(tuple(kernel.shape))
        return real_conv(x, kernel, bias, out_dtype)

    def rec_qcols(w):
        ff_shapes.append(tuple(w.shape))
        return real_qcols(w)

    def jstep(x, p, c):
        return unet.apply({"params": p}, x, t0, c).astype(jnp.bfloat16)

    _patch_conv(rec_conv)
    ff_mod._quantize_cols = rec_qcols
    try:
        jax.eval_shape(jstep, x0, params, c0)
    finally:
        _patch_conv(real_conv)
        ff_mod._quantize_cols = real_qcols
    assert conv_shapes, "conv patch missed again — check ops/conv.py binding"

    conv_elems = sum(3 * 3 * s[2] * s[3] for s in conv_shapes)
    ff_elems = sum(s[0] * s[1] for s in ff_shapes)
    print(f"int8 conv sites: {len(conv_shapes)} "
          f"({conv_elems / 1e6:.1f}M weights/step re-quantized)")
    print(f"int8 FF weight tensors: {len(ff_shapes)} "
          f"({ff_elems / 1e6:.1f}M weights/step re-quantized)", flush=True)

    # ---- pre-quantized arg trees ------------------------------------------
    key = jax.random.PRNGKey(3)
    qconv = []
    for i, s in enumerate(conv_shapes):
        kq = jax.random.randint(jax.random.fold_in(key, i), s, -127, 128,
                                jnp.int32).astype(jnp.int8)
        sw = jnp.full((s[3],), 0.02 / 127.0, jnp.float32)
        qconv.append((kq, sw))
    qff = []
    for i, s in enumerate(ff_shapes):
        q = jax.random.randint(jax.random.fold_in(key, 10_000 + i), s, -127,
                               128, jnp.int32).astype(jnp.int8)
        sc = jnp.full((1, s[1]), 0.02 / 127.0, jnp.float32)
        qff.append((q, sc))

    # ---- FIFO-patched pre-quantized step -----------------------------------
    fifo = {"conv": [], "ff": []}

    def pre_conv(x, kernel, bias, out_dtype):
        kq, sw = fifo["conv"].pop(0)
        assert kq.shape == kernel.shape, (kq.shape, kernel.shape)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * sw)
                + bias.astype(jnp.float32)).astype(out_dtype)

    def pre_qcols(w):
        q, s = fifo["ff"].pop(0)
        assert q.shape == w.shape, (q.shape, w.shape)
        return q, s

    def jstep_pre_py(x, p, c, qc, qf):
        fifo["conv"] = list(qc)
        fifo["ff"] = list(qf)
        out = unet.apply({"params": p}, x, t0, c).astype(jnp.bfloat16)
        assert not fifo["conv"] and not fifo["ff"], "FIFO misalignment"
        return out

    results = {}

    # ---- A: inline ---------------------------------------------------------
    jstep_inline = jax.jit(jstep)
    ms = time_chain(lambda x: jstep_inline(x, params, c0), x0,
                    iters=iters, reps=2)
    results["A_inline"] = round(ms, 2)
    print(f"A inline   {ms:8.2f} ms/CFG-step", flush=True)

    # ---- B: pre-quantized --------------------------------------------------
    _patch_conv(pre_conv)
    ff_mod._quantize_cols = pre_qcols
    try:
        jstep_pre = jax.jit(jstep_pre_py)
        ms = time_chain(lambda x: jstep_pre(x, params, c0, qconv, qff), x0,
                        iters=iters, reps=2)
    finally:
        _patch_conv(real_conv)
        ff_mod._quantize_cols = real_qcols
    results["B_pre"] = round(ms, 2)
    print(f"B pre      {ms:8.2f} ms/CFG-step", flush=True)

    # ---- C: 10-step scan, inline quantize ----------------------------------
    nscan = 10

    @jax.jit
    def jscan(x, p, c):
        def body(xx, _):
            e = unet.apply({"params": p}, xx, t0, c).astype(jnp.bfloat16)
            return e, ()

        y, _ = jax.lax.scan(body, x, None, length=nscan)
        return y

    t_compile = time.perf_counter()
    sync(jscan(x0, params, c0))
    print(f"scan compile+run: {time.perf_counter() - t_compile:.1f} s",
          flush=True)
    best = float("inf")
    for _ in range(2):
        x = x0
        t0_ = time.perf_counter()
        for _ in range(3):
            x = jscan(x, params, c0)
        sync(x)
        best = min(best, (time.perf_counter() - t0_) / (3 * nscan))
    results["C_scan10"] = round(best * 1000.0, 2)
    print(f"C scan10   {best * 1000.0:8.2f} ms/CFG-step", flush=True)

    # ---- D: 10-step scan, pre-quantized scan constants ----------------------
    def jscan_pre_py(x, p, c, qc, qf):
        def body(xx, _):
            fifo["conv"] = list(qc)
            fifo["ff"] = list(qf)
            e = unet.apply({"params": p}, xx, t0, c).astype(jnp.bfloat16)
            assert not fifo["conv"] and not fifo["ff"], "FIFO misalignment"
            return e, ()

        y, _ = jax.lax.scan(body, x, None, length=nscan)
        return y

    _patch_conv(pre_conv)
    ff_mod._quantize_cols = pre_qcols
    try:
        jscan_pre = jax.jit(jscan_pre_py)
        t_compile = time.perf_counter()
        sync(jscan_pre(x0, params, c0, qconv, qff))
        print(f"scan-pre compile+run: {time.perf_counter() - t_compile:.1f} s",
              flush=True)
        best = float("inf")
        for _ in range(2):
            x = x0
            t0_ = time.perf_counter()
            for _ in range(3):
                x = jscan_pre(x, params, c0, qconv, qff)
            sync(x)
            best = min(best, (time.perf_counter() - t0_) / (3 * nscan))
    finally:
        _patch_conv(real_conv)
        ff_mod._quantize_cols = real_qcols
    results["D_scan10pre"] = round(best * 1000.0, 2)
    print(f"D scan10pre{best * 1000.0:8.2f} ms/CFG-step", flush=True)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
