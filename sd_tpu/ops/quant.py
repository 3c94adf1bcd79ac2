"""W8A8 int8 quantized convolution (inference-time, opt-in).

VERDICT r3 #6: the 4x A100 target is priced against bf16's 197 TFLOP/s MXU
rate and the floor table says the conv path already runs at 96% of that
bound — int8 (394 TOPS on v5e) is the only lever that moves the bound
itself. Stage-A microbenches (tools/exp_int8.py, v5e, this round) showed
XLA:TPU does lower int8 convolutions at a higher MXU rate:

    conv3x3 64x64 c320   bf16 2.624 ms  int8pure 1.537 (1.71x)  W8A8 1.760 (1.49x)
    conv3x3 32x32 c640   bf16 1.792 ms  int8pure 1.273 (1.41x)  W8A8 1.474 (1.22x)
    conv3x3 16x16 c1280  bf16 1.491 ms  int8pure 1.234 (1.21x)  W8A8 1.399 (1.07x)
    conv3x3 32x32 c1920  bf16 2.891 ms  int8pure 2.001 (1.44x)  W8A8 2.754 (1.05x)

while every *dense* site LOSES with dynamic activation quantization
(0.76-0.88x) — so only the spatial-conv sites (``sd_tpu/ops/conv.py``)
dispatch here, and only when ``SD_TPU_INT8`` opts in.

Stage-B in-context ablation (tools/bench_attn.py unet, full CFG UNet step,
v5e, this round — the harness every r2/r3 dispatch decision used):

    auto (bf16)            113.29 ms/step
    int8 @ 64x64 sites     110.33
    int8 @ 64+32px sites   105.16
    int8 @ ALL conv sites  100.18   (-11.6% vs bf16)

The win exceeds the microbench prediction at the 16x16 sites because the
skip-concat convs there carry the largest cin (1920/2560) and the dequant
epilogue fuses where the bf16 conv's convert epilogue used to sit.

Scheme: per-output-channel symmetric weight scales (computed from the fp32
kernel inside the jitted program — weights are jit arguments, so this costs
one small reduce per site per call), per-tensor dynamic symmetric activation
scale, int8 x int8 -> int32 MXU conv, fp32 dequant + bias epilogue.

Quality: W8A8 is a lossy approximation — it cannot hold the seed-parity
gate that every other dispatch decision in this repo passes, and the
zero-egress environment has no trained checkpoint to measure real sample
quality on (BASELINE.md gate). It therefore ships OFF by default as an
explicitly opt-in serving mode, with the measured in-context speedup
recorded in PARITY.md. Inference-only: ``round`` has zero gradient a.e.;
do not enable while training.

``SD_TPU_INT8`` values (round 5 extends the conv-only r4 grammar to the
three MXU-bound buckets — VERDICT r4 next-round #1):
    0/off (default)   bf16 everywhere
    1/all             the full int8 serving mode: convs + fused GEGLU-FF +
                      flash QK^T (every bucket that passed its quality gate)
    conv[,ff][,attn][,attn_pv][,proj]
                      explicit bucket list; ``attn`` = int8 QK^T inside the
                      flash kernel (P@V stays bf16 — the SageAttention
                      split); ``attn_pv`` additionally quantizes P@V;
                      ``proj`` = fused W8A8 attention projections
                      (ops/pallas/int8_dense.py)
    <N>               conv bucket only, at sites with H*W >= N (e.g. 4096 =
                      the 64x64 L0 sites)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["int8_enabled", "int8_conv3x3", "int8_buckets",
           "int8_bucket_enabled", "int8_mode_label", "quantize_rows",
           "quantize_conv_kernel", "prequantize_weights", "wq_hoist_wanted"]

_BUCKETS = ("conv", "ff", "attn", "attn_pv", "proj")
# "all" = the shipped serving mode: every bucket whose quality gate passed
# (tools/int8_quality.py) AND measured faster in-context. attn_pv and proj
# stay explicit-only: proj was MEASURED a big loss on-chip (r5,
# /tmp/unet_proj_r5.log: int8full 95.64 vs +proj 112.31 ms/CFG-step — the
# standalone-kernel QKV projection forfeits XLA's fused dilated-conv
# lowering around the self-attention sites, the same in-context effect that
# killed the r3 projection-barrier ablations); attn_pv only pays lane-wide
# (d>=256, i.e. VAE decode), where the attn bucket already routes it.
_ALL = frozenset(("conv", "ff", "attn"))


def _conv_threshold():
    env = os.environ.get("SD_TPU_INT8", "0").lower()
    try:
        return int(env) if int(env) > 1 else None
    except ValueError:
        return None


def int8_buckets() -> frozenset:
    """The trace-time int8 bucket set from ``SD_TPU_INT8``."""
    env = os.environ.get("SD_TPU_INT8", "0").lower()
    if env in ("0", "off", ""):
        return frozenset()
    if env in ("1", "all"):
        return _ALL
    try:
        int(env)
        return frozenset(("conv",))  # numeric = conv threshold grammar
    except ValueError:
        pass
    toks = frozenset(t.strip() for t in env.split(",") if t.strip())
    unknown = toks - frozenset(_BUCKETS)
    if unknown:
        raise ValueError(f"SD_TPU_INT8: unknown buckets {sorted(unknown)} "
                         f"(valid: {_BUCKETS}, 'all', a threshold int, or 0)")
    return toks


def int8_bucket_enabled(bucket: str, dtype) -> bool:
    """Trace-time dispatch gate shared by every int8 bucket: opted-in, bf16
    compute, TPU backend (the int8 MXU rate is the entire point)."""
    if bucket not in int8_buckets():
        return False
    if dtype != jnp.bfloat16:
        return False
    return jax.default_backend() == "tpu"


def int8_mode_label() -> str:
    """The honest metric label for benches: derived from the SAME predicate
    the dispatch uses (ADVICE r4 #3 — a raw env parse can claim int8 ran
    when the backend/dtype gate kept it off)."""
    active = sorted(b for b in _BUCKETS
                    if int8_bucket_enabled(b, jnp.bfloat16))
    if not active:
        return "bf16"
    thr = _conv_threshold()
    if thr and "conv" in active:
        active[active.index("conv")] = f"conv>={thr}"
    return "bf16+int8[" + ",".join(active) + "]"


def int8_enabled(x_shape, dtype) -> bool:
    """Trace-time dispatch gate for the W8A8 conv path."""
    if not int8_bucket_enabled("conv", dtype):
        return False
    thr = _conv_threshold()
    return thr is None or x_shape[1] * x_shape[2] >= thr


def quantize_rows(x, axis: int = -1):
    """Symmetric per-row int8 quantization along ``axis`` (fp32 math).

    Returns ``(q_int8, scale)`` with ``scale`` shaped like ``x`` with
    ``axis`` reduced to 1, such that ``q * scale ~= x``.
    """
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=axis, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def quantize_conv_kernel(kernel):
    """Per-output-channel symmetric int8 quantization of a conv kernel.

    ``kernel`` [3,3,Cin,Cout] (any float dtype) -> ``(kq int8, sw fp32
    [Cout])`` with ``kq * sw ~= kernel``. The SAME math whether run inline
    per step (``int8_conv3x3`` without prequant) or hoisted to load time
    (``prequantize_weights``) — bitwise, so the int8 quality gate transfers.
    """
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0, 1e-12)
    kq = jnp.clip(jnp.round(kf / sw[None, None, None, :]),
                  -127.0, 127.0).astype(jnp.int8)
    return kq, sw


def int8_conv3x3(x, kernel, bias, out_dtype, prequant=None):
    """W8A8 3x3 stride-1 SAME conv: quantize -> int8 MXU conv -> dequant.

    ``x`` [B,H,W,Cin] (any float dtype), ``kernel`` [3,3,Cin,Cout] fp32,
    ``bias`` [Cout] fp32. Returns [B,H,W,Cout] in ``out_dtype``.

    ``prequant``: optional ``(kq, sw)`` from :func:`quantize_conv_kernel`,
    computed ONCE at checkpoint-load time (the ``qw`` overlay —
    ``prequantize_weights``). Re-quantizing the 521M UNet conv weights
    inline costs ~nothing in a single-step program (XLA fuses the quantize
    into the conv's weight read) but a measured 1.6 ms/CFG-step inside
    ``lax.scan`` sampler programs, where LICM does NOT hoist it and int8
    weights halve the per-step weight traffic (tools/exp_wq_hoist.py, v5e:
    scan inline 93.67 vs pre-quantized 92.09 ms).
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)

    kq, sw = prequant if prequant is not None else quantize_conv_kernel(kernel)

    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)
            + bias.astype(jnp.float32)).astype(out_dtype)


def wq_hoist_wanted() -> bool:
    """Build-time gate for the load-time weight-quantization overlay
    (``SD_TPU_WQ_HOIST``, default on): only meaningful when an int8 WEIGHT
    bucket would actually dispatch (same predicate as the ops — the ADVICE
    r4 #3 lesson: an env parse alone can claim int8 on CPU/fp32 runs where
    the gate keeps it off, and the overlay would be dead device memory)."""
    if os.environ.get("SD_TPU_WQ_HOIST", "1").lower() in ("0", "off", "false"):
        return False
    return (int8_bucket_enabled("conv", jnp.bfloat16)
            or int8_bucket_enabled("ff", jnp.bfloat16))


def _is_conv3x3_kernel(leaf) -> bool:
    return (hasattr(leaf, "ndim") and leaf.ndim == 4
            and tuple(leaf.shape[:2]) == (3, 3))


def _geglu_ff_pair(node):
    """``(w1, w2)`` when ``node`` is a GEGLU FeedForward param subtree
    (children ``proj_in/proj/kernel`` [C, 2*inner] + ``proj_out/kernel``
    [inner, C_out] — sd_tpu/ops/attention.py::FeedForward fused path)."""
    try:
        w1 = node["proj_in"]["proj"]["kernel"]
        w2 = node["proj_out"]["kernel"]
    except (KeyError, TypeError, IndexError):
        return None
    if (getattr(w1, "ndim", 0) == 2 and getattr(w2, "ndim", 0) == 2
            and w1.shape[1] == 2 * w2.shape[0]):
        return w1, w2
    return None


def prequantize_weights(params, compute_dtype=jnp.bfloat16):
    """Walk a param pytree and build the ``qw`` weight-quantization overlay.

    Returns a nested dict mirroring ``params``'s module paths with int8
    copies of every weight the int8 serving mode re-quantizes per step:

    - at each ``Conv3x3`` path (a ``kernel`` [3,3,Cin,Cout]):
      ``{"kq": int8, "sw": fp32[Cout]}`` — consumed by
      ``sd_tpu/ops/conv.py::Conv3x3``;
    - at each GEGLU FeedForward path: ``{"w1a_q","w1a_s","w1g_q","w1g_s",
      "w2_q","w2_s"}`` quantized exactly as
      ``geglu_ff._quantize_cols`` does inline (value half first, gate
      second; weights cast to ``compute_dtype`` first, matching the
      kernel's ``w.astype(x.dtype)``) — consumed by
      ``sd_tpu/ops/attention.py::FeedForward``.

    The overlay rides flax's variable system: pass
    ``{"params": params, "qw": prequantize_weights(params)}`` to ``apply``;
    modules fall back to inline per-step quantization when their entry is
    absent. Entries at paths whose site doesn't dispatch int8 (e.g. plain
    ``nn.Conv`` 3x3s, CPU runs) are simply never read and get pruned at
    compile. Quantization math is bitwise identical to the inline path
    (tests/test_wq_hoist.py), so tools/int8_quality.py's gate covers both.

    Returns None when the walk finds nothing (e.g. a params tree with no
    conv/FF sites).
    """

    from collections.abc import Mapping

    def walk(node):
        if not isinstance(node, Mapping):
            return None
        out = {}
        pair = _geglu_ff_pair(node)
        if pair is not None:
            w1, w2 = pair
            inner = w2.shape[0]
            w1c = w1.astype(compute_dtype)
            w1a_q, w1a_s = quantize_rows(w1c[:, :inner], axis=0)
            w1g_q, w1g_s = quantize_rows(w1c[:, inner:], axis=0)
            w2_q, w2_s = quantize_rows(w2.astype(compute_dtype), axis=0)
            out.update(w1a_q=w1a_q, w1a_s=w1a_s, w1g_q=w1g_q, w1g_s=w1g_s,
                       w2_q=w2_q, w2_s=w2_s)
        kernel = node.get("kernel")
        if kernel is not None and _is_conv3x3_kernel(kernel):
            kq, sw = quantize_conv_kernel(kernel)
            out.update(kq=kq, sw=sw)
        for name, child in node.items():
            if name == "kernel":
                continue
            sub = walk(child)
            if sub:
                out[name] = sub
        return out or None

    return walk(params)
