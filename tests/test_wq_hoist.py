"""Load-time weight-quantization overlay ("qw") for the int8 serving mode.

The int8 mode re-quantizes conv/FF weights from bf16 on EVERY sampler step;
inside ``lax.scan`` programs XLA's LICM does not hoist it and it costs a
measured 1.6 ms/CFG-step (tools/exp_wq_hoist.py, v5e: scan inline 93.67 vs
pre-quantized 92.09). ``ops/quant.py::prequantize_weights`` builds an int8
overlay once at load time; modules consume it via the flax ``qw``
collection. These tests pin:

- the overlay math is BITWISE identical to the inline per-step path (so the
  int8 quality gate, tools/int8_quality.py, covers both);
- modules actually consume the overlay (no silent fall-through to inline);
- the tree walker finds exactly the conv/FF sites;
- the LatentDiffusion threading (runtime_params/bind_params/with_params)
  and the pipeline build population.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sd_tpu.ops.conv as conv_mod
import sd_tpu.ops.pallas.geglu_ff as ff_mod
import sd_tpu.ops.quant as quant
from sd_tpu.ops.quant import (
    int8_conv3x3,
    prequantize_weights,
    quantize_conv_kernel,
)


# ---------------------------------------------------------------- op level


def test_int8_conv3x3_prequant_bitwise():
    """prequant path == inline path, bitwise (same math, hoisted)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 8, 8, 16), jnp.float32)
    kernel = 0.05 * jax.random.normal(k2, (3, 3, 16, 24), jnp.float32)
    bias = jax.random.normal(k3, (24,), jnp.float32)
    inline = int8_conv3x3(x, kernel, bias, jnp.float32)
    pre = int8_conv3x3(x, kernel, bias, jnp.float32,
                       prequant=quantize_conv_kernel(kernel))
    assert np.array_equal(np.asarray(inline), np.asarray(pre))


def test_geglu_ff_prequant_bitwise():
    """The fused W8A8 FF kernel with load-time-quantized weights == the
    inline-quantizing path, bitwise (interpret mode)."""
    c, inner = 320, 1280
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    x = (0.5 * jax.random.normal(ks[0], (512, c))).astype(jnp.bfloat16)
    w1 = (0.05 * jax.random.normal(ks[1], (c, 2 * inner))).astype(jnp.bfloat16)
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32)
    w2 = (0.05 * jax.random.normal(ks[3], (inner, c))).astype(jnp.bfloat16)
    b2 = jax.random.normal(ks[4], (c,), jnp.float32)

    inline = ff_mod.geglu_ff(x, w1, b1, w2, b2, interpret=True, block_m=128,
                             int8=True)
    # the walker's FF emission, via the same node shape it matches
    qw = prequantize_weights(
        {"proj_in": {"proj": {"kernel": w1}}, "proj_out": {"kernel": w2}},
        compute_dtype=jnp.bfloat16)
    pq = (qw["w1a_q"], qw["w1a_s"], qw["w1g_q"], qw["w1g_s"],
          qw["w2_q"], qw["w2_s"])
    pre = ff_mod.geglu_ff(x, w1, b1, w2, b2, interpret=True, block_m=128,
                          int8=True, prequant=pq)
    assert np.array_equal(np.asarray(inline, np.float32),
                          np.asarray(pre, np.float32))


# ------------------------------------------------------------- tree walker


def test_prequantize_walker_selects_conv_and_ff_sites_only():
    r = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    tree = {
        "block": {
            "in_conv": {"kernel": f32(3, 3, 8, 16), "bias": f32(16)},
            "ff": {
                "proj_in": {"proj": {"kernel": f32(8, 64), "bias": f32(64)}},
                "proj_out": {"kernel": f32(32, 8), "bias": f32(8)},
            },
        },
        "dense": {"kernel": f32(8, 16), "bias": f32(16)},      # 2D: skip
        "conv1x1": {"kernel": f32(1, 1, 8, 8)},                # 1x1: skip
        "scale": f32(4),                                        # leaf: skip
    }
    qw = prequantize_weights(tree)
    assert set(qw.keys()) == {"block"}
    assert set(qw["block"]["in_conv"].keys()) == {"kq", "sw"}
    assert qw["block"]["in_conv"]["kq"].dtype == jnp.int8
    assert qw["block"]["in_conv"]["sw"].shape == (16,)
    ff = qw["block"]["ff"]
    assert set(ff.keys()) == {"w1a_q", "w1a_s", "w1g_q", "w1g_s",
                              "w2_q", "w2_s"}
    assert ff["w1a_q"].shape == (8, 32) and ff["w2_q"].shape == (32, 8)
    assert ff["w1a_s"].shape == (1, 32)
    # a no-site tree walks to None
    assert prequantize_weights({"dense": {"kernel": f32(8, 16)}}) is None


# ------------------------------------------------------------ module level


def test_conv3x3_module_consumes_qw_overlay(monkeypatch):
    """With the overlay bound, Conv3x3 must NOT re-quantize inline — and
    must produce the bitwise-identical result."""
    monkeypatch.setattr(conv_mod, "int8_enabled", lambda shape, dtype: True)
    m = conv_mod.Conv3x3(24)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16), jnp.float32)
    params = m.init(jax.random.PRNGKey(3), x)["params"]

    inline = m.apply({"params": params}, x)

    calls = {"n": 0}
    real = quant.quantize_conv_kernel

    def spy(kernel):
        calls["n"] += 1
        return real(kernel)

    monkeypatch.setattr(quant, "quantize_conv_kernel", spy)
    qw = prequantize_weights(params)
    assert set(qw.keys()) == {"kq", "sw"}
    calls["n"] = 0  # prequantize itself uses the real math via `real`
    overlaid = m.apply({"params": params, "qw": qw}, x)
    assert calls["n"] == 0, "overlay bound but module re-quantized inline"
    assert np.array_equal(np.asarray(inline), np.asarray(overlaid))

    # and the inline path DOES go through the quantizer (spy still armed)
    m.apply({"params": params}, x)
    assert calls["n"] == 1


def test_feedforward_module_consumes_qw_overlay(monkeypatch):
    """FeedForward passes the overlay into geglu_ff (trace-level check —
    the int8 Pallas kernel itself is covered in interpret mode above)."""
    from sd_tpu.ops.attention import FeedForward

    monkeypatch.setattr(ff_mod, "ff_supported", lambda x, inner: True)
    monkeypatch.setattr(quant, "int8_bucket_enabled",
                        lambda bucket, dtype: bucket == "ff")
    # keep the per-site inner gate out of the way
    monkeypatch.setattr(ff_mod, "_INT8_MIN_INNER", 0)

    m = FeedForward(dim=256, glu=True, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 256, 256), jnp.bfloat16)
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    calls = {"n": 0}
    real = ff_mod._quantize_cols

    def spy(w):
        calls["n"] += 1
        return real(w)

    monkeypatch.setattr(ff_mod, "_quantize_cols", spy)

    jax.eval_shape(lambda p: m.apply({"params": p}, x), params)
    assert calls["n"] == 3, "inline int8 FF should quantize w1a/w1g/w2"

    calls["n"] = 0
    qw = prequantize_weights(params, compute_dtype=jnp.bfloat16)
    assert qw is not None and "w2_q" in qw
    jax.eval_shape(lambda p, q: m.apply({"params": p, "qw": q}, x),
                   params, qw)
    assert calls["n"] == 0, "overlay bound but FF re-quantized inline"


# ------------------------------------------------------------- LDM threading


def _tiny_ldm():
    from sd_tpu.utils.config import build_latent_diffusion
    from sd_tpu.utils.testing import tiny_sd_model_config

    return build_latent_diffusion(tiny_sd_model_config(),
                                  rng=jax.random.PRNGKey(0))


def test_ldm_qw_threading():
    ldm = _tiny_ldm()
    qw = prequantize_weights(ldm.unet_params)
    assert qw is not None
    ldm2 = dataclasses.replace(ldm, unet_qw=qw)

    # runtime_params carries the overlay with its param bundle
    p = ldm2.runtime_params("unet_params")
    assert set(p.keys()) == {"unet_params", "unet_qw"}
    assert "unet_qw" not in ldm.runtime_params("unet_params")
    # bind_params round-trips it
    bound = ldm2.bind_params(p)
    assert bound.unet_qw is qw

    # apply with the overlay collection bound must run (int8 is off on CPU,
    # so outputs are the plain bf16/fp32 path — and identical)
    x = jnp.zeros((1, 8, 8, ldm.unet.config.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    c = jnp.zeros((1, 8, ldm.unet.config.context_dim), jnp.float32)
    a = ldm.apply_model(x, t, c)
    b = ldm2.apply_model(x, t, c)
    assert np.array_equal(np.asarray(a), np.asarray(b))

    # EMA/weight hot-swap must DROP the stale overlay
    swapped = ldm2.with_params(ldm2.unet_params)
    assert swapped.unet_qw is None


def test_pipeline_build_populates_qw(monkeypatch):
    monkeypatch.setattr(quant, "wq_hoist_wanted", lambda: True)
    from sd_tpu.pipelines.build import build_txt2img_pipeline

    pipe, hw = build_txt2img_pipeline(tiny=True, safety=False,
                                      watermark=False)
    assert pipe.ldm.unet_qw is not None
    assert pipe.ldm.first_stage_qw is not None
    # end-to-end: the qw collection must flow through the cached sampler
    # program (encode -> scan -> decode) without breaking flax apply
    imgs = pipe(["a test"], jax.random.PRNGKey(0), height=64, width=64,
                steps=2, sampler="plms")
    assert imgs.shape == (1, 64, 64, 3) and imgs.dtype == np.uint8
