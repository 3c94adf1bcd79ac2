"""Winograd F(2x2,3x3) conv kernel (sd_tpu/ops/pallas/winograd_conv.py).

Validates (a) the transform math (interpret-mode kernel) against
``lax.conv_general_dilated`` in fp32, (b) bf16 error stays at the same order
as the direct bf16 conv's own error vs fp32 truth, (c) gradients through the
custom_vjp (backward recomputes the direct conv), (d) the dispatch
predicate. Reference behavior: all stride-1 SAME 3x3 convs in
``ldm/modules/diffusionmodules/openaimodel.py:163-275`` / ``model.py:82-141``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.ops.pallas.winograd_conv import (
    _direct_conv,
    weight_transform,
    winograd_conv3x3,
    winograd_supported,
)


def _rand(key, shape, dtype=jnp.float32, scale=1.0):
    return (jax.random.normal(key, shape) * scale).astype(dtype)


@pytest.mark.parametrize("h,w,c,k", [(32, 32, 128, 128), (16, 64, 256, 128)])
def test_matches_direct_conv_fp32(h, w, c, k):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = _rand(kx, (2, h, w, c))
    wgt = _rand(kw, (3, 3, c, k), scale=0.05)
    got = winograd_conv3x3(x, wgt, interpret=True)
    want = _direct_conv(x, wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-4)


def test_bf16_error_comparable_to_direct_bf16():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = _rand(kx, (2, 32, 32, 128))
    wgt = _rand(kw, (3, 3, 128, 128), scale=0.05)
    truth = np.asarray(_direct_conv(x, wgt))
    scale = np.abs(truth).max()
    d_direct = np.abs(np.asarray(
        _direct_conv(x.astype(jnp.bfloat16), wgt), np.float32) - truth).max()
    d_wino = np.abs(np.asarray(
        winograd_conv3x3(x.astype(jnp.bfloat16), wgt, interpret=True),
        np.float32) - truth).max()
    # same order of magnitude as bf16 input rounding (within 4x)
    assert d_wino < 4 * max(d_direct, 1e-3 * scale)


def test_tile_sweep_matches():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = _rand(kx, (1, 32, 32, 128))
    wgt = _rand(kw, (3, 3, 128, 256), scale=0.05)
    want = np.asarray(_direct_conv(x, wgt))
    for trh, tk in [(4, None), (8, 128), (16, 256)]:
        got = winograd_conv3x3(x, wgt, trh=trh, tk=tk, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=1e-3, rtol=1e-4)


def test_weight_transform_shape_and_identity():
    wgt = jnp.zeros((3, 3, 8, 16)).at[1, 1, :, :].set(1.0)  # identity tap
    u = weight_transform(wgt)
    assert u.shape == (16, 8, 16)
    # identity-center kernel => conv output equals input (per channel pair
    # sum); check via the full transform on a small input
    x = _rand(jax.random.PRNGKey(3), (1, 16, 32, 8))
    got = winograd_conv3x3(x, wgt, interpret=True)
    want = jnp.einsum("bhwc,ck->bhwk", x, jnp.ones((8, 16)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_gradients_match_direct_conv():
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = _rand(kx, (1, 16, 32, 128))
    wgt = _rand(kw, (3, 3, 128, 128), scale=0.05)

    def f_wino(x, w):
        return jnp.sum(winograd_conv3x3(x, w, interpret=True) ** 2)

    def f_direct(x, w):
        return jnp.sum(_direct_conv(x, w) ** 2)

    gx1, gw1 = jax.grad(f_wino, (0, 1))(x, wgt)
    gx2, gw2 = jax.grad(f_direct, (0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=5e-3, rtol=1e-3)


def test_conv3x3_module_drop_in():
    """Conv3x3 consumes nn.Conv's params unchanged (checkpoint compat)."""
    import flax.linen as nn

    from sd_tpu.ops.conv import Conv3x3

    x = _rand(jax.random.PRNGKey(5), (2, 32, 32, 128))
    ref = nn.Conv(128, (3, 3), padding=1, name="c")
    params = ref.init(jax.random.PRNGKey(6), x)
    y_ref = ref.apply(params, x)
    y_xla = Conv3x3(128, impl="xla", name="c").apply(params, x)
    y_win = Conv3x3(128, impl="winograd", interpret=True,
                    name="c").apply(params, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_xla))
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_win),
                               atol=1e-4, rtol=1e-4)


def test_supported_predicate(monkeypatch):
    # default: dispatch is OFF (measured in-context loss — see module doc)
    monkeypatch.delenv("SD_TPU_CONV_IMPL", raising=False)
    assert not winograd_supported((16, 64, 64, 320), (3, 3, 320, 320),
                                  jnp.bfloat16)
    # forced on: shape gating applies (and still refuses off-TPU)
    monkeypatch.setenv("SD_TPU_CONV_IMPL", "winograd")
    on_tpu = jax.devices()[0].platform == "tpu"
    ok = winograd_supported((16, 64, 64, 320), (3, 3, 320, 320), jnp.bfloat16)
    assert ok == on_tpu
    # odd spatial, small spatial, fp32, non-3x3, huge-c all refused
    assert not winograd_supported((16, 63, 64, 320), (3, 3, 320, 320),
                                  jnp.bfloat16)
    assert not winograd_supported((16, 8, 8, 1280), (3, 3, 1280, 1280),
                                  jnp.bfloat16)
    assert not winograd_supported((16, 64, 64, 320), (3, 3, 320, 320),
                                  jnp.float32)
    assert not winograd_supported((16, 64, 64, 320), (1, 1, 320, 320),
                                  jnp.bfloat16)
    assert not winograd_supported((16, 32, 32, 1920), (3, 3, 1920, 640),
                                  jnp.bfloat16)
    # h//2 > 16 and not divisible by the trh=8 row tile
    assert not winograd_supported((16, 36, 64, 320), (3, 3, 320, 320),
                                  jnp.bfloat16)
