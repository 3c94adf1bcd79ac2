"""Real-TPU regression tests (opt-in: SD_TPU_RUN_TPU_TESTS=1).

The main suite forces the CPU backend (conftest), where ``flash_supported``
returns False — these tests run the Pallas kernels COMPILED on the chip:

1. forward parity vs XLA attention at every dispatched self-attention site;
2. jax.grad through ``UNetModel(attn_impl="auto")`` at real token counts —
   the r1 VERDICT's confirmed crash (no custom_vjp + auto-dispatch) stays
   fixed on hardware, not just in interpreter mode.

Run: SD_TPU_RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_only.py -q
(~5 min of remote compiles; keep the chip otherwise idle).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("SD_TPU_RUN_TPU_TESTS"),
    reason="real-TPU kernel tests are opt-in (SD_TPU_RUN_TPU_TESTS=1)",
)


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU device")


@pytest.mark.parametrize("shape", [
    (2, 4096, 8, 40),
    (2, 1024, 8, 80),
    (2, 256, 8, 160),
])
def test_flash_forward_parity_on_tpu(shape):
    from sd_tpu.ops.attention import _xla_attention
    from sd_tpu.ops.pallas.flash_attention import flash_attention, flash_supported

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    assert flash_supported(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    ref = jax.jit(lambda q, k, v: _xla_attention(
        q, k, v, shape[-1] ** -0.5, None))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)  # bf16 + exp2-vs-exp softmax


def test_unet_grad_flows_through_auto_attention_on_tpu():
    """The r1 failure mode: TPU training of the flagship config crashed in
    the non-differentiable kernel. One fwd+bwd at N=4096/1024/256 sites."""
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=1,
        channel_mult=[1, 2, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x, t, ctx), jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16
                           if s.dtype == jnp.float32 else s.dtype), shapes,
    )["params"]

    @jax.jit
    def loss_and_grad(p):
        def loss(p):
            return jnp.mean(jnp.square(
                unet.apply({"params": p}, x, t, ctx).astype(jnp.float32)))
        return jax.value_and_grad(loss)(p)

    loss, grads = loss_and_grad(params)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.max(jnp.abs(g.astype(jnp.float32))))
               for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_geglu_ff_parity_on_tpu():
    """Fused GEGLU FF kernel compiled on the chip vs the XLA reference at the
    SD level-0 site shape (C=320, inner=1280)."""
    from sd_tpu.ops.pallas.geglu_ff import _ff_reference, ff_supported, geglu_ff

    rng = np.random.default_rng(0)
    c, inner = 320, 1280
    x = jnp.asarray(rng.standard_normal((2, 4096, c)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((2 * inner,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    assert ff_supported(x, inner)
    out = jax.jit(geglu_ff)(x, w1, b1, w2, b2)
    ref = jax.jit(_ff_reference)(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_winograd_conv_parity_on_tpu():
    """Forced Winograd kernel vs the direct conv ON the chip (dispatch is
    off by default — measured in-context loss — but the kernel must stay
    correct for future revisits)."""
    from sd_tpu.ops.pallas.winograd_conv import _direct_conv, winograd_conv3x3

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 32, 32, 320), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 320, 320), jnp.float32) * 0.02
    got = np.asarray(jax.jit(lambda x: winograd_conv3x3(x, w))(x),
                     np.float32)
    want = np.asarray(_direct_conv(x, w), np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * max(scale, 1.0)
