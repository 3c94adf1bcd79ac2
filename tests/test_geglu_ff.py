"""Fused GEGLU feed-forward kernel (sd_tpu/ops/pallas/geglu_ff.py).

Validates (a) the in-kernel erf approximation against lax.erf, (b) kernel
output vs the plain-XLA reference in interpret mode, (c) drop-in parity with
the unfused FeedForward module using the SAME param tree, (d) gradients
through the custom_vjp. Reference behavior: ``ldm/modules/attention.py:37-64``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.ops.attention import FeedForward
from sd_tpu.ops.pallas.geglu_ff import (
    _erf_f32,
    _ff_reference,
    ff_supported,
    geglu_ff,
)


def test_erf_fast_accuracy():
    from sd_tpu.ops.pallas.geglu_ff import _erf_fast_f32

    x = jnp.linspace(-8.0, 8.0, 200001, dtype=jnp.float32)
    got = _erf_fast_f32(x)
    want = jax.lax.erf(x)
    # sub-bf16-ulp: bf16 rounds at 2^-8 relative; 5e-4 absolute on erf is
    # invisible in the kernel's bf16 outputs
    assert float(jnp.max(jnp.abs(got - want))) < 5e-4


def test_erf_approx_accuracy():
    x = jnp.linspace(-10.0, 10.0, 200001, dtype=jnp.float32)
    got = _erf_f32(x)
    want = jax.lax.erf(x)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5
    # exact at the clamp boundary sign
    assert float(_erf_f32(jnp.float32(50.0))) == 1.0
    assert float(_erf_f32(jnp.float32(-50.0))) == -1.0


def _rand_params(key, c, inner, c_out, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w1 = (jax.random.normal(k1, (c, 2 * inner)) * 0.05).astype(dtype)
    b1 = (jax.random.normal(k2, (2 * inner,)) * 0.1).astype(jnp.float32)
    w2 = (jax.random.normal(k3, (inner, c_out)) * 0.05).astype(dtype)
    b2 = (jax.random.normal(k4, (c_out,)) * 0.1).astype(jnp.float32)
    return w1, b1, w2, b2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,inner", [((2, 256, 64), 256), ((512, 320), 1280)])
def test_kernel_matches_reference(dtype, shape, inner):
    key = jax.random.PRNGKey(0)
    c = shape[-1]
    x = (jax.random.normal(key, shape) * 0.5).astype(dtype)
    w1, b1, w2, b2 = _rand_params(jax.random.PRNGKey(1), c, inner, c, dtype)
    got = geglu_ff(x, w1, b1, w2, b2, interpret=True, block_m=128)
    want = _ff_reference(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    assert got.shape == want.shape and got.dtype == want.dtype
    tol = 5e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol,
    )


def test_feedforward_param_tree_drop_in():
    """The fused kernel consumes the UNFUSED module's params unchanged —
    proves checkpoint/port compatibility of the _GEGLUParams shells."""
    dim = 64
    ff = FeedForward(dim, glu=True, dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(0), (4, 128, dim)) * 0.5
         ).astype(jnp.bfloat16)
    params = ff.init(jax.random.PRNGKey(1), x)["params"]
    # CPU runs the unfused path
    want = ff.apply({"params": params}, x)
    got = geglu_ff(
        x,
        params["proj_in"]["proj"]["kernel"].astype(jnp.bfloat16),
        params["proj_in"]["proj"]["bias"],
        params["proj_out"]["kernel"].astype(jnp.bfloat16),
        params["proj_out"]["bias"],
        interpret=True, block_m=128,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_grads_flow_and_match_reference():
    c, inner = 64, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (256, c), jnp.float32) * 0.5
    w1, b1, w2, b2 = _rand_params(jax.random.PRNGKey(1), c, inner, c, jnp.float32)

    def loss_fused(x, w1, w2):
        return jnp.sum(jnp.square(
            geglu_ff(x, w1, b1, w2, b2, interpret=True, block_m=128)))

    def loss_ref(x, w1, w2):
        return jnp.sum(jnp.square(
            _ff_reference(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_ff_supported_gates():
    x_small = jnp.zeros((2, 64, 320), jnp.bfloat16)   # m=128 too small
    assert not ff_supported(x_small, 1280)
    x_f32 = jnp.zeros((16, 4096, 320), jnp.float32)
    assert not ff_supported(x_f32, 1280)               # dtype gate
    # (platform gate makes everything False on CPU — asserted implicitly by
    # the drop-in test exercising the unfused path)


def test_int8_kernel_matches_reference_within_quant_noise():
    """W8A8 kernel (r5): per-row activation + per-column weight symmetric
    int8 — relative error must stay in quantization-noise territory."""
    c, inner = 320, 1280
    x = (jax.random.normal(jax.random.PRNGKey(0), (512, c)) * 0.5
         ).astype(jnp.bfloat16)
    w1, b1, w2, b2 = _rand_params(jax.random.PRNGKey(1), c, inner, c,
                                  jnp.bfloat16)
    want = _ff_reference(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    got = geglu_ff(x, w1, b1, w2, b2, interpret=True, block_m=128, int8=True)
    assert got.shape == want.shape and got.dtype == want.dtype
    rel = (np.linalg.norm(np.asarray(got, np.float32)
                          - np.asarray(want, np.float32))
           / np.linalg.norm(np.asarray(want, np.float32)))
    assert rel < 0.03, rel


def test_int8_ff_env_dispatch(monkeypatch):
    """SD_TPU_INT8=ff routes geglu_ff to the W8A8 kernel (backend-gated),
    but ONLY at the sites where int8 measured faster (inner >= 2560 — the
    c320/inner=1280 site was a wash at best, bench_attn ff r5)."""
    import sd_tpu.ops.quant as quant

    calls = {}
    import sd_tpu.ops.pallas.geglu_ff as mod
    orig = mod._geglu_ff_int8

    def spy(*a, **k):
        calls["int8"] = calls.get("int8", 0) + 1
        return orig(*a, **k)

    monkeypatch.setattr(mod, "_geglu_ff_int8", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SD_TPU_INT8", "ff")
    c, inner = 64, 2560
    x = (jax.random.normal(jax.random.PRNGKey(0), (256, c)) * 0.5
         ).astype(jnp.bfloat16)
    w1, b1, w2, b2 = _rand_params(jax.random.PRNGKey(1), c, inner, c,
                                  jnp.bfloat16)
    geglu_ff(x, w1, b1, w2, b2, interpret=True, block_m=128)
    assert calls.get("int8") == 1
    # below the measured-win threshold: stays on the bf16 kernel
    w1s, b1s, w2s, b2s = _rand_params(jax.random.PRNGKey(2), c, 128, c,
                                      jnp.bfloat16)
    geglu_ff(x, w1s, b1s, w2s, b2s, interpret=True, block_m=128)
    assert calls.get("int8") == 1
