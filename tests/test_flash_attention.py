"""Pallas flash-attention kernel correctness (interpret mode on CPU) vs the
XLA reference path, across SD's attention shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.ops.attention import _xla_attention
from sd_tpu.ops.pallas.flash_attention import flash_attention, flash_supported


@pytest.mark.parametrize("shape", [
    (1, 256, 2, 40),    # ds=1 level head dim (tiny N for test speed)
    (2, 256, 2, 80),    # ds=2 level head dim
    (1, 256, 4, 160),   # ds=4 level head dim
    (1, 512, 1, 64),    # aligned head dim
])
def test_flash_matches_xla(shape):
    b, n, h, d = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128)
    ref = _xla_attention(q, k, v, d**-0.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_cross_attention_shapes():
    """Nq != Nk (cross-attention-like)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 256, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 128, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 128, 2, 64)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128)
    ref = _xla_attention(q, k, v, 64**-0.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_supported_dispatch_rules():
    q = jnp.zeros((1, 4096, 8, 40))
    k = v = jnp.zeros((1, 4096, 8, 40))
    # CPU backend in tests -> never supported
    assert not flash_supported(q, k, v)
    # masked attention -> never
    assert not flash_supported(q, k, v, mask=jnp.ones((1, 1, 1, 4096), bool))


def test_flash_numerical_stability_large_logits():
    """Exact softmax in VMEM must survive large score magnitudes."""
    q = jnp.full((1, 128, 1, 128), 10.0, jnp.float32)
    k = jnp.full((1, 128, 1, 128), 10.0, jnp.float32)
    v = jnp.ones((1, 128, 1, 128), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
