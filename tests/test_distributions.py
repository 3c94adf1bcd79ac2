"""Tests for DiagonalGaussian / normal_kl vs closed forms
(reference: ldm/modules/distributions/distributions.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core import DiagonalGaussian, normal_kl


def make_posterior(rng, shape=(2, 4, 4, 6)):
    k1, k2 = jax.random.split(rng)
    moments = jnp.concatenate(
        [jax.random.normal(k1, shape), jax.random.normal(k2, shape) * 0.1], axis=-1
    )
    return DiagonalGaussian.from_moments(moments)


def test_from_moments_split_and_clamp():
    moments = jnp.concatenate(
        [jnp.ones((1, 2, 2, 3)), jnp.full((1, 2, 2, 3), -100.0)], axis=-1
    )
    p = DiagonalGaussian.from_moments(moments)
    assert p.mean.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(np.asarray(p.logvar), -30.0)  # clamped


def test_sample_statistics(rng):
    mean = jnp.full((1, 1, 1, 1), 3.0)
    logvar = jnp.full((1, 1, 1, 1), np.log(0.25).astype(np.float32))
    p = DiagonalGaussian(mean=mean, logvar=logvar)
    samples = jax.vmap(p.sample)(jax.random.split(rng, 4096))
    arr = np.asarray(samples).ravel()
    assert abs(arr.mean() - 3.0) < 0.05
    assert abs(arr.std() - 0.5) < 0.05


def test_deterministic_mode(rng):
    p = DiagonalGaussian(
        mean=jnp.ones((1, 2, 2, 1)), logvar=jnp.zeros((1, 2, 2, 1)), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(p.sample(rng)), np.asarray(p.mean))
    np.testing.assert_allclose(np.asarray(p.kl()), 0.0)


def test_kl_vs_standard_normal():
    # KL(N(mu, s^2) || N(0,1)) = 0.5*(mu^2 + s^2 - 1 - log s^2), summed
    mean = jnp.full((1, 1, 1, 2), 0.5)
    logvar = jnp.full((1, 1, 1, 2), np.log(4.0).astype(np.float32))
    p = DiagonalGaussian(mean=mean, logvar=logvar)
    expected = 2 * 0.5 * (0.25 + 4.0 - 1.0 - np.log(4.0))
    np.testing.assert_allclose(np.asarray(p.kl()), expected, rtol=1e-5)


def test_kl_between_distributions_zero_when_equal(rng):
    p = make_posterior(rng)
    q = DiagonalGaussian(mean=p.mean, logvar=p.logvar)
    np.testing.assert_allclose(np.asarray(p.kl(q)), 0.0, atol=1e-5)


def test_nll_gaussian_closed_form():
    p = DiagonalGaussian(mean=jnp.zeros((1, 1, 1, 1)), logvar=jnp.zeros((1, 1, 1, 1)))
    x = jnp.full((1, 1, 1, 1), 2.0)
    expected = 0.5 * (np.log(2 * np.pi) + 0.0 + 4.0)
    np.testing.assert_allclose(np.asarray(p.nll(x)), expected, rtol=1e-5)


def test_normal_kl_elementwise():
    kl = normal_kl(
        jnp.array(0.0), jnp.array(0.0), jnp.array(0.0), jnp.array(0.0)
    )
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)
    kl2 = normal_kl(
        jnp.array(1.0), jnp.array(0.0), jnp.array(0.0), jnp.array(0.0)
    )
    np.testing.assert_allclose(np.asarray(kl2), 0.5, rtol=1e-6)


def test_pytree_through_jit(rng):
    p = make_posterior(rng)

    @jax.jit
    def f(post):
        return post.kl()

    out = f(p)
    assert out.shape == (2,)
