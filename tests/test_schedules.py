"""Unit tests for sd_tpu.core.schedules against closed forms and the
reference's numpy/torch math (ldm/modules/diffusionmodules/util.py,
ldm/models/diffusion/ddpm.py:117-168)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.core import (
    DiffusionSchedule,
    extract,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    predict_eps_from_start,
    predict_start_from_noise,
    q_posterior,
    q_sample,
    timestep_embedding,
)


def test_linear_schedule_closed_form():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # linspace in sqrt space, squared
    sqrt_b = np.sqrt(betas)
    diffs = np.diff(sqrt_b)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-8)


def test_cosine_schedule_properties():
    betas = make_beta_schedule("cosine", 100)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # monotone increasing for the cosine schedule
    assert (np.diff(betas) > 0).all()


def test_sqrt_linear_and_sqrt():
    b1 = make_beta_schedule("sqrt_linear", 10, 1e-4, 2e-2)
    np.testing.assert_allclose(b1, np.linspace(1e-4, 2e-2, 10))
    b2 = make_beta_schedule("sqrt", 10, 1e-4, 2e-2)
    np.testing.assert_allclose(b2, np.linspace(1e-4, 2e-2, 10) ** 0.5)


def test_schedule_buffers_identities():
    s = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear")
    alphas = 1.0 - s.betas.astype(np.float64)
    np.testing.assert_allclose(
        s.alphas_cumprod, np.cumprod(alphas), rtol=2e-5
    )
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod**2 + s.sqrt_one_minus_alphas_cumprod**2,
        1.0,
        atol=1e-5,
    )
    # posterior variance identity: beta_t * (1-ā_{t-1}) / (1-ā_t)
    np.testing.assert_allclose(
        s.posterior_variance[1:],
        s.betas[1:] * (1 - s.alphas_cumprod_prev[1:]) / (1 - s.alphas_cumprod[1:]),
        rtol=1e-4,
    )
    # lvlb weights: first element copied from second (ddpm.py:166)
    assert s.lvlb_weights[0] == s.lvlb_weights[1]
    assert not np.isnan(s.lvlb_weights).any()


def test_v_posterior_interpolation():
    s0 = DiffusionSchedule.create(timesteps=100, v_posterior=0.0)
    s1 = DiffusionSchedule.create(timesteps=100, v_posterior=1.0)
    np.testing.assert_allclose(s1.posterior_variance, s1.betas, rtol=1e-6)
    shalf = DiffusionSchedule.create(timesteps=100, v_posterior=0.5)
    np.testing.assert_allclose(
        shalf.posterior_variance,
        0.5 * s0.posterior_variance + 0.5 * s1.posterior_variance,
        rtol=1e-5,
    )


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981
    assert (np.diff(ts) == 20).all()


def test_ddim_timesteps_quad():
    ts = make_ddim_timesteps("quad", 25, 1000)
    assert ts.shape == (25,)
    assert ts[0] == 1
    assert (ts <= 1000).all()


def test_ddim_sampling_parameters_eta():
    s = DiffusionSchedule.create(timesteps=1000)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    sig0, a, ap = make_ddim_sampling_parameters(s.alphas_cumprod, ts, eta=0.0)
    assert (sig0 == 0).all()
    np.testing.assert_allclose(a, s.alphas_cumprod[ts])
    assert ap[0] == s.alphas_cumprod[0]
    np.testing.assert_allclose(ap[1:], s.alphas_cumprod[ts[:-1]])
    sig1, _, _ = make_ddim_sampling_parameters(s.alphas_cumprod, ts, eta=1.0)
    expected = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(sig1, expected, rtol=1e-6)


def test_extract_vector_and_scalar_t():
    table = np.arange(10, dtype=np.float32)
    t = jnp.array([0, 3, 9])
    out = extract(table, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.ravel(out), [0, 3, 9])
    # scalar t broadcasts to rank-ndim ones
    out_s = extract(table, jnp.asarray(5), 4)
    assert out_s.shape == (1, 1, 1, 1) and float(out_s.ravel()[0]) == 5.0


def test_timestep_embedding_closed_form():
    dim = 8
    t = jnp.array([0.0, 1.0, 17.0])
    emb = timestep_embedding(t, dim)
    assert emb.shape == (3, dim)
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-5, atol=1e-6)
    # odd dim pads a zero column
    emb_odd = timestep_embedding(t, 9)
    assert emb_odd.shape == (3, 9)
    np.testing.assert_allclose(np.asarray(emb_odd[:, -1]), 0.0)
    # repeat_only path
    emb_rep = timestep_embedding(jnp.array([2.0, 3.0]), 4, repeat_only=True)
    np.testing.assert_allclose(np.asarray(emb_rep), [[2.0] * 4, [3.0] * 4])


def test_q_sample_and_inverses(rng):
    s = DiffusionSchedule.create(timesteps=1000)
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (2, 4, 4, 3))
    noise = jax.random.normal(k2, (2, 4, 4, 3))
    t = jnp.array([10, 500])
    xt = q_sample(s, x0, t, noise)
    # closed form
    a = s.sqrt_alphas_cumprod[np.asarray(t)].reshape(2, 1, 1, 1)
    b = s.sqrt_one_minus_alphas_cumprod[np.asarray(t)].reshape(2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(a * x0 + b * noise), rtol=1e-5)
    # predict_start_from_noise inverts q_sample
    x0_rec = predict_start_from_noise(s, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    # predict_eps_from_start inverts the x0 prediction
    eps_rec = predict_eps_from_start(s, xt, t, x0_rec)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), rtol=1e-2, atol=1e-3)


def test_q_posterior_terminal_step(rng):
    """At t=0 the posterior mean should be ~x_start (coef1->1, coef2->0... )"""
    s = DiffusionSchedule.create(timesteps=1000)
    x0 = jax.random.normal(rng, (1, 2, 2, 1))
    xt = q_sample(s, x0, jnp.array([0]), jnp.zeros_like(x0))
    mean, var, logv = q_posterior(s, x0, xt, jnp.array([0]))
    assert mean.shape == x0.shape
    # coefficients sum appropriately: mean = c1*x0 + c2*xt, with both
    # positive and c1+c2*sqrt(alpha_bar) ≈ combination reproducing x0 scale
    assert float(var.ravel()[0]) >= 0.0
    assert np.isfinite(float(logv.ravel()[0]))


def test_schedule_jit_closure(rng):
    """Schedule tables must be usable as closed-over constants in jit."""
    s = DiffusionSchedule.create(timesteps=100)

    @jax.jit
    def f(x, t, noise):
        return q_sample(s, x, t, noise)

    x = jnp.ones((2, 2, 2, 1))
    out = f(x, jnp.array([0, 99]), jnp.zeros_like(x))
    np.testing.assert_allclose(
        np.asarray(out[0]).ravel(),
        s.sqrt_alphas_cumprod[0],
        rtol=1e-6,
    )
