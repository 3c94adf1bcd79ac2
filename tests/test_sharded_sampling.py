"""Multi-device sampling on the virtual 8-device CPU mesh: the batch-scaled
serving path (BASELINE config #5 analog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.parallel.mesh import make_mesh
from sd_tpu.parallel.sharded_sampling import sharded_sample
from sd_tpu.samplers import ddim_sample, plms_sample

SCHED = DiffusionSchedule.create(timesteps=100)


def eps_model(x, t, c):
    base = 0.3 * x
    if c is not None:
        base = base + 0.01 * jnp.mean(c, axis=-1)[:, None, None, :1]
    return base


@pytest.mark.parametrize("sampler", [ddim_sample, plms_sample])
def test_sharded_sample_runs_and_is_sharded(sampler):
    mesh = make_mesh(n_data=8, n_model=1)
    cond = jnp.ones((16, 4, 8))
    uncond = jnp.zeros((16, 4, 8))
    out = sharded_sample(
        mesh, sampler, eps_model, SCHED, (16, 8, 8, 4), cond,
        jax.random.PRNGKey(0), uncond=uncond, guidance_scale=3.0, num_steps=4,
    )
    assert out.shape == (16, 8, 8, 4)
    # batch axis sharded over 8 devices
    assert len(out.sharding.device_set) == 8
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_matches_single_device():
    """GSPMD partitioning must not change the math (same key, same cond)."""
    mesh = make_mesh(n_data=8, n_model=1)
    cond = jnp.ones((8, 4, 8))
    key = jax.random.PRNGKey(1)
    sharded = sharded_sample(
        mesh, ddim_sample, eps_model, SCHED, (8, 8, 8, 4), cond, key,
        num_steps=4,
    )
    single, _ = ddim_sample(eps_model, SCHED, (8, 8, 8, 4), cond, key,
                            num_steps=4)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5)


def test_sharded_rejects_indivisible_batch():
    mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(AssertionError):
        sharded_sample(mesh, ddim_sample, eps_model, SCHED, (6, 8, 8, 4),
                       jnp.ones((6, 4, 8)), jax.random.PRNGKey(0), num_steps=2)


def test_tiled_apply_shards_patches_over_mesh():
    """Big-canvas tiling sharded over the mesh (SURVEY.md §5.7): the [B*P]
    patch axis is the multi-chip seam; sharded == unsharded output."""
    from sd_tpu.pipelines.tiled import tiled_apply

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    fn = lambda p: jnp.tanh(p) * 0.5 + p

    @jax.jit
    def run_sharded(x):
        return tiled_apply(fn, x, ks=16, stride=8, mesh=mesh)

    with mesh:
        out_sharded = run_sharded(x)
    out_plain = tiled_apply(fn, x, ks=16, stride=8)
    np.testing.assert_allclose(np.asarray(out_sharded),
                               np.asarray(out_plain), atol=1e-5)


def test_sharded_sample_params_as_args():
    """The params-as-jit-args path (flagship serving: weights must NOT be
    program constants): params replicate over the mesh, model_fn receives
    them as its first argument, and the math matches the closure path."""
    mesh = make_mesh(n_data=8, n_model=1)
    cond = jnp.ones((8, 4, 8))
    key = jax.random.PRNGKey(1)
    w = {"gain": jnp.float32(0.3)}

    def param_model(p, x, t, c):
        base = p["gain"] * x
        if c is not None:
            base = base + 0.01 * jnp.mean(c, axis=-1)[:, None, None, :1]
        return base

    out = sharded_sample(
        mesh, ddim_sample, param_model, SCHED, (8, 8, 8, 4), cond, key,
        num_steps=4, params=w,
    )
    ref = sharded_sample(
        mesh, ddim_sample, eps_model, SCHED, (8, 8, 8, 4), cond, key,
        num_steps=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert len(out.sharding.device_set) == 8
