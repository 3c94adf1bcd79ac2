"""ZeRO-1 optimizer-state sharding over the data axis (SURVEY.md §2.10) on
the virtual 8-device CPU mesh: moments actually shard, the training step
preserves the placement, and the DP+ZeRO step equals a single-device step."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
    zero_sharding,
    zero_state_sharding,
)
from sd_tpu.training.diffusion_loss import LDMTrainer
from sd_tpu.utils.config import build_latent_diffusion
from sd_tpu.utils.testing import tiny_sd_model_config


@pytest.fixture(scope="module")
def trainer_and_batch():
    ldm = build_latent_diffusion(tiny_sd_model_config(), rng=jax.random.PRNGKey(0))
    trainer = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), use_ema=True)
    batch = {
        "image": np.random.default_rng(0)
        .standard_normal((16, 32, 32, 3)).astype(np.float32),
        "caption": np.zeros((16, 8), np.int32),
    }
    return trainer, batch


def test_zero_sharding_splits_large_leaves():
    mesh = make_mesh(n_data=8, n_model=1)
    tree = {"big": jnp.zeros((16, 4)), "tall": jnp.zeros((3, 32)),
            "small": jnp.zeros((3,)), "scalar": jnp.zeros(())}
    sh = zero_sharding(mesh, tree)
    placed = jax.device_put(tree, sh)
    assert not placed["big"].sharding.is_fully_replicated
    assert placed["big"].addressable_shards[0].data.shape == (2, 4)
    assert not placed["tall"].sharding.is_fully_replicated
    assert placed["tall"].addressable_shards[0].data.shape == (3, 4)
    assert placed["small"].sharding.is_fully_replicated
    assert placed["scalar"].sharding.is_fully_replicated


def test_zero_state_step_matches_single_device(trainer_and_batch):
    trainer, batch = trainer_and_batch
    rng = jax.random.PRNGKey(7)

    mesh = make_mesh(n_data=8, n_model=1)
    state = trainer.init_state()
    state = jax.device_put(state, zero_state_sharding(mesh, state))
    mu_leaves = jax.tree.leaves(state.opt_state)
    assert any(not l.sharding.is_fully_replicated for l in mu_leaves), (
        "no optimizer-state leaf was ZeRO-sharded")
    # the EMA shadow is sharded too
    assert any(not l.sharding.is_fully_replicated
               for l in jax.tree.leaves(state.ema.shadow))

    with mesh:
        state2, aux = jax.jit(trainer.train_step)(
            state, shard_batch(mesh, batch), rng)
    assert np.isfinite(float(aux["loss"]))

    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    ref_state = trainer.init_state()
    ref_state = jax.device_put(ref_state, replicated(mesh1))
    with mesh1:
        ref_state2, _ = jax.jit(trainer.train_step)(
            ref_state, shard_batch(mesh1, batch), rng)

    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        jax.device_get(state2.params), jax.device_get(ref_state2.params))
    assert max(jax.tree.leaves(diffs)) < 5e-5
