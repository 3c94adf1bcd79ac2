"""Training-step tests: loss math vs closed form, EMA semantics, LR schedules
vs the reference implementations, grad-accum equivalence, and the
data-parallel step on the virtual 8-device mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sd_tpu.core.schedules import DiffusionSchedule, q_sample
from sd_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from sd_tpu.training import (
    LDMTrainer,
    ema_init,
    ema_update,
    lambda_linear,
    lambda_warmup_cosine,
    p_losses,
)
from sd_tpu.utils.config import build_latent_diffusion
from sd_tpu.utils.testing import tiny_sd_model_config

SCHED = DiffusionSchedule.create(timesteps=100)


def test_p_losses_perfect_model_zero_loss(rng):
    """A model that returns the exact noise gets ~zero simple loss."""
    x0 = jax.random.normal(rng, (2, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([5, 50])

    def oracle(x_noisy, t, cond):
        return noise

    loss, d = p_losses(oracle, SCHED, x0, None, t, noise)
    assert float(d["loss_simple"]) < 1e-12
    assert float(loss) < 1e-10


def test_p_losses_matches_closed_form(rng):
    x0 = jax.random.normal(rng, (2, 4, 4, 1))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([10, 20])

    def model(x_noisy, tt, cond):
        return jnp.zeros_like(x_noisy)

    loss, d = p_losses(model, SCHED, x0, None, t, noise,
                       original_elbo_weight=0.5)
    expected_simple = np.square(np.asarray(noise)).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(float(d["loss_simple"]), expected_simple.mean(),
                               rtol=1e-5)
    lw = SCHED.lvlb_weights[np.asarray(t)]
    expected_vlb = (lw * expected_simple).mean()
    np.testing.assert_allclose(float(d["loss_vlb"]), expected_vlb, rtol=1e-5)
    np.testing.assert_allclose(
        float(loss), expected_simple.mean() + 0.5 * expected_vlb, rtol=1e-5
    )


def test_ema_warmup_decay():
    params = {"w": jnp.zeros(3)}
    state = ema_init(params, decay=0.9999)
    # after first update decay = min(0.9999, 2/11)
    new_params = {"w": jnp.ones(3)}
    state = ema_update(state, new_params)
    expected = 1.0 - 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(state.shadow["w"]), expected, rtol=1e-6)
    assert int(state.num_updates) == 1


def test_ema_no_warmup():
    state = ema_init({"w": jnp.zeros(3)}, decay=0.5, use_num_updates=False)
    state = ema_update(state, {"w": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(state.shadow["w"]), 0.5)


def test_lr_schedules_match_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from ldm.lr_scheduler import (
        LambdaLinearScheduler,
        LambdaWarmUpCosineScheduler,
    )

    ref = LambdaWarmUpCosineScheduler(10, 0.1, 1.0, 0.0, 100)
    ours = lambda_warmup_cosine(10, 0.1, 1.0, 0.0, 100)
    for n in [0, 5, 10, 50, 100, 200]:
        np.testing.assert_allclose(float(ours(n)), ref(n), rtol=1e-5)

    # SD's config: warm_up 100, cycle 10000000000000 (v1-inference.yaml:20-27)
    ref2 = LambdaLinearScheduler([100], [1e-10], [1.0], [1e-6], [10000])
    ours2 = lambda_linear([100], [1e-10], [1.0], [1e-6], [10000])
    for n in [0, 50, 100, 5000, 9999]:
        np.testing.assert_allclose(float(ours2(n)), ref2(n), rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_trainer():
    ldm = build_latent_diffusion(tiny_sd_model_config(), rng=jax.random.PRNGKey(3))
    trainer = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3))
    return trainer


def make_batch(n=4):
    rng = np.random.default_rng(0)
    return {
        "image": rng.standard_normal((n, 32, 32, 3)).astype(np.float32) * 0.5,
        "caption": rng.integers(0, 64, (n, 8)).astype(np.int32),
    }


def test_train_step_updates_params_and_ema(tiny_trainer):
    state = tiny_trainer.init_state()
    step = jax.jit(tiny_trainer.train_step)
    new_state, aux = step(state, make_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert int(new_state.step) == 1
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0
    assert new_state.ema is not None and int(new_state.ema.num_updates) == 1


def test_train_loss_decreases(tiny_trainer):
    state = tiny_trainer.init_state()
    step = jax.jit(tiny_trainer.train_step)
    batch = make_batch(8)
    losses = []
    for i in range(8):
        state, aux = step(state, batch, jax.random.PRNGKey(42))  # fixed noise
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses


def test_grad_accumulation_equivalence():
    """accum=2 over batch 8 == accum=1 over the same microbatch average,
    given identical per-microbatch rngs (we check optimizer-input grads)."""
    ldm = build_latent_diffusion(tiny_sd_model_config(), rng=jax.random.PRNGKey(3))
    t1 = LDMTrainer(ldm=ldm, optimizer=optax.sgd(1.0), accumulate_grad_batches=2,
                    use_ema=False)
    batch = make_batch(8)
    state = t1.init_state()
    rng = jax.random.PRNGKey(5)
    new_state, _ = jax.jit(t1.train_step)(state, batch, rng)

    # manual: average of per-microbatch grads with the same key split
    keys = jax.random.split(rng, 2)
    micro = jax.tree.map(lambda x: x.reshape((2, 4) + x.shape[1:]), batch)
    g_sum = None
    for i in range(2):
        mb = jax.tree.map(lambda x: x[i], micro)
        g = jax.grad(lambda p: t1.loss_fn(p, mb, keys[i])[0])(state.params)
        g_sum = g if g_sum is None else jax.tree.map(jnp.add, g_sum, g)
    g_avg = jax.tree.map(lambda x: x / 2, g_sum)
    # sgd(1.0): params_new = params - grads
    expected = jax.tree.map(lambda p, g: p - g, state.params, g_avg)
    leaves_a = jax.tree.leaves(new_state.params)
    leaves_b = jax.tree.leaves(expected)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_data_parallel_train_step_on_mesh(tiny_trainer):
    """The DDP equivalent: batch sharded over 8 virtual devices, params
    replicated, gradients reduced by GSPMD."""
    mesh = make_mesh(n_data=8, n_model=1)
    state = tiny_trainer.init_state()
    state = jax.device_put(state, replicated(mesh))
    batch = shard_batch(mesh, make_batch(16))
    with mesh:
        step = jax.jit(tiny_trainer.train_step)
        new_state, aux = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    # params stay replicated (same value on all devices)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_conditional_learning_end_to_end():
    """Cross-attention conditioning learns: train at high noise levels (where
    the condition is the only signal for eps), then the implied x0 must point
    toward each caption's class colors. (Slow-ish: ~2 min on the 1-core CPU.)"""
    import dataclasses

    from sd_tpu.core.schedules import predict_start_from_noise, q_sample
    from sd_tpu.utils.testing import tiny_sd_model_config

    cfg = tiny_sd_model_config()
    p = cfg["params"]
    p.pop("first_stage_config")
    p["scale_factor"] = 1.0
    p["channels"] = 3
    p["image_size"] = 16
    p["unet_config"]["params"].update(in_channels=3, out_channels=3,
                                      image_size=16)
    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(0))

    def batch(rng, n=16):
        cls = rng.integers(1, 3, n)
        imgs = np.full((n, 16, 16, 3), -0.8, np.float32)
        for i, c in enumerate(cls):
            imgs[i, :, :, c - 1] = 0.8
        caps = np.zeros((n, 8), np.int32)
        caps[:, 0] = cls
        return jnp.asarray(imgs), jnp.asarray(caps)

    params = {"unet": ldm.unet_params, "cond": ldm.cond_stage_params}
    tx = optax.adamw(2e-3)
    opt = tx.init(params)

    def loss_fn(params, x0, caps, key):
        k1, k2 = jax.random.split(key)
        cond = ldm.cond_stage_model.apply({"params": params["cond"]}, caps)
        t = jax.random.randint(k1, (x0.shape[0],), 700, 1000)
        noise = jax.random.normal(k2, x0.shape)
        xt = q_sample(ldm.schedule, x0, t, noise)
        l = dataclasses.replace(ldm, unet_params=params["unet"])
        return jnp.mean((l.apply_model(xt, t, cond) - noise) ** 2)

    @jax.jit
    def step(params, opt, x0, caps, key):
        loss, g = jax.value_and_grad(loss_fn)(params, x0, caps, key)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    nprng = np.random.default_rng(0)
    for i in range(400):
        x0, caps = batch(nprng)
        params, opt, loss = step(params, opt, x0, caps, jax.random.PRNGKey(i))
    assert float(loss) < 0.05

    l = dataclasses.replace(ldm, unet_params=params["unet"])

    def cond_of(c):
        caps = np.zeros((4, 8), np.int32)
        caps[:, 0] = c
        return ldm.cond_stage_model.apply({"params": params["cond"]},
                                          jnp.asarray(caps))

    xt = jax.random.normal(jax.random.PRNGKey(123), (4, 16, 16, 3))
    t = jnp.full((4,), 900)
    e1 = l.apply_model(xt, t, cond_of(1))
    e2 = l.apply_model(xt, t, cond_of(2))
    assert float(jnp.abs(e1 - e2).mean()) > 1e-3  # eps depends on cond
    x0_1 = np.asarray(predict_start_from_noise(l.schedule, xt, t, e1)).mean((0, 1, 2))
    x0_2 = np.asarray(predict_start_from_noise(l.schedule, xt, t, e2)).mean((0, 1, 2))
    assert x0_1[0] > x0_1[1], x0_1   # red caption -> red-leaning x0
    assert x0_2[1] > x0_2[0], x0_2   # green caption -> green-leaning x0


def test_trainer_fit_smoke(tmp_path):
    """Drive Trainer.fit end-to-end for a few steps.

    This is the only place the donated jitted step runs in the suite: params
    aliasing the EMA shadow (ema_init returning views) trips XLA's "donate
    the same buffer twice" here, which unit-level train_step tests never see.
    Also covers host-side step tracking and the final checkpoint write.

    Builds its OWN trainer: fit() donates the state, and state.params alias
    the LDM's live param buffers, so fit consumes the model it was built
    from — reusing the module-scoped fixture afterwards would crash.
    """
    from sd_tpu.training.trainer import Trainer

    ldm = build_latent_diffusion(tiny_sd_model_config(), rng=jax.random.PRNGKey(7))
    tiny_trainer = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3))

    class Data:
        def train_dataloader(self):
            def gen():
                while True:
                    yield make_batch()
            return gen()

        def val_dataloader(self):
            return None

    tr = Trainer(trainer_obj=tiny_trainer, ldm=tiny_trainer.ldm,
                 logdir=str(tmp_path), max_steps=3, log_every=2)
    out = tr.fit(tiny_trainer.init_state(), Data())
    assert int(jax.device_get(out.step)) == 3
    # EMA shadow must be real copies that then diverge from the live params
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     out.params, out.ema.shadow)
    assert max(jax.tree.leaves(d)) > 0
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints", "last"))
