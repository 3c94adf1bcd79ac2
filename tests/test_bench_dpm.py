"""bench.py's BENCH_SAMPLER=dpm loop must follow dpm_solver_sample exactly.

The bench re-derives DPM-Solver++ 2M (order=2, lower_order_final — the
reference's fast-path configuration, ``dpm_solver/sampler.py:79-80``) as a
flat per-step coefficient plan (``bench.dpm2m_plan``) driven through one
jitted update+eval step. These tests replay that plan with a toy eps-model
and check the final latent bit-closely matches
``sd_tpu.samplers.dpm_solver.dpm_solver_sample`` — guarding the plan's
bootstrap / order-1 / order-2 / final-order coefficient wiring (an
un-inverted r0 ratio, the bug this test was written against, lands ~1e-2
relative error here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.samplers.common import make_guided_eps
from sd_tpu.samplers.dpm_solver import dpm_solver_sample

SCHED = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
SHAPE = (2, 8, 8, 4)


def toy_model(x, t, c):
    """Deterministic pseudo-UNet: nonlinear in x, t, and the cond scalar."""
    return jnp.tanh(0.3 * x + c) + 0.1 * jnp.cos(
        t[:, None, None, None] / 100.0
    )


def replay_plan(rows, final, eps, x_T):
    """Mirror of bench.main's run_dpm: identity-bootstrap rows + final."""
    b = x_T.shape[0]

    def step(x, m0, m1, sr, aphi, inv_r0, mt, si, ai):
        x = sr * x - aphi * m0 - 0.5 * aphi * inv_r0 * (m0 - m1)
        e = eps(x, jnp.full((b,), mt))
        return x, (x - si * e) / ai, m0

    x = x_T
    m0 = m1 = jnp.zeros_like(x_T)
    for row in rows:
        x, m0, m1 = step(x, m0, m1, *row)
    sr, aphi, inv_r0 = final
    return sr * x - aphi * m0 - 0.5 * aphi * inv_r0 * (m0 - m1)


@pytest.mark.parametrize("steps", [10, 20])  # final order 1 and 2 paths
def test_dpm2m_plan_matches_sampler(steps):
    import bench

    rows, final = bench.dpm2m_plan(SCHED, steps)
    assert len(rows) == steps  # exactly STEPS model evals

    gs = 7.5
    cond = jnp.full((SHAPE[0], 1), 0.4)
    uncond = jnp.full((SHAPE[0], 1), -0.2)

    def model_fn(x, t, c):
        return toy_model(x, t, jnp.mean(c))

    x_T = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    want = dpm_solver_sample(
        model_fn, SCHED, SHAPE, cond=cond, uncond=uncond,
        guidance_scale=gs, rng=jax.random.PRNGKey(0), num_steps=steps,
        x_T=x_T,
    )

    eps = make_guided_eps(model_fn, cond, uncond, gs)
    got = replay_plan(rows, final, eps, x_T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dpm2m_plan_uninverted_r0_would_fail():
    """The ratio really matters: flipping inv_r0 breaks the trajectory."""
    import bench

    steps = 20
    rows, final = bench.dpm2m_plan(SCHED, steps)
    bad_rows = [
        (sr, aphi, np.float32(1.0 / inv_r0) if inv_r0 else inv_r0,
         mt, si, ai)
        for (sr, aphi, inv_r0, mt, si, ai) in rows
    ]
    gs = 7.5
    cond = jnp.full((SHAPE[0], 1), 0.4)
    uncond = jnp.full((SHAPE[0], 1), -0.2)

    def model_fn(x, t, c):
        return toy_model(x, t, jnp.mean(c))

    x_T = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    eps = make_guided_eps(model_fn, cond, uncond, gs)
    good = replay_plan(rows, final, eps, x_T)
    bad = replay_plan(bad_rows, final, eps, x_T)
    assert float(jnp.max(jnp.abs(good - bad))) > 1e-4
