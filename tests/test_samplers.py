"""Sampler equation goldens vs the reference DDIM/PLMS/DPM-Solver loops, plus
oracle-model convergence tests for all solvers.

The reference samplers are driven with a fake torch model implementing the
same deterministic eps function as the JAX side, so trajectories must match
exactly (eta=0 paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule, q_sample
from sd_tpu.samplers import (
    ddim_decode,
    ddim_sample,
    ddim_stochastic_encode,
    dpm_solver_sample,
    p_sample_loop,
    plms_sample,
    progressive_denoising,
)
from tests.torch_ref import torch_manual_seed

SCHED = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear",
                                 linear_start=0.00085, linear_end=0.012)
SHAPE = (2, 8, 8, 3)


# ---------------------------------------------------------------- fake model


def jax_eps(x, t, c):
    """Deterministic smooth eps: 0.2*x + 0.1*cos(t/100) + 0.05*c_mean."""
    tterm = 0.1 * jnp.cos(t.astype(jnp.float32) / 100.0)
    cterm = 0.05 * jnp.mean(c, axis=tuple(range(1, c.ndim))) if c is not None else 0.0
    bias = tterm + (cterm if c is not None else 0.0)
    return 0.2 * x + bias.reshape((-1,) + (1,) * (x.ndim - 1))


class TorchFakeLDM:
    """Duck-typed stand-in for the LatentDiffusion the reference samplers wrap."""

    parameterization = "eps"

    def __init__(self):
        import torch

        self.torch = torch
        self.alphas_cumprod = torch.tensor(SCHED.alphas_cumprod)
        self.alphas_cumprod_prev = torch.tensor(SCHED.alphas_cumprod_prev)
        self.sqrt_one_minus_alphas_cumprod = torch.tensor(
            SCHED.sqrt_one_minus_alphas_cumprod
        )
        self.betas = torch.tensor(SCHED.betas)
        self.num_timesteps = SCHED.num_timesteps
        self.device = self.betas.device

    def apply_model(self, x, t, c):
        tterm = 0.1 * self.torch.cos(t.float() / 100.0)
        if c is not None:
            cterm = 0.05 * c.mean(dim=list(range(1, c.dim())))
            tterm = tterm + cterm
        return 0.2 * x + tterm.reshape((-1,) + (1,) * (x.dim() - 1))


def make_ref_ddim():
    from ldm.models.diffusion.ddim import DDIMSampler

    class CPUDDIM(DDIMSampler):
        def register_buffer(self, name, attr):  # drop the .cuda() pin
            setattr(self, name, attr)

    return CPUDDIM(TorchFakeLDM())


def make_ref_plms():
    from ldm.models.diffusion.plms import PLMSSampler

    class CPUPLMS(PLMSSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    return CPUPLMS(TorchFakeLDM())


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


# ---------------------------------------------------------------- DDIM


def test_ddim_parity_eta0():
    torch = torch_manual_seed(50)
    sampler = make_ref_ddim()
    x_T = torch.randn(2, 3, 8, 8)
    ref, _ = sampler.sample(
        S=10, batch_size=2, shape=(3, 8, 8), conditioning=None, eta=0.0,
        x_T=x_T, verbose=False,
    )
    got, _ = ddim_sample(
        jax_eps, SCHED, SHAPE, cond=None, rng=jax.random.PRNGKey(0),
        num_steps=10, eta=0.0,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_ddim_parity_with_cfg():
    torch = torch_manual_seed(51)
    sampler = make_ref_ddim()
    x_T = torch.randn(2, 3, 8, 8)
    c = torch.ones(2, 4) * 2.0
    uc = torch.zeros(2, 4)
    ref, _ = sampler.sample(
        S=8, batch_size=2, shape=(3, 8, 8), conditioning=c, eta=0.0, x_T=x_T,
        unconditional_guidance_scale=5.0, unconditional_conditioning=uc,
        verbose=False,
    )
    got, _ = ddim_sample(
        jax_eps, SCHED, SHAPE, cond=jnp.full((2, 4), 2.0),
        uncond=jnp.zeros((2, 4)), guidance_scale=5.0,
        rng=jax.random.PRNGKey(0), num_steps=8,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_ddim_eta_noise_statistics(rng):
    """eta>0 injects sigma-scaled noise; with temperature=0 it must vanish."""
    x_T = jax.random.normal(rng, SHAPE)
    a, _ = ddim_sample(jax_eps, SCHED, SHAPE, None, jax.random.PRNGKey(1),
                       num_steps=10, eta=1.0, x_T=x_T, temperature=0.0)
    b, _ = ddim_sample(jax_eps, SCHED, SHAPE, None, jax.random.PRNGKey(2),
                       num_steps=10, eta=1.0, x_T=x_T, temperature=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    c, _ = ddim_sample(jax_eps, SCHED, SHAPE, None, jax.random.PRNGKey(1),
                       num_steps=10, eta=1.0, x_T=x_T)
    d, _ = ddim_sample(jax_eps, SCHED, SHAPE, None, jax.random.PRNGKey(2),
                       num_steps=10, eta=1.0, x_T=x_T)
    assert np.abs(np.asarray(c) - np.asarray(d)).max() > 1e-3


def test_ddim_img2img_roundtrip():
    """stochastic_encode to a mid index then decode: parity vs reference."""
    torch = torch_manual_seed(52)
    sampler = make_ref_ddim()
    sampler.make_schedule(20, ddim_eta=0.0, verbose=False)
    x0_t = torch.randn(2, 3, 8, 8)
    noise_t = torch.randn(2, 3, 8, 8)
    t_enc = 12
    z = sampler.stochastic_encode(x0_t, torch.tensor([t_enc, t_enc]), noise=noise_t)
    ref = sampler.decode(z, None, t_enc)

    to_nhwc = lambda t: jnp.asarray(np.transpose(t.numpy(), (0, 2, 3, 1)))
    z_j = ddim_stochastic_encode(SCHED, to_nhwc(x0_t), t_enc,
                                 rng=None, num_steps=20, noise=to_nhwc(noise_t))
    np.testing.assert_allclose(nchw(z_j), z.numpy(), atol=1e-5)
    got = ddim_decode(jax_eps, SCHED, z_j, None, t_enc, num_steps=20)
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_ddim_mask_blend_keeps_known_region(rng):
    x0 = jnp.zeros(SHAPE)
    mask = jnp.zeros(SHAPE).at[:, :4].set(1.0)  # 1 = keep
    out, _ = ddim_sample(jax_eps, SCHED, SHAPE, None, rng, num_steps=10,
                         mask=mask, x0=x0)
    np.testing.assert_allclose(np.asarray(out[:, :4]), 0.0, atol=1e-6)
    assert np.abs(np.asarray(out[:, 4:])).max() > 1e-3


def test_ddim_intermediates_logging(rng):
    out, inter = ddim_sample(jax_eps, SCHED, SHAPE, None, rng, num_steps=10,
                             log_every_t=5)
    assert inter is not None
    assert inter["x_inter"].shape[0] == 2  # steps 0 and 5
    assert inter["pred_x0"].shape[1:] == SHAPE


# ---------------------------------------------------------------- PLMS


@pytest.mark.parametrize("steps", [2, 8])
def test_plms_parity(steps):
    """steps=2 exercises only the bootstrap+order2; steps=8 all orders."""
    torch = torch_manual_seed(53)
    sampler = make_ref_plms()
    x_T = torch.randn(2, 3, 8, 8)
    ref, _ = sampler.sample(
        S=steps, batch_size=2, shape=(3, 8, 8), conditioning=None, eta=0.0,
        x_T=x_T, verbose=False,
    )
    got, _ = plms_sample(
        jax_eps, SCHED, SHAPE, cond=None, rng=jax.random.PRNGKey(0),
        num_steps=steps,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=1e-4)


def test_plms_parity_with_cfg():
    torch = torch_manual_seed(54)
    sampler = make_ref_plms()
    x_T = torch.randn(1, 3, 8, 8)
    c = torch.full((1, 4), 1.5)
    uc = torch.zeros(1, 4)
    ref, _ = sampler.sample(
        S=6, batch_size=1, shape=(3, 8, 8), conditioning=c, eta=0.0, x_T=x_T,
        unconditional_guidance_scale=7.5, unconditional_conditioning=uc,
        verbose=False,
    )
    got, _ = plms_sample(
        jax_eps, SCHED, (1, 8, 8, 3), cond=jnp.full((1, 4), 1.5),
        uncond=jnp.zeros((1, 4)), guidance_scale=7.5,
        rng=jax.random.PRNGKey(0), num_steps=6,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- DPM-Solver


def test_dpm_solver_parity():
    import torch
    import sys

    torch.manual_seed(55)
    from ldm.models.diffusion.dpm_solver.dpm_solver import (
        DPM_Solver,
        NoiseScheduleVP,
        model_wrapper,
    )

    fake = TorchFakeLDM()
    ns = NoiseScheduleVP("discrete", alphas_cumprod=fake.alphas_cumprod)
    wrapped = model_wrapper(
        lambda x, t, c: fake.apply_model(x, t, c), ns, model_type="noise",
        guidance_type="classifier-free", condition=torch.full((2, 4), 1.5),
        unconditional_condition=torch.zeros(2, 4), guidance_scale=3.0,
    )
    solver = DPM_Solver(wrapped, ns, predict_x0=True, thresholding=False)
    x_T = torch.randn(2, 3, 8, 8)
    ref = solver.sample(x_T.clone(), steps=10, skip_type="time_uniform",
                        method="multistep", order=2, lower_order_final=True)

    got = dpm_solver_sample(
        jax_eps, SCHED, SHAPE, cond=jnp.full((2, 4), 1.5),
        uncond=jnp.zeros((2, 4)), guidance_scale=3.0,
        rng=jax.random.PRNGKey(0), num_steps=10,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=1e-4)


# ------------------------------------------------------- oracle convergence


def oracle_eps(x0_true):
    """eps implied by knowing the clean image: inverts q_sample exactly."""

    def eps(x, t, c):
        t = t.astype(jnp.int32)
        a = jnp.asarray(SCHED.sqrt_alphas_cumprod)[t].reshape(-1, 1, 1, 1)
        s = jnp.asarray(SCHED.sqrt_one_minus_alphas_cumprod)[t].reshape(-1, 1, 1, 1)
        return (x - a * x0_true) / s

    return eps


@pytest.mark.parametrize("solver", ["ddim", "plms", "ancestral"])
def test_solvers_converge_to_oracle_target(solver, rng):
    x0_true = jnp.asarray(
        np.tile(np.linspace(-0.5, 0.5, 8, dtype=np.float32).reshape(1, 8, 1, 1),
                (2, 1, 8, 3))
    )
    eps = oracle_eps(x0_true)
    if solver == "ddim":
        out, _ = ddim_sample(eps, SCHED, SHAPE, None, rng, num_steps=50)
    elif solver == "plms":
        out, _ = plms_sample(eps, SCHED, SHAPE, None, rng, num_steps=50)
    else:
        out, _ = p_sample_loop(eps, SCHED, SHAPE, None, rng, clip_denoised=True)
    err = np.abs(np.asarray(out) - np.asarray(x0_true)).mean()
    assert err < 0.05, f"{solver}: mean err {err}"


def test_progressive_denoising_trajectory(rng):
    x0_true = jnp.zeros(SHAPE)
    img, x0_traj = progressive_denoising(
        oracle_eps(x0_true), SCHED, SHAPE, rng=rng, timesteps=200, log_every_t=50
    )
    assert x0_traj.shape[0] == 4
    # x0 predictions should be (near) target all along for the oracle
    np.testing.assert_allclose(np.asarray(x0_traj[-1]), 0.0, atol=0.05)


def test_samplers_are_jittable(rng):
    """The whole DDIM loop must compile as one program (static steps)."""
    fn = jax.jit(
        lambda key, xT: ddim_sample(jax_eps, SCHED, SHAPE, None, key,
                                    num_steps=5, x_T=xT)[0]
    )
    xT = jax.random.normal(rng, SHAPE)
    out = fn(jax.random.PRNGKey(0), xT)
    assert out.shape == SHAPE


# order-3 with steps<15 crashes the REFERENCE itself (multistep_dpm_solver_update
# passes the full 3-model history into the 2-model lower-order update —
# upstream bug); our implementation slices correctly, so parity is only
# checkable at steps>=15 where no downgrade happens.
@pytest.mark.parametrize("order,steps", [(1, 10), (3, 16), (3, 20)])
def test_dpm_solver_multistep_orders_parity(order, steps):
    import torch

    torch.manual_seed(56 + order)
    from ldm.models.diffusion.dpm_solver.dpm_solver import (
        DPM_Solver,
        NoiseScheduleVP,
        model_wrapper,
    )

    fake = TorchFakeLDM()
    ns = NoiseScheduleVP("discrete", alphas_cumprod=fake.alphas_cumprod)
    wrapped = model_wrapper(
        lambda x, t: fake.apply_model(x, t, None), ns, model_type="noise",
        guidance_type="uncond",
    )
    solver = DPM_Solver(wrapped, ns, predict_x0=True, thresholding=False)
    x_T = torch.randn(1, 3, 8, 8)
    ref = solver.sample(x_T.clone(), steps=steps, skip_type="time_uniform",
                        method="multistep", order=order, lower_order_final=True)

    got = dpm_solver_sample(
        jax_eps, SCHED, (1, 8, 8, 3), cond=None, rng=jax.random.PRNGKey(0),
        num_steps=steps, order=order,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=3e-4, rtol=1e-3)


def test_dpm_solver_order3_low_steps_works(rng):
    """steps<15 with order 3 (the case that crashes the reference) runs and
    denoises under our implementation."""
    x0_true = jnp.zeros(SHAPE)

    def eps(x, t, c):
        tt = t.astype(jnp.int32)
        a = jnp.asarray(SCHED.sqrt_alphas_cumprod)[tt].reshape(-1, 1, 1, 1)
        s = jnp.asarray(SCHED.sqrt_one_minus_alphas_cumprod)[tt].reshape(-1, 1, 1, 1)
        return (x - a * x0_true) / s

    out = dpm_solver_sample(eps, SCHED, SHAPE, None, rng, num_steps=10, order=3)
    assert np.abs(np.asarray(out)).mean() < 0.1


@pytest.mark.parametrize("order,steps", [(1, 8), (2, 8), (2, 9), (3, 9), (3, 10)])
def test_dpm_solver_singlestep_parity(order, steps):
    """The reference's singlestep dispatcher crashes on time_uniform
    (torch.cumsum without dim, dpm_solver.py:495 — upstream bug), so drive
    its singlestep_dpm_solver_update functions directly over the same outer
    grid our sampler builds."""
    import torch

    from sd_tpu.samplers.dpm_solver import dpm_solver_singlestep_sample

    torch.manual_seed(60 + order)
    from ldm.models.diffusion.dpm_solver.dpm_solver import (
        DPM_Solver,
        NoiseScheduleVP,
        model_wrapper,
    )

    fake = TorchFakeLDM()
    ns = NoiseScheduleVP("discrete", alphas_cumprod=fake.alphas_cumprod)
    wrapped = model_wrapper(lambda x, t: fake.apply_model(x, t, None), ns,
                            model_type="noise", guidance_type="uncond")
    solver = DPM_Solver(wrapped, ns, predict_x0=True, thresholding=False)

    # order schedule (mirrors get_orders_and_timesteps_for_singlestep_solver
    # with the cumsum fixed)
    if order == 3:
        K = steps // 3 + 1
        orders = ([3] * (K - 2) + [2, 1] if steps % 3 == 0 else
                  [3] * (K - 1) + [1] if steps % 3 == 1 else [3] * (K - 1) + [2])
    elif order == 2:
        orders = ([2] * (steps // 2) if steps % 2 == 0
                  else [2] * (steps // 2) + [1])
    else:
        orders = [1] * steps
    t_T, t_0 = 1.0, 1.0 / 1000
    grid = torch.linspace(t_T, t_0, steps + 1)
    outer = grid[torch.cumsum(torch.tensor([0] + orders), dim=0)]

    x_T = torch.randn(1, 3, 8, 8)
    x = x_T.clone()
    with torch.no_grad():
        for i, o in enumerate(orders):
            s_in = outer[i].expand(1)
            t_in = outer[i + 1].expand(1)
            lam = ns.marginal_lambda(grid)
            # inner lambda spacing for r1/r2 (dpm_solver.py:1116-1120)
            inner = torch.linspace(outer[i], outer[i + 1], o + 1)
            lam_inner = ns.marginal_lambda(inner)
            h = lam_inner[-1] - lam_inner[0]
            r1 = None if o <= 1 else float((lam_inner[1] - lam_inner[0]) / h)
            r2 = None if o <= 2 else float((lam_inner[2] - lam_inner[0]) / h)
            x = solver.singlestep_dpm_solver_update(x, s_in, t_in, o,
                                                    solver_type="dpm_solver",
                                                    r1=r1, r2=r2)
    ref = x

    got = dpm_solver_singlestep_sample(
        jax_eps, SCHED, (1, 8, 8, 3), cond=None, rng=jax.random.PRNGKey(0),
        num_steps=steps, order=order,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=5e-4, rtol=1e-3)


def test_ddim_use_original_steps_parity():
    """use_original_steps=True runs the FULL DDPM grid with the
    alphas_cumprod / ddim_sigmas_for_original_num_steps tables
    (ddim.py:165-181, 52-55)."""
    torch = torch_manual_seed(57)
    sampler = make_ref_ddim()
    sampler.make_schedule(ddim_num_steps=10, ddim_eta=0.0, verbose=False)
    # Upstream bug: p_sample_ddim reads the sigma table from self.MODEL
    # (ddim.py:187) but make_schedule registers it on the SAMPLER (ddim.py:54)
    # — the reference's own use_original_steps=True path crashes. Graft the
    # buffer where the read expects it to drive the intended behavior.
    sampler.model.ddim_sigmas_for_original_num_steps = (
        sampler.ddim_sigmas_for_original_num_steps)
    x_T = torch.randn(2, 3, 8, 8)
    with torch.no_grad():
        ref, _ = sampler.ddim_sampling(
            None, (2, 3, 8, 8), x_T=x_T.clone(), ddim_use_original_steps=True,
            log_every_t=10**9,
        )
    got, _ = ddim_sample(
        jax_eps, SCHED, SHAPE, cond=None, rng=jax.random.PRNGKey(0),
        num_steps=10, eta=0.0, use_original_steps=True,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=1e-3)


def test_ddim_decode_use_original_steps_parity():
    """img2img decode over the truncated FULL grid (ddim.py:222-241)."""
    torch = torch_manual_seed(58)
    sampler = make_ref_ddim()
    sampler.make_schedule(ddim_num_steps=10, ddim_eta=0.0, verbose=False)
    sampler.model.ddim_sigmas_for_original_num_steps = (
        sampler.ddim_sigmas_for_original_num_steps)  # upstream bug, see above
    x_lat = torch.randn(2, 3, 8, 8)
    with torch.no_grad():
        ref = sampler.decode(x_lat.clone(), None, t_start=300,
                             use_original_steps=True)
    got = ddim_decode(
        jax_eps, SCHED, jnp.asarray(np.transpose(x_lat.numpy(), (0, 2, 3, 1))),
        None, t_start_index=300, num_steps=10, use_original_steps=True,
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("order", [2, 3])
def test_dpm_solver_adaptive_parity(order):
    """method='adaptive' (dpm_solver.py:909-965): the lax.while_loop solver
    must track the reference's accept/reject + step-size trajectory."""
    import torch

    torch.manual_seed(60 + order)
    from ldm.models.diffusion.dpm_solver.dpm_solver import (
        DPM_Solver,
        NoiseScheduleVP,
        model_wrapper,
    )

    fake = TorchFakeLDM()
    ns = NoiseScheduleVP("discrete", alphas_cumprod=fake.alphas_cumprod)
    wrapped = model_wrapper(
        lambda x, t: fake.apply_model(x, t, None), ns, model_type="noise",
        guidance_type="uncond",
    )
    solver = DPM_Solver(wrapped, ns, predict_x0=True, thresholding=False)
    x_T = torch.randn(1, 3, 8, 8)
    with torch.no_grad():
        ref = solver.sample(x_T.clone(), method="adaptive", order=order,
                            atol=0.0078, rtol=0.05)

    from sd_tpu.samplers.dpm_solver import dpm_solver_adaptive_sample

    got = dpm_solver_adaptive_sample(
        jax_eps, SCHED, (1, 8, 8, 3), cond=None, rng=jax.random.PRNGKey(0),
        order=order,
        x_T=jnp.asarray(np.transpose(x_T.numpy(), (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-3, rtol=1e-2)


# ------------------------------------------- model_type parameterizations
# wrap_model_output adapts x_start / v / score networks to the eps interface
# (ref model_wrapper.noise_pred_fn, dpm_solver/dpm_solver.py:288-308).


def _torch_generic_out(x, t):
    """A parameterization-agnostic fake network output (torch)."""
    import torch

    return 0.3 * x + (0.1 * torch.sin(t.float() / 50.0)).reshape(
        (-1,) + (1,) * (x.dim() - 1))


def _jax_generic_out(x, t, c=None):
    """Same fake network output (jax)."""
    return 0.3 * x + (0.1 * jnp.sin(t.astype(jnp.float32) / 50.0)).reshape(
        (-1,) + (1,) * (x.ndim - 1))


@pytest.mark.parametrize("model_type", ["x_start", "v"])
def test_wrap_model_output_parity_vs_reference(model_type):
    """eps from wrap_model_output == reference noise_pred_fn, on- and off-grid."""
    import torch

    from ldm.models.diffusion.dpm_solver.dpm_solver import (
        NoiseScheduleVP,
        model_wrapper,
    )
    from sd_tpu.samplers import wrap_model_output

    torch.manual_seed(60)
    ns = NoiseScheduleVP("discrete",
                         alphas_cumprod=torch.tensor(SCHED.alphas_cumprod))
    ref_fn = model_wrapper(_torch_generic_out, ns, model_type=model_type,
                           guidance_type="uncond")
    got_fn = wrap_model_output(_jax_generic_out, SCHED, model_type)

    n = SCHED.num_timesteps
    x = torch.randn(3, 3, 8, 8)
    # on-grid (model_time == integer index) and off-grid continuous times
    for t_cont in [1.0, 0.7234, 500.5 / n + 1.0 / n, 1.0 / n]:
        t = torch.full((3,), t_cont, dtype=torch.float64)
        ref = ref_fn(x, t)
        t_model = (t_cont - 1.0 / n) * 1000.0
        got = got_fn(jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
                     jnp.full((3,), t_model, jnp.float32), None)
        np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=2e-4)


def test_wrap_model_output_score_and_integer_gather():
    """score branch: eps == -sigma_t*out; integer t reduces to exact gather."""
    from sd_tpu.samplers import wrap_model_output

    rng = np.random.default_rng(61)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    ts = np.array([0, 1, 317, 999])
    for ti in ts:
        sig = np.sqrt(1.0 - SCHED.alphas_cumprod[ti])
        eps_true = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        score_model = lambda xx, tt, cc: -eps_true / np.float32(sig)
        got = wrap_model_output(score_model, SCHED, "score")(
            x, jnp.full((2,), float(ti), jnp.float32), None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(eps_true),
                                   atol=1e-5, rtol=1e-5)


def test_wrap_model_output_rejects_unknown():
    from sd_tpu.samplers import wrap_model_output

    with pytest.raises(ValueError):
        wrap_model_output(_jax_generic_out, SCHED, "epsilon")


def test_dpm_solver_v_param_trajectory_matches_eps():
    """Sampling a v-parameterized network via model_type='v' reproduces the
    eps-model trajectory exactly (the two parameterizations describe the
    same model)."""
    log_ab = jnp.asarray(0.5 * np.log(SCHED.alphas_cumprod), jnp.float32)
    idx = jnp.arange(log_ab.shape[0], dtype=jnp.float32)

    def v_model(x, t, c):
        la = jnp.interp(t.astype(jnp.float32), idx, log_ab)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
        alpha = jnp.exp(la).reshape(bshape)
        sigma = jnp.sqrt(-jnp.expm1(2.0 * la)).reshape(bshape)
        return (jax_eps(x, t, c) - sigma * x) / alpha

    kw = dict(cond=jnp.full((2, 4), 1.5), uncond=jnp.zeros((2, 4)),
              guidance_scale=3.0, rng=jax.random.PRNGKey(7), num_steps=10)
    want = dpm_solver_sample(jax_eps, SCHED, SHAPE, **kw)
    got = dpm_solver_sample(v_model, SCHED, SHAPE, model_type="v", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_wrap_model_output_cfg_composition_matches_reference():
    """wrap-then-CFG (ours) == convert-inside-CFG (reference order): the
    conversions are affine in the network output, so the compositions agree.
    Ref: model_wrapper guidance_type='classifier-free' (dpm_solver.py:336-343)."""
    import torch

    from ldm.models.diffusion.dpm_solver.dpm_solver import (
        NoiseScheduleVP,
        model_wrapper,
    )
    from sd_tpu.samplers import make_guided_eps, wrap_model_output

    torch.manual_seed(62)
    n = SCHED.num_timesteps
    ns = NoiseScheduleVP("discrete",
                         alphas_cumprod=torch.tensor(SCHED.alphas_cumprod))

    def torch_cond_out(x, t, c):
        return _torch_generic_out(x, t) + 0.05 * c.mean(
            dim=list(range(1, c.dim()))).reshape((-1,) + (1,) * (x.dim() - 1))

    def jax_cond_out(x, t, c):
        return _jax_generic_out(x, t) + 0.05 * jnp.mean(
            c, axis=tuple(range(1, c.ndim))).reshape((-1,) + (1,) * (x.ndim - 1))

    cond_t = torch.full((2, 4), 1.5)
    uncond_t = torch.zeros(2, 4)
    ref_fn = model_wrapper(torch_cond_out, ns, model_type="v",
                           guidance_type="classifier-free",
                           condition=cond_t, unconditional_condition=uncond_t,
                           guidance_scale=3.0)
    got_fn = make_guided_eps(wrap_model_output(jax_cond_out, SCHED, "v"),
                             jnp.full((2, 4), 1.5), jnp.zeros((2, 4)), 3.0)

    x = torch.randn(2, 3, 8, 8)
    for t_cont in [1.0, 0.4321]:
        t = torch.full((2,), t_cont, dtype=torch.float64)
        ref = ref_fn(x, t)
        t_model = (t_cont - 1.0 / n) * 1000.0
        got = got_fn(jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
                     jnp.full((2,), t_model, jnp.float32))
        np.testing.assert_allclose(nchw(got), ref.numpy(), atol=2e-4, rtol=2e-4)


def test_noise_dropout():
    """apply_noise_dropout == torch.nn.functional.dropout semantics
    (ddim.py:201-202): each element zeroed w.p. p, survivors scaled by
    1/(1-p). Threaded through the eta>0 DDIM path and the ancestral chain."""
    from sd_tpu.samplers.common import apply_noise_dropout

    key = jax.random.PRNGKey(9)
    noise = jnp.asarray(np.random.default_rng(9).normal(
        size=(4, 16, 16, 3)).astype(np.float32))
    p = 0.4
    out = np.asarray(apply_noise_dropout(noise, key, p))
    zero = out == 0.0
    assert abs(zero.mean() - p) < 0.03
    np.testing.assert_allclose(out[~zero], np.asarray(noise)[~zero] / (1 - p),
                               rtol=1e-6)

    # eta>0 DDIM: dropout changes the trajectory; p=0 path is unchanged
    kw = dict(cond=None, rng=jax.random.PRNGKey(3), num_steps=8, eta=1.0,
              x_T=jnp.zeros(SHAPE))
    base = ddim_sample(jax_eps, SCHED, SHAPE, **kw)[0]
    same = ddim_sample(jax_eps, SCHED, SHAPE, noise_dropout=0.0, **kw)[0]
    diff = ddim_sample(jax_eps, SCHED, SHAPE, noise_dropout=0.5, **kw)[0]
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    assert float(jnp.max(jnp.abs(diff - base))) > 1e-3

    # ancestral chain consumes it too
    a0 = p_sample_loop(jax_eps, SCHED, SHAPE, rng=jax.random.PRNGKey(3),
                       timesteps=20)[0]
    a1 = p_sample_loop(jax_eps, SCHED, SHAPE, rng=jax.random.PRNGKey(3),
                       timesteps=20, noise_dropout=0.5)[0]
    assert float(jnp.max(jnp.abs(a1 - a0))) > 1e-3
