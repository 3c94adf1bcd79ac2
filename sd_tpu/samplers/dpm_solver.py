"""DPM-Solver++ (multistep, order 2) — the reference's fastest solver.

Behavioral equivalent of the configuration the reference actually ships
(``ldm/models/diffusion/dpm_solver/sampler.py:79-80``): ``DPM_Solver(...,
predict_x0=True)`` + ``sample(..., skip_type="time_uniform",
method="multistep", order=2, lower_order_final=True)``, over a discrete-β
``NoiseScheduleVP`` (``dpm_solver.py:6-174``).

TPU design: the continuous-time grid is STATIC given (schedule, steps), so
every λ/α/σ interpolation (``dpm_solver.py:125-174``) happens once on the
host in float64; the device program is a pure ``lax.scan`` over per-step
coefficient tuples — no `interpolate_fn` searchsorted on device, no host
syncs. Order-1 bootstrap and the (optionally order-1) final step run eagerly
inside the same jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.samplers.common import EpsModel, make_guided_eps, wrap_model_output

__all__ = [
    "dpm_solver_sample",
    "dpm_solver_singlestep_sample",
    "dpm_solver_adaptive_sample",
    "DiscreteNoiseSchedule",
]


@dataclasses.dataclass(frozen=True)
class DiscreteNoiseSchedule:
    """Host-side continuous-time view of a discrete-β schedule.

    Piecewise-linear interpolation of 0.5*log(ᾱ) over t ∈ (0, 1], exactly the
    reference's ``NoiseScheduleVP('discrete')`` (``dpm_solver.py:95-142``).
    """

    t_array: np.ndarray          # [N] in (0, 1]
    log_alpha_array: np.ndarray  # [N]

    @classmethod
    def from_schedule(cls, schedule: DiffusionSchedule) -> "DiscreteNoiseSchedule":
        log_alphas = 0.5 * np.log(schedule.alphas_cumprod.astype(np.float64))
        n = len(log_alphas)
        t_array = np.linspace(0.0, 1.0, n + 1)[1:]
        return cls(t_array=t_array, log_alpha_array=log_alphas)

    @property
    def total_N(self) -> int:
        return len(self.t_array)

    def log_alpha(self, t: np.ndarray) -> np.ndarray:
        return np.interp(t, self.t_array, self.log_alpha_array)

    def sigma(self, t: np.ndarray) -> np.ndarray:
        return np.sqrt(1.0 - np.exp(2.0 * self.log_alpha(t)))

    def lam(self, t: np.ndarray) -> np.ndarray:
        la = self.log_alpha(t)
        return la - 0.5 * np.log(1.0 - np.exp(2.0 * la))

    def model_time(self, t: np.ndarray) -> np.ndarray:
        """Continuous t -> the discrete model's timestep input.

        Ref: ``model_wrapper.get_model_input_time`` (``dpm_solver.py:230-239``):
        ``(t - 1/N) * 1000``.
        """
        return (t - 1.0 / self.total_N) * 1000.0


def dpm_solver_sample(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond,
    rng,
    num_steps: int = 20,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    lower_order_final: bool = True,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    order: int = 2,
    model_type: str = "noise",
):
    """Multistep DPM-Solver++ (orders 1-3) over a uniform time grid.

    ``model_fn`` is the usual eps model; conversion to the data-prediction
    (x0) parameterization happens internally (``predict_x0=True`` mode,
    ``dpm_solver.py:352-380``). ``order=2`` is the configuration the
    reference ships (``dpm_solver/sampler.py:80``); 1 and 3 follow
    ``multistep_dpm_solver_update`` (``dpm_solver.py:885-905``) with the
    lower-order bootstrap/final-step rules of ``sample`` (``:1085-1105``).
    """
    assert order in (1, 2, 3)
    assert num_steps >= order, f"multistep order-{order} needs >= {order} steps"
    # non-eps parameterizations (x_start / v / score) adapt here, before CFG
    # — ref model_wrapper's model_type dispatch (dpm_solver.py:288-308)
    model_fn = wrap_model_output(model_fn, schedule, model_type)
    if order != 2:
        return _dpm_multistep_general(
            model_fn, schedule, shape, cond, rng, num_steps, uncond,
            guidance_scale, x_T, lower_order_final, t_start, t_end, order,
        )
    ns = DiscreteNoiseSchedule.from_schedule(schedule)
    t_T = 1.0 if t_start is None else float(t_start)
    t_0 = 1.0 / ns.total_N if t_end is None else float(t_end)

    # static host-side grid + coefficient tables (float64)
    ts = np.linspace(t_T, t_0, num_steps + 1)
    lam = ns.lam(ts)
    log_alpha = ns.log_alpha(ts)
    alpha = np.exp(log_alpha)
    sigma = ns.sigma(ts)
    h = lam[1:] - lam[:-1]                       # [num_steps]
    model_t = ns.model_time(ts).astype(np.float32)

    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale)

    rng, rng_init = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = x.shape[0]

    def x0_model(x, i):
        """Data prediction: x0 = (x - sigma_t * eps) / alpha_t at grid i."""
        t_vec = jnp.full((b,), model_t[i])
        e = eps(x, t_vec)
        return (x - sigma[i].astype(np.float32) * e) / alpha[i].astype(np.float32)

    def first_update(x, i, m):
        """DPM-Solver++-1 from grid i to i+1. Ref: ``dpm_solver.py:527-533``."""
        phi_1 = np.expm1(-h[i])
        return (
            (sigma[i + 1] / sigma[i]).astype(np.float32) * x
            - (alpha[i + 1] * phi_1).astype(np.float32) * m
        )

    # bootstrap: m0 at t_T, order-1 step to t_1, m1 at t_1
    m_prev1 = x0_model(x, 0)
    x = first_update(x, 0, m_prev1)
    m_prev0 = x0_model(x, 1)

    # middle steps 2..num_steps-1: order-2 update then model eval (lax.scan)
    mids = np.arange(2, num_steps)  # target grid indices
    if len(mids):
        xs = dict(
            sr=jnp.asarray((sigma[mids] / sigma[mids - 1]).astype(np.float32)),
            aphi=jnp.asarray((alpha[mids] * np.expm1(-h[mids - 1])).astype(np.float32)),
            inv_r0=jnp.asarray((h[mids - 2] / h[mids - 1]) ** -1.0, dtype=jnp.float32),
            mt=jnp.asarray(model_t[mids]),
            si=jnp.asarray(sigma[mids].astype(np.float32)),
            ai=jnp.asarray(alpha[mids].astype(np.float32)),
        )

        def body(carry, step):
            x, m0, m1 = carry
            # Ref: multistep_dpm_solver_second_update, predict_x0 +
            # 'dpm_solver' type (dpm_solver.py:784-790)
            d1 = step["inv_r0"] * (m0 - m1)
            x = step["sr"] * x - step["aphi"] * m0 - 0.5 * step["aphi"] * d1
            t_vec = jnp.full((b,), step["mt"])
            e = eps(x, t_vec)
            m_new = (x - step["si"] * e) / step["ai"]
            return (x, m_new, m0), None

        (x, m_prev0, m_prev1), _ = jax.lax.scan(body, (x, m_prev0, m_prev1), xs)

    # final step to t_0 (no model eval after; dpm_solver.py:1104-1105)
    i = num_steps
    final_order = 1 if (lower_order_final and num_steps < 15) else 2
    if final_order == 1:
        x = first_update(x, i - 1, m_prev0)
    else:
        d1 = (h[i - 2] / h[i - 1]) ** -1.0 * (m_prev0 - m_prev1)
        aphi = (alpha[i] * np.expm1(-h[i - 1])).astype(np.float32)
        x = (sigma[i] / sigma[i - 1]).astype(np.float32) * x - aphi * m_prev0 - 0.5 * aphi * d1
    return x


def _dpm_multistep_general(
    model_fn, schedule, shape, cond, rng, num_steps, uncond, guidance_scale,
    x_T, lower_order_final, t_start, t_end, order,
):
    """Orders 1 and 3 (unrolled-in-jit loop; order 2 has the scan fast path).

    Every lambda/sigma/alpha coefficient is static per step index, so each
    update is a tiny fused program around the model call.
    """
    ns = DiscreteNoiseSchedule.from_schedule(schedule)
    t_T = 1.0 if t_start is None else float(t_start)
    t_0 = 1.0 / ns.total_N if t_end is None else float(t_end)

    ts = np.linspace(t_T, t_0, num_steps + 1)
    lam = ns.lam(ts)
    alpha = np.exp(ns.log_alpha(ts))
    sigma = ns.sigma(ts)
    h = lam[1:] - lam[:-1]
    model_t = ns.model_time(ts).astype(np.float32)

    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale)
    rng, rng_init = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = x.shape[0]

    def x0_model(x, i):
        e = eps(x, jnp.full((b,), model_t[i]))
        return (x - sigma[i].astype(np.float32) * e) / alpha[i].astype(np.float32)

    def update(x, ms, i, step_order):
        """Move from grid i-1 to i using the latest models ms=[m0, m1, m2]
        (m0 most recent). Ref: multistep updates, predict_x0 'dpm_solver'."""
        aphi = (alpha[i] * np.expm1(-h[i - 1])).astype(np.float32)
        sr = (sigma[i] / sigma[i - 1]).astype(np.float32)
        if step_order == 1:
            return sr * x - aphi * ms[0]
        if step_order == 2:
            r0 = h[i - 2] / h[i - 1]
            d1 = (1.0 / r0).astype(np.float32) * (ms[0] - ms[1])
            return sr * x - aphi * ms[0] - 0.5 * aphi * d1
        # order 3 (dpm_solver.py:835-849)
        h_1, h_0, hh = h[i - 3], h[i - 2], h[i - 1]
        r0, r1 = h_0 / hh, h_1 / hh
        d1_0 = (1.0 / r0).astype(np.float32) * (ms[0] - ms[1])
        d1_1 = (1.0 / r1).astype(np.float32) * (ms[1] - ms[2])
        d1 = d1_0 + (r0 / (r0 + r1)).astype(np.float32) * (d1_0 - d1_1)
        d2 = (1.0 / (r0 + r1)).astype(np.float32) * (d1_0 - d1_1)
        c1 = (alpha[i] * (np.expm1(-hh) / hh + 1.0)).astype(np.float32)
        c2 = (alpha[i] * ((np.expm1(-hh) + hh) / hh**2 - 0.5)).astype(np.float32)
        return sr * x - aphi * ms[0] + c1 * d1 - c2 * d2

    ms = [x0_model(x, 0)]
    # lower-order bootstrap (dpm_solver.py:1089-1093)
    for i in range(1, order):
        x = update(x, ms[::-1], i, step_order=i)
        ms.append(x0_model(x, i))
    # main loop (dpm_solver.py:1094-1105)
    for step in range(order, num_steps + 1):
        if lower_order_final and num_steps < 15:
            step_order = min(order, num_steps + 1 - step)
        else:
            step_order = order
        x = update(x, ms[::-1][:3], step, step_order)
        ms = ms[1:] if len(ms) >= order else ms
        if step < num_steps:
            ms.append(x0_model(x, step))
    return x


def dpm_solver_adaptive_sample(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond,
    rng,
    order: int = 2,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    h_init: float = 0.05,
    atol: float = 0.0078,
    rtol: float = 0.05,
    theta: float = 0.9,
    t_err: float = 1e-5,
    max_nfe: int = 1200,
    model_type: str = "noise",
):
    """Adaptive step-size DPM-Solver++ (``method="adaptive"`` of the
    reference's ``sample``, ``dpm_solver/dpm_solver.py:909-965,1106``).

    Step-size control is data-dependent, so this is a device-side
    ``lax.while_loop`` whose body runs the paired lower/higher singlestep
    updates (order 2: solver-1 vs solver-2 sharing the s-eval; order 3:
    solver-2 vs solver-3 sharing the s and s1 evals) and accepts/rescales
    exactly as ``dpm_solver_adaptive`` — including the E-norm
    ``max_b rms((x_hi - x_lo)/delta)`` and the ``theta * h * E^(-1/order)``
    update clipped at ``lambda_0 - lambda_s``. The noise-schedule
    interpolations (``marginal_lambda``/``inverse_lambda``) run on device via
    ``jnp.interp`` over the same host tables the fixed-grid solvers use.
    ``max_nfe`` bounds the loop (the reference can spin forever; XLA while
    loops cannot be unbounded in good conscience).

    Only the shipped ``predict_x0=True`` + ``solver_type='dpm_solver'``
    parameterization is implemented, matching ``sampler.py:79-80``.
    """
    assert order in (2, 3)
    model_fn = wrap_model_output(model_fn, schedule, model_type)
    ns = DiscreteNoiseSchedule.from_schedule(schedule)
    t_T = 1.0 if t_start is None else float(t_start)
    t_0 = 1.0 / ns.total_N if t_end is None else float(t_end)

    t_arr = jnp.asarray(ns.t_array, jnp.float32)
    la_arr = jnp.asarray(ns.log_alpha_array, jnp.float32)

    def log_alpha(t):
        return jnp.interp(t, t_arr, la_arr)

    def sigma(t):
        return jnp.sqrt(-jnp.expm1(2.0 * log_alpha(t)))

    def lam(t):
        la = log_alpha(t)
        return la - 0.5 * jnp.log(-jnp.expm1(2.0 * la))

    def inv_lam(lamb):
        la_target = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        return jnp.interp(la_target, la_arr[::-1], t_arr[::-1])

    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale)
    rng, rng_init = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = x.shape[0]

    def model_x0(x, t_cont):
        t_vec = jnp.full((b,), (t_cont - 1.0 / ns.total_N) * 1000.0)
        e = eps(x, t_vec)
        return (x - sigma(t_cont) * e) / jnp.exp(log_alpha(t_cont))

    def solver1(x, s, t, m_s):
        return (sigma(t) / sigma(s)) * x - jnp.exp(log_alpha(t)) * jnp.expm1(
            lam(s) - lam(t)) * m_s

    def solver2(x, s, t, r1, m_s):
        """Singlestep-2 (predict_x0, 'dpm_solver'); returns (x_t, m_s1)."""
        h = lam(t) - lam(s)
        s1 = inv_lam(lam(s) + r1 * h)
        x_s1 = (sigma(s1) / sigma(s)) * x - jnp.exp(log_alpha(s1)) * jnp.expm1(
            -r1 * h) * m_s
        m_s1 = model_x0(x_s1, s1)
        phi_1 = jnp.expm1(-h)
        x_t = ((sigma(t) / sigma(s)) * x
               - jnp.exp(log_alpha(t)) * phi_1 * m_s
               - (0.5 / r1) * jnp.exp(log_alpha(t)) * phi_1 * (m_s1 - m_s))
        return x_t, m_s1, s1

    def solver3(x, s, t, r1, r2, m_s, m_s1, s1):
        """Singlestep-3 reusing m_s, m_s1 (dpm_solver.py:657-712)."""
        h = lam(t) - lam(s)
        s2 = inv_lam(lam(s) + r2 * h)
        phi_12 = jnp.expm1(-r2 * h)
        phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
        x_s2 = ((sigma(s2) / sigma(s)) * x
                - jnp.exp(log_alpha(s2)) * phi_12 * m_s
                + (r2 / r1) * jnp.exp(log_alpha(s2)) * phi_22 * (m_s1 - m_s))
        m_s2 = model_x0(x_s2, s2)
        phi_1 = jnp.expm1(-h)
        phi_2 = phi_1 / h + 1.0
        return ((sigma(t) / sigma(s)) * x
                - jnp.exp(log_alpha(t)) * phi_1 * m_s
                + (1.0 / r2) * jnp.exp(log_alpha(t)) * phi_2 * (m_s2 - m_s))

    lambda_0 = lam(jnp.float32(t_0))

    def cond_fn(carry):
        x, x_prev, s, h, nfe = carry
        return jnp.logical_and(jnp.abs(s - t_0) > t_err, nfe < max_nfe)

    def body_fn(carry):
        x, x_prev, s, h, nfe = carry
        lam_s = lam(s)
        t = inv_lam(lam_s + h)
        m_s = model_x0(x, s)
        if order == 2:
            x_lower = solver1(x, s, t, m_s)
            x_higher, _, _ = solver2(x, s, t, 0.5, m_s)
        else:
            x_lower, m_s1, s1 = solver2(x, s, t, 1.0 / 3.0, m_s)
            x_higher = solver3(x, s, t, 1.0 / 3.0, 2.0 / 3.0, m_s, m_s1, s1)
        delta = jnp.maximum(
            atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev)))
        err2 = ((x_higher - x_lower) / delta) ** 2
        E = jnp.max(jnp.sqrt(jnp.mean(err2.reshape(b, -1), axis=-1)))
        accept = E <= 1.0
        x = jnp.where(accept, x_higher, x)
        s = jnp.where(accept, t, s)
        x_prev = jnp.where(accept, x_lower, x_prev)
        lam_s = lam(s)
        h = jnp.minimum(theta * h * E ** (-1.0 / order), lambda_0 - lam_s)
        return (x, x_prev, s, h, nfe + order)

    init = (x, x, jnp.float32(t_T), jnp.float32(h_init), jnp.int32(0))
    x, _, _, _, nfe = jax.lax.while_loop(cond_fn, body_fn, init)
    return x


def _inverse_lambda(ns: DiscreteNoiseSchedule, lamb: np.ndarray) -> np.ndarray:
    """Continuous t for a target half-logSNR (``dpm_solver.py:158-174``,
    discrete branch: interpolate t as a function of log_alpha)."""
    log_alpha_target = -0.5 * np.logaddexp(0.0, -2.0 * np.asarray(lamb, np.float64))
    # log_alpha_array is decreasing in t -> flip for np.interp
    return np.interp(log_alpha_target, ns.log_alpha_array[::-1],
                     ns.t_array[::-1])


def dpm_solver_singlestep_sample(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond,
    rng,
    num_steps: int = 20,
    order: int = 3,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    model_type: str = "noise",
):
    """Singlestep DPM-Solver++ ("DPM-Solver-fast"): combines orders <= order
    to spend exactly ``num_steps`` model evaluations.

    Ref: ``get_orders_and_timesteps_for_singlestep_solver``
    (``dpm_solver.py:439-505``) for the order schedule and
    ``singlestep_dpm_solver_{second,third}_update`` (``:551-750``,
    predict_x0 + 'dpm_solver' type) for the updates. All intermediate times
    and coefficients are static host-side values.
    """
    assert order in (1, 2, 3)
    model_fn = wrap_model_output(model_fn, schedule, model_type)
    ns = DiscreteNoiseSchedule.from_schedule(schedule)
    t_T = 1.0 if t_start is None else float(t_start)
    t_0 = 1.0 / ns.total_N if t_end is None else float(t_end)

    # order schedule (dpm_solver.py:471-490)
    if order == 3:
        K = num_steps // 3 + 1
        if num_steps % 3 == 0:
            orders = [3] * (K - 2) + [2, 1]
        elif num_steps % 3 == 1:
            orders = [3] * (K - 1) + [1]
        else:
            orders = [3] * (K - 1) + [2]
    elif order == 2:
        K = num_steps // 2 if num_steps % 2 == 0 else num_steps // 2 + 1
        orders = [2] * K if num_steps % 2 == 0 else [2] * (K - 1) + [1]
    else:
        orders = [1] * num_steps
    grid = np.linspace(t_T, t_0, num_steps + 1)
    outer = grid[np.cumsum([0] + orders)]

    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale)
    rng, rng_init = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = x.shape[0]

    def f32(v):
        return np.float32(v)

    def model(x, t_cont):
        t_vec = jnp.full((b,), np.float32(ns.model_time(np.asarray(t_cont))))
        e = eps(x, t_vec)
        return (x - f32(ns.sigma(t_cont)) * e) / f32(np.exp(ns.log_alpha(t_cont)))

    for i, o in enumerate(orders):
        s, t = float(outer[i]), float(outer[i + 1])
        lam_s, lam_t = ns.lam(s), ns.lam(t)
        h = lam_t - lam_s
        sig_s, sig_t = ns.sigma(s), ns.sigma(t)
        alpha_t = np.exp(ns.log_alpha(t))
        m_s = model(x, s)
        if o == 1:
            x = f32(sig_t / sig_s) * x - f32(alpha_t * np.expm1(-h)) * m_s
            continue
        # intermediate time(s) from inner lambda spacing (dpm_solver.py:1116-1120)
        inner = np.linspace(s, t, o + 1)
        lam_inner = ns.lam(inner)
        r1 = float((lam_inner[1] - lam_s) / h)
        s1 = float(_inverse_lambda(ns, lam_s + r1 * h))
        sig_s1 = ns.sigma(s1)
        alpha_s1 = np.exp(ns.log_alpha(s1))
        x_s1 = (f32(sig_s1 / sig_s) * x
                - f32(alpha_s1 * np.expm1(-r1 * h)) * m_s)
        m_s1 = model(x_s1, s1)
        if o == 2:
            # singlestep-2, predict_x0 'dpm_solver' (dpm_solver.py:594-599)
            phi_1 = np.expm1(-h)
            x = (f32(sig_t / sig_s) * x
                 - f32(alpha_t * phi_1) * m_s
                 - f32(0.5 / r1) * f32(alpha_t * phi_1) * (m_s1 - m_s))
            continue
        # order 3 (dpm_solver.py:672-700, 'dpm_solver' type)
        r2 = float((lam_inner[2] - lam_s) / h)
        s2 = float(_inverse_lambda(ns, lam_s + r2 * h))
        sig_s2 = ns.sigma(s2)
        alpha_s2 = np.exp(ns.log_alpha(s2))
        phi_12 = np.expm1(-r2 * h)
        phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_1 = np.expm1(-h)
        phi_2 = phi_1 / h + 1.0
        x_s2 = (f32(sig_s2 / sig_s) * x
                - f32(alpha_s2 * phi_12) * m_s
                + f32(r2 / r1) * f32(alpha_s2 * phi_22) * (m_s1 - m_s))
        m_s2 = model(x_s2, s2)
        x = (f32(sig_t / sig_s) * x
             - f32(alpha_t * phi_1) * m_s
             + f32(1.0 / r2) * f32(alpha_t * phi_2) * (m_s2 - m_s))
    return x
