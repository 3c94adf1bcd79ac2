"""Shared sampler machinery.

The reference wires classifier-free guidance by doubling the batch inside
every sampler step (``ddim.py:171-178``, ``plms.py:178-186``,
``dpm_solver/dpm_solver.py:299-343``). Here that logic exists once:
:func:`make_guided_eps` returns an eps-model closure with CFG folded into a
single 2B-batch UNet call, usable by every solver. Samplers are pure
functions over (params-closed) model fns — device placement, precision and
sharding are runtime policy (SURVEY.md §7.0), never baked in (fixing the
reference's ``.cuda()`` buffer pins at ``ddim.py:19-23``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import (
    DiffusionSchedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

# eps_model(x, t_vec, cond) -> eps ; cond is any pytree (context tensor, or
# dict of conditioning lists for concat/hybrid modes)
EpsModel = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


def apply_noise_dropout(noise: jnp.ndarray, key, p: float) -> jnp.ndarray:
    """Dropout on the injected sampler noise. Ref: ``ddim.py:201-202`` /
    ``ddpm.py:1097-1098``: ``torch.nn.functional.dropout(noise, p)`` — zero
    each element w.p. ``p``, scale survivors by ``1/(1-p)``. ``p`` is static;
    callers skip the call entirely when ``p == 0``."""
    keep = jax.random.bernoulli(key, 1.0 - p, noise.shape)
    return jnp.where(keep, noise / (1.0 - p), 0.0).astype(noise.dtype)


def wrap_model_output(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    model_type: str = "noise",
) -> EpsModel:
    """Adapt a non-eps model parameterization to the eps interface.

    Every sampler here consumes eps-models; networks trained to predict
    ``x_start`` (data prediction), ``v`` (SD 2.x v-prediction) or ``score``
    plug in through this wrapper. Ref: ``model_wrapper.noise_pred_fn``
    (``dpm_solver/dpm_solver.py:288-308``):

    - x_start: ``eps = (x - α_t·out) / σ_t``
    - v:       ``eps = α_t·out + σ_t·x``
    - score:   ``eps = -σ_t·out``  (branch present in the reference;
      excluded by its final assert at ``dpm_solver.py:346`` — kept here)

    where ``α_t = sqrt(ᾱ_t)``, ``σ_t = sqrt(1-ᾱ_t)``. The model-input time
    ``t`` may be fractional (DPM-Solver's continuous grid maps to
    ``model_time == timestep index`` exactly at grid points); ``log ᾱ`` is
    interpolated piecewise-linearly over the index axis on device — the
    same interpolant as the reference's ``NoiseScheduleVP('discrete')``
    (``dpm_solver.py:95-142``) under its affine time map. At the integer
    times DDIM/PLMS pass, this reduces to an exact table gather, so the
    wrapper composes with every sampler in this package.

    Conversion runs BEFORE CFG combination (wrap, then
    :func:`make_guided_eps`) — the reference's order. All three maps are
    affine in ``out``, so this composition is also exactly equivalent to
    converting after CFG.
    """
    if model_type == "noise":
        return model_fn
    if model_type not in ("x_start", "v", "score"):
        raise ValueError(
            f"model_type must be noise|x_start|v|score, got {model_type!r}")

    log_ab = jnp.asarray(
        0.5 * np.log(schedule.alphas_cumprod.astype(np.float64)), jnp.float32)
    idx = jnp.arange(log_ab.shape[0], dtype=jnp.float32)

    def eps_model(x, t, cond=None):
        out = model_fn(x, t, cond)
        la = jnp.interp(jnp.asarray(t, jnp.float32), idx, log_ab)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
        alpha = jnp.exp(la).reshape(bshape)
        sigma = jnp.sqrt(-jnp.expm1(2.0 * la)).reshape(bshape)
        xf = x.astype(jnp.float32)
        of = out.astype(jnp.float32)
        if model_type == "x_start":
            e = (xf - alpha * of) / sigma
        elif model_type == "v":
            e = alpha * of + sigma * xf
        else:  # score
            e = -sigma * of
        return e.astype(out.dtype)

    return eps_model


def _tree_concat(a, b):
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def make_guided_eps(
    model_fn: EpsModel,
    cond,
    uncond=None,
    guidance_scale: float = 1.0,
    score_corrector: Optional[Callable] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Fold conditioning + CFG into ``eps(x, t)``.

    With guidance: one UNet call on the doubled batch
    ``eps = eps_uncond + scale * (eps_cond - eps_uncond)`` — exactly
    ``plms.py:182-186``.
    """
    use_cfg = uncond is not None and guidance_scale != 1.0

    def eps(x, t):
        if use_cfg:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            c_in = _tree_concat(uncond, cond)
            out = model_fn(x_in, t_in, c_in)
            e_uncond, e_cond = jnp.split(out, 2, axis=0)
            e = e_uncond + guidance_scale * (e_cond - e_uncond)
        else:
            e = model_fn(x, t, cond)
        if score_corrector is not None:
            e = score_corrector(e, x, t, cond)
        return e

    return eps


class DDIMTables(NamedTuple):
    """Per-step solver tables over the subsetted grid (all shape [S])."""

    timesteps: np.ndarray      # ascending DDPM t indices, +1-shifted
    alphas: np.ndarray
    alphas_prev: np.ndarray
    sqrt_one_minus_alphas: np.ndarray
    sigmas: np.ndarray


def build_ddim_tables(
    schedule: DiffusionSchedule,
    num_steps: int,
    eta: float = 0.0,
    method: str = "uniform",
) -> DDIMTables:
    """DDIM schedule tables. Ref: ``ddim.py:25-55`` (make_schedule)."""
    ts = make_ddim_timesteps(method, num_steps, schedule.num_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        schedule.alphas_cumprod.astype(np.float64), ts, eta
    )
    return DDIMTables(
        timesteps=ts,
        alphas=alphas.astype(np.float32),
        alphas_prev=alphas_prev.astype(np.float32),
        sqrt_one_minus_alphas=np.sqrt(1.0 - alphas).astype(np.float32),
        sigmas=sigmas.astype(np.float32),
    )


def build_original_step_tables(
    schedule: DiffusionSchedule, eta: float = 0.0
) -> DDIMTables:
    """DDIM tables over the FULL 1000-step DDPM grid — the
    ``use_original_steps=True`` path of ``p_sample_ddim``
    (``ddim.py:165-181``; sigma table ``ddim_sigmas_for_original_num_steps``
    from ``ddim.py:52-55``). Timesteps are the raw range (no +1 shift)."""
    ac = schedule.alphas_cumprod.astype(np.float64)
    ac_prev = schedule.alphas_cumprod_prev.astype(np.float64)
    sigmas = eta * np.sqrt((1 - ac_prev) / (1 - ac) * (1 - ac / ac_prev))
    return DDIMTables(
        timesteps=np.arange(schedule.num_timesteps),
        alphas=ac.astype(np.float32),
        alphas_prev=ac_prev.astype(np.float32),
        sqrt_one_minus_alphas=schedule.sqrt_one_minus_alphas_cumprod,
        sigmas=sigmas.astype(np.float32),
    )


def ddim_step_from_eps(x, e_t, a_t, a_prev, sqrt_one_minus_at, sigma_t,
                       noise, temperature: float = 1.0,
                       quantize_x0: Optional[Callable] = None):
    """The DDIM x_{t-1} update given eps. Ref: ``ddim.py:194-204``.

    Shared verbatim by DDIM and PLMS (which applies it to the multistep
    eps'). All per-step scalars broadcast over the batch.
    """
    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    if quantize_x0 is not None:
        pred_x0 = quantize_x0(pred_x0)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise * temperature
    return x_prev, pred_x0


def mask_blend(schedule: DiffusionSchedule, img, x0, mask, t, rng):
    """Training-free inpainting: re-noise the known region to level t and
    blend. Ref: ``ddim.py:144-147`` / ``ddpm.py:1203-1205``."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    from sd_tpu.core.schedules import q_sample

    img_orig = q_sample(schedule, x0, t, noise)
    return img_orig * mask + (1.0 - mask) * img


def split_rng_scan(rng, n):
    """[n, 2] stacked keys for scan xs."""
    return jax.random.split(rng, n)
