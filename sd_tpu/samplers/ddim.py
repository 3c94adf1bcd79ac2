"""DDIM sampler as a single jitted ``lax.scan`` state machine.

Behavioral equivalent of the reference ``DDIMSampler``
(``ldm/models/diffusion/ddim.py``): deterministic/η-stochastic sampling over
a subsetted grid with CFG, mask-blend inpainting, temperature, optional
x0-quantization; plus ``stochastic_encode``/``decode`` = img2img (SDEdit,
``ddim.py:206-241``).

TPU design (SURVEY.md §7.0): the whole S-step reverse loop is ONE compiled
XLA program — per-step tables ride the scan as xs (no dynamic gathers), PRNG
keys are explicit, nothing touches the host between steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DiffusionSchedule, extract
from sd_tpu.samplers.common import (
    DDIMTables,
    EpsModel,
    build_ddim_tables,
    build_original_step_tables,
    apply_noise_dropout,
    ddim_step_from_eps,
    make_guided_eps,
    mask_blend,
)

__all__ = ["ddim_sample", "ddim_stochastic_encode", "ddim_decode"]


def ddim_sample(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond,
    rng,
    num_steps: int = 50,
    eta: float = 0.0,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    quantize_x0: Optional[Callable] = None,
    score_corrector: Optional[Callable] = None,
    noise_dropout: float = 0.0,
    timestep_method: str = "uniform",
    log_every_t: int = 0,
    t_start_index: Optional[int] = None,
    use_original_steps: bool = False,
):
    """Run the reverse DDIM loop. Ref: ``ddim.py:113-204``.

    Args mirror ``DDIMSampler.sample`` (``ddim.py:56-111``); ``t_start_index``
    truncates the grid (used by ``ddim_decode`` for img2img).
    ``use_original_steps=True`` runs the FULL DDPM grid with the
    ``alphas_cumprod`` / ``ddim_sigmas_for_original_num_steps`` tables
    (``ddim.py:165-181``) — the reference's ``ddim_use_original_steps`` path.

    Returns (x_0_sample, intermediates) where intermediates is a dict of
    stacked pred_x0 / x_inter arrays when ``log_every_t`` > 0, else None.
    """
    if use_original_steps:
        tables = build_original_step_tables(schedule, eta=eta)
    else:
        tables = build_ddim_tables(schedule, num_steps, eta=eta, method=timestep_method)
    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale, score_corrector)

    total = len(tables.timesteps) if t_start_index is None else int(t_start_index)
    # reversed per-step tables as scan xs
    idx = np.arange(total)[::-1]
    xs = dict(
        t=jnp.asarray(tables.timesteps[idx].astype(np.int32)),
        a_t=jnp.asarray(tables.alphas[idx]),
        a_prev=jnp.asarray(tables.alphas_prev[idx]),
        sqrt1m=jnp.asarray(tables.sqrt_one_minus_alphas[idx]),
        sigma=jnp.asarray(tables.sigmas[idx]),
    )

    rng, rng_init = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = img.shape[0]

    def body(carry, step):
        x, key = carry
        key, k_noise, k_mask, k_drop = jax.random.split(key, 4)
        t_vec = jnp.full((b,), step["t"], jnp.int32)
        if mask is not None:
            assert x0 is not None, "mask requires x0"
            x = mask_blend(schedule, x, x0, mask, t_vec, k_mask)
        e_t = eps(x, t_vec)
        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        if noise_dropout > 0.0:  # ref ddim.py:201-202
            noise = apply_noise_dropout(noise, k_drop, noise_dropout)
        x_prev, pred_x0 = ddim_step_from_eps(
            x, e_t, step["a_t"], step["a_prev"], step["sqrt1m"], step["sigma"],
            noise, temperature, quantize_x0,
        )
        out = (x_prev, pred_x0) if log_every_t else None
        return (x_prev, key), out

    (img, _), inter = jax.lax.scan(body, (img, rng), xs)
    if mask is not None:
        # final blend so the known region is exactly x0
        img = x0 * mask + (1.0 - mask) * img

    intermediates = None
    if log_every_t:
        keep = np.arange(total) % log_every_t == 0
        intermediates = {
            "x_inter": inter[0][jnp.asarray(np.nonzero(keep)[0])],
            "pred_x0": inter[1][jnp.asarray(np.nonzero(keep)[0])],
        }
    return img, intermediates


def ddim_stochastic_encode(
    schedule: DiffusionSchedule,
    x0,
    t_enc_index: int,
    rng,
    num_steps: int = 50,
    noise: Optional[jnp.ndarray] = None,
    use_original_steps: bool = False,
):
    """Diffuse x0 forward to DDIM grid position ``t_enc_index``.

    Ref: ``ddim.py:206-220`` — gathers sqrt(ᾱ) on the DDIM sub-grid.
    """
    if use_original_steps:
        sqrt_a = schedule.sqrt_alphas_cumprod
        sqrt_1ma = schedule.sqrt_one_minus_alphas_cumprod
    else:
        tables = build_ddim_tables(schedule, num_steps)
        sqrt_a = np.sqrt(tables.alphas)
        sqrt_1ma = tables.sqrt_one_minus_alphas
    if noise is None:
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
    t = jnp.asarray(t_enc_index)
    return (
        extract(sqrt_a, t, x0.ndim) * x0 + extract(sqrt_1ma, t, x0.ndim) * noise
    )


def ddim_decode(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    x_latent,
    cond,
    t_start_index: int,
    num_steps: int = 50,
    uncond=None,
    guidance_scale: float = 1.0,
    rng=None,
    use_original_steps: bool = False,
):
    """Partial reverse loop from grid position ``t_start_index`` (img2img
    denoising half of SDEdit). Ref: ``ddim.py:222-241``; with
    ``use_original_steps`` the grid is the full DDPM range truncated at
    ``t_start`` exactly as ``ddim.py:226-227``."""
    if rng is None:
        rng = jax.random.PRNGKey(0)  # eta=0 path consumes no randomness
    img, _ = ddim_sample(
        model_fn, schedule, x_latent.shape, cond, rng,
        num_steps=num_steps, eta=0.0, uncond=uncond,
        guidance_scale=guidance_scale, x_T=x_latent,
        t_start_index=t_start_index, use_original_steps=use_original_steps,
    )
    return img
