"""Ancestral DDPM sampling + progressive denoising.

Behavioral equivalent of the in-model sampling loops of the reference
(``ldm/models/diffusion/ddpm.py``): ``p_mean_variance`` (``:1047``),
``p_sample`` (``:1078``), ``p_sample_loop`` (``:1165``), ``sample``
(``:1216``) and ``progressive_denoising`` (``:1109``) — the full-T reverse
chain with optional x0 clipping, x0 quantization, CFG, temperature, and
mask-blend inpainting.

One ``lax.scan`` over all T steps; the t==0 no-noise special case is the
reference's nonzero_mask (``ddpm.py:1091``), here a per-step multiplier.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import (
    DiffusionSchedule,
    predict_start_from_noise,
    q_posterior,
)
from sd_tpu.samplers.common import (EpsModel, apply_noise_dropout,
                                    make_guided_eps, mask_blend)

__all__ = ["p_sample_loop", "progressive_denoising"]


def p_sample_loop(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond=None,
    rng=None,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    quantize_x0: Optional[Callable] = None,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    timesteps: Optional[int] = None,
    parameterization: str = "eps",
    log_every_t: int = 0,
):
    """Full ancestral reverse chain x_T -> x_0. Ref: ``ddpm.py:1165-1214``."""
    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale)
    total = int(timesteps if timesteps is not None else schedule.num_timesteps)

    rng, rng_init = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = img.shape[0]

    t_seq = np.arange(total)[::-1].astype(np.int32)

    def body(carry, t_scalar):
        x, key = carry
        key, k_noise, k_mask, k_drop = jax.random.split(key, 4)
        t_vec = jnp.full((b,), t_scalar, jnp.int32)
        if mask is not None:
            assert x0 is not None
            x = mask_blend(schedule, x, x0, mask, t_vec, k_mask)

        model_out = eps(x, t_vec)
        if parameterization == "eps":
            x_recon = predict_start_from_noise(schedule, x, t_vec, model_out)
        else:  # x0 parameterization (ddpm.py:1056-1059)
            x_recon = model_out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        if quantize_x0 is not None:
            x_recon = quantize_x0(x_recon)

        mean, _, log_var = q_posterior(schedule, x_recon, x, t_vec)
        noise = jax.random.normal(k_noise, x.shape, x.dtype) * temperature
        if noise_dropout > 0.0:  # ref ddpm.py:1097-1098
            noise = apply_noise_dropout(noise, k_drop, noise_dropout)
        nonzero = (t_scalar > 0).astype(x.dtype)  # no noise at t == 0
        x_prev = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        out = (x_prev, x_recon) if log_every_t else None
        return (x_prev, key), out

    (img, _), inter = jax.lax.scan(body, (img, rng), jnp.asarray(t_seq))
    if mask is not None:
        img = x0 * mask + (1.0 - mask) * img

    intermediates = None
    if log_every_t:
        keep = np.nonzero(np.arange(total) % log_every_t == 0)[0]
        intermediates = {"x_inter": inter[0][keep], "pred_x0": inter[1][keep]}
    return img, intermediates


def progressive_denoising(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond=None,
    rng=None,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    timesteps: Optional[int] = None,
    log_every_t: int = 50,
):
    """Reverse chain that records the x0-prediction trajectory — the
    "denoise row" visualization. Ref: ``ddpm.py:1109-1163``."""
    img, inter = p_sample_loop(
        model_fn, schedule, shape, cond=cond, rng=rng, uncond=uncond,
        guidance_scale=guidance_scale, x_T=x_T, clip_denoised=clip_denoised,
        temperature=temperature, noise_dropout=noise_dropout,
        mask=mask, x0=x0, timesteps=timesteps,
        log_every_t=log_every_t,
    )
    return img, (inter["pred_x0"] if inter else None)
