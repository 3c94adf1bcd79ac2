"""Diffusion schedule math — host-side numpy tables + device-side gather helpers.

Semantics match the reference framework's schedule layer
(``ldm/modules/diffusionmodules/util.py:21-75`` for beta schedules and DDIM
tables; ``ldm/models/diffusion/ddpm.py:117-168`` for the registered buffers).

Design notes (TPU-first):
- All tables are computed once on the host in float64 numpy and stored as
  float32 numpy arrays inside an immutable :class:`DiffusionSchedule`. When a
  jitted function closes over them, XLA embeds them as constants — no buffers,
  no device pins (fixing the reference's ``.cuda()`` anti-pattern at
  ``ddim.py:19-23``).
- ``extract`` (the reference's ``extract_into_tensor``, ``util.py:96``) is a
  gather that XLA lowers to a cheap dynamic-slice; inside a ``lax.scan``
  sampler loop, ``t`` is a traced scalar and the gather is free.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "betas_for_alpha_bar",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "DiffusionSchedule",
    "extract",
    "timestep_embedding",
    "q_sample",
    "predict_start_from_noise",
    "predict_eps_from_start",
    "q_posterior",
]


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table (float64 numpy). Ref: ``util.py:21-44``.

    ``linear`` is the SD schedule: linspace in sqrt-beta space, squared.
    """
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    """Discretize a continuous ᾱ(t) into betas. Ref: ``util.py:77-93``."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def make_ddim_timesteps(
    ddim_discr_method: str,
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
) -> np.ndarray:
    """Subset of DDPM timesteps for DDIM-style solvers. Ref: ``util.py:46-60``.

    Returns timesteps shifted by +1 (so the final step scales all the way to
    the data distribution), exactly as the reference does.
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{ddim_discr_method}"'
        )
    # The reference indexes alphas_cumprod[t+1] and crashes when
    # num_ddim_timesteps doesn't divide the DDPM grid (t+1 == T). Clamp the
    # shift to T-1 — identical to the reference for all divisor step counts.
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-step (sigma, alpha, alpha_prev) tables for DDIM. Ref: ``util.py:63-75``."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def _f32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All schedule tables the DDPM registers as buffers (``ddpm.py:117-168``).

    Immutable host arrays; use :meth:`create` to build.
    """

    num_timesteps: int
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    lvlb_weights: np.ndarray
    linear_start: float = 1e-4
    linear_end: float = 2e-2

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: Optional[np.ndarray] = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
    ) -> "DiffusionSchedule":
        if given_betas is not None:
            betas = np.asarray(given_betas, dtype=np.float64)
        else:
            betas = make_beta_schedule(
                beta_schedule, timesteps, linear_start=linear_start,
                linear_end=linear_end, cosine_s=cosine_s,
            )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        (n,) = betas.shape

        # q(x_{t-1} | x_t, x_0) posterior, with the v_posterior interpolation
        # knob (ddpm.py:148-152).
        posterior_variance = (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (
            1.0 - alphas_cumprod
        ) + v_posterior * betas

        if parameterization == "eps":
            # posterior_variance[0] == 0 → inf at t=0; overwritten below, as in
            # the reference (ddpm.py:166).
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif parameterization == "x0":
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        else:
            raise NotImplementedError(f"parameterization {parameterization} not supported")
        lvlb_weights = np.array(lvlb_weights)
        lvlb_weights[0] = lvlb_weights[1]
        assert not np.isnan(lvlb_weights).any()

        return cls(
            num_timesteps=int(n),
            betas=_f32(betas),
            alphas_cumprod=_f32(alphas_cumprod),
            alphas_cumprod_prev=_f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=_f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=_f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=_f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=_f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=_f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=_f32(posterior_variance),
            posterior_log_variance_clipped=_f32(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=_f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=_f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            lvlb_weights=_f32(lvlb_weights),
            linear_start=linear_start,
            linear_end=linear_end,
        )


def extract(table, t, ndim: int):
    """Gather ``table[t]`` and reshape to broadcast against an ndim tensor.

    Equivalent of the reference's ``extract_into_tensor`` (``util.py:96-99``)
    but takes the target rank instead of the full shape (jit-friendlier).
    ``t`` may be a scalar or a [B] vector of timestep indices.
    """
    table = jnp.asarray(table)
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def timestep_embedding(timesteps, dim: int, max_period: int = 10000, repeat_only: bool = False):
    """Sinusoidal timestep embeddings, [N] -> [N, dim]. Ref: ``util.py:151-171``.

    Note the reference's (cos, sin) concatenation order — kept for weight
    parity with released checkpoints.
    """
    timesteps = jnp.asarray(timesteps)
    if repeat_only:
        return jnp.broadcast_to(timesteps[:, None].astype(jnp.float32), (timesteps.shape[0], dim))
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def q_sample(schedule: DiffusionSchedule, x_start, t, noise):
    """Forward diffusion draw x_t ~ q(x_t | x_0). Ref: ``ddpm.py:274-277``."""
    return (
        extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def predict_start_from_noise(schedule: DiffusionSchedule, x_t, t, noise):
    """x0 estimate from eps prediction. Ref: ``ddpm.py:264-268``."""
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_eps_from_start(schedule: DiffusionSchedule, x_t, t, x0):
    """eps implied by an x0 prediction (inverse of the above)."""
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def q_posterior(schedule: DiffusionSchedule, x_start, x_t, t):
    """Gaussian posterior q(x_{t-1} | x_t, x_0). Ref: ``ddpm.py:230-238``.

    Returns (mean, variance, log_variance_clipped).
    """
    ndim = x_t.ndim
    mean = (
        extract(schedule.posterior_mean_coef1, t, ndim) * x_start
        + extract(schedule.posterior_mean_coef2, t, ndim) * x_t
    )
    var = extract(schedule.posterior_variance, t, ndim)
    log_var = extract(schedule.posterior_log_variance_clipped, t, ndim)
    return mean, var, log_var
