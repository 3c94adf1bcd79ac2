"""PLMS (pseudo linear multistep) sampler — SD's default solver.

Behavioral equivalent of the reference ``PLMSSampler``
(``ldm/models/diffusion/plms.py``): Adams-Bashforth orders 1-4 with a
pseudo-improved-Euler bootstrap, CFG, mask blending.

TPU design: the bootstrap step (two UNet calls, ``plms.py:219-222``) runs
once eagerly inside jit; the remaining S-1 steps are a ``lax.scan`` whose
carry holds x + a 3-deep eps ring buffer, with the multistep order selected
by ``lax.switch`` on the step index — one compiled program, no host syncs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.samplers.common import (
    EpsModel,
    build_ddim_tables,
    ddim_step_from_eps,
    make_guided_eps,
    mask_blend,
)

__all__ = ["plms_sample"]


def plms_sample(
    model_fn: EpsModel,
    schedule: DiffusionSchedule,
    shape,
    cond,
    rng,
    num_steps: int = 50,
    uncond=None,
    guidance_scale: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,  # accepted for API parity; inert — PLMS
    # always runs sigma==0 so there is no injected noise to drop
    # (ref plms.py:71,241-243: the same arg is dead upstream too)
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    quantize_x0: Optional[Callable] = None,
    score_corrector: Optional[Callable] = None,
    log_every_t: int = 0,
):
    """Run the reverse PLMS loop (eta=0 by construction, ``plms.py:63``)."""
    tables = build_ddim_tables(schedule, num_steps, eta=0.0)
    eps = make_guided_eps(model_fn, cond, uncond, guidance_scale, score_corrector)

    total = len(tables.timesteps)
    idx = np.arange(total)[::-1]  # descending time
    t_seq = tables.timesteps[idx].astype(np.int32)
    # t_next sequence: plms.py:141 — time_range[min(i+1, len-1)]
    t_next_seq = np.concatenate([t_seq[1:], t_seq[-1:]]).astype(np.int32)
    a_seq = tables.alphas[idx]
    ap_seq = tables.alphas_prev[idx]
    s1m_seq = tables.sqrt_one_minus_alphas[idx]

    rng, rng_init = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(rng_init, shape)
    b = img.shape[0]

    def step_x(x, e_prime, i):
        noise = jnp.zeros_like(x)  # sigma==0 for PLMS
        return ddim_step_from_eps(
            x, e_prime, a_seq[i], ap_seq[i], s1m_seq[i], 0.0, noise,
            temperature, quantize_x0,
        )

    def maybe_blend(x, t_scalar, key):
        if mask is None:
            return x
        assert x0 is not None, "mask requires x0"
        t_vec = jnp.full((b,), t_scalar, jnp.int32)
        return mask_blend(schedule, x, x0, mask, t_vec, key)

    # ---- bootstrap (i=0): pseudo improved Euler, plms.py:218-222
    rng, k0 = jax.random.split(rng)
    img = maybe_blend(img, t_seq[0], k0)
    t0 = jnp.full((b,), t_seq[0], jnp.int32)
    e_t = eps(img, t0)
    x_prev_1, _ = step_x(img, e_t, 0)
    e_t_next = eps(x_prev_1, jnp.full((b,), t_next_seq[0], jnp.int32))
    e_prime = (e_t + e_t_next) / 2.0
    img, pred_x0 = step_x(img, e_prime, 0)

    old = jnp.stack([e_t, e_t, e_t])  # ring buffer; slots 1,2 unused until filled
    logs0 = (img, pred_x0)

    if total == 1:
        return img, ({"x_inter": img[None], "pred_x0": pred_x0[None]}
                     if log_every_t else None)

    # ---- steps 1..S-1: Adams-Bashforth of increasing order
    xs = dict(
        i=jnp.arange(1, total),
        t=jnp.asarray(t_seq[1:]),
        a=jnp.asarray(a_seq[1:]),
        ap=jnp.asarray(ap_seq[1:]),
        s1m=jnp.asarray(s1m_seq[1:]),
    )

    def body(carry, step):
        x, old_eps, key = carry
        key, k_mask = jax.random.split(key)
        x = maybe_blend(x, step["t"], k_mask) if mask is not None else x
        t_vec = jnp.full((b,), step["t"], jnp.int32)
        e_t = eps(x, t_vec)

        def order2(_):
            return (3.0 * e_t - old_eps[0]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * old_eps[0] + 5.0 * old_eps[1]) / 12.0

        def order4(_):
            return (
                55.0 * e_t - 59.0 * old_eps[0] + 37.0 * old_eps[1] - 9.0 * old_eps[2]
            ) / 24.0

        e_prime = jax.lax.switch(jnp.minimum(step["i"], 3) - 1,
                                 [order2, order3, order4], None)
        noise = jnp.zeros_like(x)
        x_prev, pred_x0 = ddim_step_from_eps(
            x, e_prime, step["a"], step["ap"], step["s1m"], 0.0, noise,
            temperature, quantize_x0,
        )
        new_old = jnp.stack([e_t, old_eps[0], old_eps[1]])
        out = (x_prev, pred_x0) if log_every_t else None
        return (x_prev, new_old, key), out

    (img, _, _), inter = jax.lax.scan(body, (img, old, rng), xs)
    if mask is not None:
        img = x0 * mask + (1.0 - mask) * img

    intermediates = None
    if log_every_t:
        x_all = jnp.concatenate([logs0[0][None], inter[0]], axis=0)
        p_all = jnp.concatenate([logs0[1][None], inter[1]], axis=0)
        keep = np.nonzero(np.arange(total) % log_every_t == 0)[0]
        intermediates = {"x_inter": x_all[keep], "pred_x0": p_all[keep]}
    return img, intermediates
