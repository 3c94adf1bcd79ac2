"""LR multiplier schedules (use with base_lr 1.0 contract).

Rebuild of ``ldm/lr_scheduler.py``: warmup+cosine (``:4``), multi-cycle
cosine (``:36``), multi-cycle linear (``:81`` — the SD scheduler,
``v1-inference.yaml:20-27``). Implemented as pure jnp functions usable inside
optax (``optax.scale_by_schedule``) — jit-safe, no Python-side state.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "lambda_warmup_cosine",
    "lambda_warmup_cosine2",
    "lambda_linear",
]


def lambda_warmup_cosine(warm_up_steps, lr_min, lr_max, lr_start, max_decay_steps):
    """Warmup then cosine decay. Ref: ``lr_scheduler.py:4-33``."""

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum((n - warm_up_steps) / (max_decay_steps - warm_up_steps), 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def _cycle_select(n, cum_cycles):
    """Index of the cycle containing step n (find_in_interval, ``:53-58``)."""
    return jnp.sum(n > jnp.asarray(cum_cycles[1:-1]))


def _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, tail_fn):
    warm_up_steps = np.asarray(warm_up_steps, np.float32)
    f_min = np.asarray(f_min, np.float32)
    f_max = np.asarray(f_max, np.float32)
    f_start = np.asarray(f_start, np.float32)
    cycle_lengths = np.asarray(cycle_lengths, np.float32)
    cum = np.cumsum(np.concatenate([[0.0], cycle_lengths]))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        c = _cycle_select(step, cum)
        n = step - jnp.asarray(cum[:-1])[c]
        wu, fmin, fmax, fst, cl = (
            jnp.asarray(warm_up_steps)[c], jnp.asarray(f_min)[c],
            jnp.asarray(f_max)[c], jnp.asarray(f_start)[c],
            jnp.asarray(cycle_lengths)[c],
        )
        warm = (fmax - fst) / wu * n + fst
        return jnp.where(n < wu, warm, tail_fn(n, wu, fmin, fmax, cl))

    return schedule


def lambda_warmup_cosine2(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """Multi-cycle warmup+cosine. Ref: ``lr_scheduler.py:36-78``."""

    def tail(n, wu, fmin, fmax, cl):
        t = jnp.minimum((n - wu) / (cl - wu), 1.0)
        return fmin + 0.5 * (fmax - fmin) * (1 + jnp.cos(t * jnp.pi))

    return _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, tail)


def lambda_linear(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """Multi-cycle warmup+linear decay — SD's scheduler.
    Ref: ``lr_scheduler.py:81-98``."""

    def tail(n, wu, fmin, fmax, cl):
        return fmin + (fmax - fmin) * (cl - n) / cl

    return _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, tail)
