"""EMA as a params-shadow pytree.

Functional rebuild of ``LitEma`` (``ldm/modules/ema.py:5-76``): the shadow is
simply a second param pytree; the warmup-adjusted decay
``min(decay, (1+n)/(10+n))`` matches ``ema.py:30-33``. The torch version's
store/copy_to/restore buffer juggling disappears — swapping to EMA weights is
just using the other pytree (``ema_scope``, ``ddpm.py:171-184``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_init", "ema_update"]


class EmaState(NamedTuple):
    shadow: Any
    num_updates: jnp.ndarray  # int32; -1 disables warmup adjustment
    decay: float = 0.9999


def ema_init(params, decay: float = 0.9999, use_num_updates: bool = True) -> EmaState:
    # real copies, not jnp.asarray views: the shadow must not alias the live
    # params or donating a TrainState (trainer.fit donate_argnums) trips
    # "attempt to donate the same buffer twice"
    return EmaState(
        shadow=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
        decay=decay,
    )


def ema_update(state: EmaState, params) -> EmaState:
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    decay = jnp.where(
        n >= 0,
        jnp.minimum(state.decay, (1.0 + n) / (10.0 + n)),
        state.decay,
    )
    shadow = jax.tree.map(
        lambda s, p: s - (1.0 - decay) * (s - p), state.shadow, params
    )
    return EmaState(shadow=shadow, num_updates=n, decay=state.decay)
