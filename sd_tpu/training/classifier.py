"""Noisy-latent classifier training — classifier guidance support.

Rebuild of ``ldm/models/diffusion/classifier.py:28-267``
(``NoisyLatentImageClassifier``): trains a half-UNet classifier on diffused
latents at all noise levels t, logging acc@1/acc@5 per noise bucket; the
trained classifier provides gradients for classifier-guided sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_tpu.core.schedules import DiffusionSchedule, q_sample
from sd_tpu.models.encoder_unet import EncoderUNetConfig, EncoderUNetModel

__all__ = ["NoisyLatentClassifierTrainer", "compute_top_k", "classifier_guidance_corrector"]


def compute_top_k(logits, labels, k: int) -> jnp.ndarray:
    """acc@k. Ref: ``classifier.py:150-156``."""
    _, top = jax.lax.top_k(logits, k)
    hit = jnp.any(top == labels[:, None], axis=1)
    return hit.mean()


class ClassifierState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass
class NoisyLatentClassifierTrainer:
    """Trains logits(x_t, t) on latents diffused to uniform-random t.

    ``encode_fn`` maps images -> latents (the frozen diffusion model's first
    stage, ``classifier.py:124-131``); identity for pixel-space.
    """

    model: EncoderUNetModel
    schedule: DiffusionSchedule
    encode_fn: Optional[Callable] = None
    label_key: str = "class_label"
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    noise_level_buckets: int = 10

    def __post_init__(self):
        self.tx = optax.adamw(self.learning_rate, weight_decay=self.weight_decay)

    def init_state(self, rng, latent_shape) -> ClassifierState:
        x = jnp.zeros((1,) + tuple(latent_shape))
        params = self.model.init(rng, x, jnp.zeros((1,)))["params"]
        return ClassifierState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=self.tx.init(params),
        )

    def loss_fn(self, params, batch, rng) -> Tuple[jnp.ndarray, Dict]:
        k_t, k_noise, k_enc = jax.random.split(rng, 3)
        x = batch["image"]
        if self.encode_fn is not None:
            x = jax.lax.stop_gradient(self.encode_fn(x, k_enc))
        labels = batch[self.label_key]
        b = x.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        x_noisy = q_sample(self.schedule, x, t, noise)

        logits = self.model.apply({"params": params}, x_noisy, t.astype(jnp.float32))
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        aux = {
            "loss": loss,
            "acc@1": compute_top_k(logits, labels, 1),
            "acc@5": compute_top_k(logits, labels, min(5, logits.shape[-1])),
            "t_mean": t.mean().astype(jnp.float32),
        }
        return loss, aux

    def train_step(self, state: ClassifierState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return ClassifierState(state.step + 1, params, opt_state), aux

    def eval_noise_buckets(self, state: ClassifierState, batch, rng) -> Dict:
        """acc@1 per noise-level bucket (``classifier.py:202-218``)."""
        x = batch["image"]
        if self.encode_fn is not None:
            x = self.encode_fn(x, rng)
        labels = batch[self.label_key]
        out = {}
        T = self.schedule.num_timesteps
        for i in range(self.noise_level_buckets):
            t_val = int((i + 0.5) * T / self.noise_level_buckets)
            t = jnp.full((x.shape[0],), t_val, jnp.int32)
            noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
            x_noisy = q_sample(self.schedule, x, t, noise)
            logits = self.model.apply({"params": state.params}, x_noisy,
                                      t.astype(jnp.float32))
            out[f"acc@1_t{t_val}"] = float(compute_top_k(logits, labels, 1))
        return out


def classifier_guidance_corrector(model: EncoderUNetModel, params,
                                  schedule: DiffusionSchedule,
                                  target_labels, scale: float = 1.0):
    """Build a ``score_corrector`` for the samplers: shifts eps by
    -s * sqrt(1-a_t) * grad_x log p(y|x_t) (ADM classifier guidance)."""

    def corrector(e_t, x, t, cond):
        def logp(xx):
            logits = model.apply({"params": params}, xx, t.astype(jnp.float32))
            logprobs = jax.nn.log_softmax(logits)
            return logprobs[jnp.arange(xx.shape[0]), target_labels].sum()

        grad = jax.grad(logp)(x)
        s1m = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)[t]
        s1m = s1m.reshape((-1,) + (1,) * (x.ndim - 1))
        return e_t - scale * s1m * grad

    return corrector
