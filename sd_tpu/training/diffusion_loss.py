"""Diffusion training loss + the LDM train step.

Rebuild of the reference's training math (``ldm/models/diffusion/ddpm.py``):
- ``p_losses`` (``:294-323`` pixel DDPM; ``:1012-1045`` latent): q_sample at
  uniform t, eps/x0 target MSE (or L1), learned-logvar weighting, ELBO term
  via lvlb_weights;
- ``training_step``/``shared_step`` (``:342``, ``:865-879``): encode first
  stage (frozen, no grad), encode conditioning (frozen unless trainable),
  draw t, compute loss;
- optimizer: AdamW on UNet (+cond stage if trainable) params
  (``configure_optimizers``, ``:1361-1383``) with per-step LambdaLinear LR;
- EMA shadow update per step (``:366-368``);
- gradient accumulation via ``lax.scan`` microbatching (the reference's
  Lightning ``accumulate_grad_batches``, ``main.py:679-684``).

Everything here is jit-compatible and mesh-agnostic: data parallelism comes
from batch-sharded inputs + replicated params (GSPMD inserts the gradient
all-reduce), per SURVEY.md §2.10.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_tpu.core.schedules import DiffusionSchedule, q_sample
from sd_tpu.models.ldm import LatentDiffusion
from sd_tpu.training.ema import EmaState, ema_init, ema_update

__all__ = ["p_losses", "TrainState", "make_train_step", "create_train_state"]


def p_losses(
    apply_model: Callable,
    schedule: DiffusionSchedule,
    x_start,
    cond,
    t,
    noise,
    parameterization: str = "eps",
    loss_type: str = "l2",
    logvar: Optional[jnp.ndarray] = None,
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Ref: ``ddpm.py:1012-1045``. Returns (loss, loss_dict)."""
    x_noisy = q_sample(schedule, x_start, t, noise)
    model_out = apply_model(x_noisy, t, cond)
    target = noise if parameterization == "eps" else x_start

    if loss_type == "l2":
        err = jnp.square(model_out - target)
    elif loss_type == "l1":
        err = jnp.abs(model_out - target)
    else:
        raise NotImplementedError(loss_type)
    loss_simple = err.mean(axis=tuple(range(1, err.ndim)))  # [B]

    logvar_t = jnp.zeros_like(loss_simple) if logvar is None else logvar[t]
    loss = loss_simple / jnp.exp(logvar_t) + logvar_t
    loss = l_simple_weight * loss.mean()

    lvlb = (jnp.asarray(schedule.lvlb_weights)[t] * loss_simple).mean()
    loss = loss + original_elbo_weight * lvlb
    return loss, {
        "loss": loss,
        "loss_simple": loss_simple.mean(),
        "loss_vlb": lvlb,
    }


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any                 # trainable params (unet [+ cond stage])
    opt_state: Any
    ema: Optional[EmaState]


@dataclasses.dataclass
class LDMTrainer:
    """Binds the frozen parts of an LDM to a pure train step.

    ``train_cond_stage`` mirrors the reference's ``cond_stage_trainable``
    (``ddpm.py:509-528``): the cond-stage params join the optimizer
    (``configure_optimizers``, ``ddpm.py:1361-1366``), the EMA shadow, and
    checkpoints. ``learn_logvar`` adds the per-timestep logvar table as a
    trainable leaf (``ddpm.py:111-114,1367-1369``). ``scale_by_std`` arms the
    first-batch latent-std calibration (``ddpm.py:476-491``) performed by
    :meth:`calibrate_scale_by_std`.
    """

    ldm: LatentDiffusion
    optimizer: optax.GradientTransformation
    train_cond_stage: bool = False
    loss_type: str = "l2"
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    use_ema: bool = True
    ema_decay: float = 0.9999
    accumulate_grad_batches: int = 1
    learn_logvar: bool = False
    logvar_init: float = 0.0
    scale_by_std: bool = False

    # ------------------------------------------------------------ state

    def init_state(self) -> TrainState:
        params = {"unet": self.ldm.unet_params}
        if self.train_cond_stage and self.ldm.cond_stage_params is not None:
            params["cond_stage"] = self.ldm.cond_stage_params
        if self.learn_logvar:
            # trainable per-t logvar (ddpm.py:112-114); joins the optimizer
            # like the reference's nn.Parameter (ddpm.py:1367-1369)
            params["logvar"] = jnp.full(
                (self.ldm.schedule.num_timesteps,), self.logvar_init,
                jnp.float32)
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema=ema_init(params, self.ema_decay) if self.use_ema else None,
        )

    # ------------------------------------------------- std calibration

    def calibrate_scale_by_std(self, batch, rng) -> float:
        """First-batch latent rescaling (``ddpm.py:476-491``): set
        ``scale_factor = 1 / std(z)`` from the first train batch's latents
        (encoded at scale 1). Mutates ``self.ldm`` IN PLACE so the jitted
        step (traced after this runs) and all eval/image-log rebinds see the
        calibrated value. Returns the new scale factor.
        """
        assert float(self.ldm.scale_factor) == 1.0, (
            "rather not use custom rescaling and std-rescaling simultaneously"
        )  # ddpm.py:481
        print("### USING STD-RESCALING ###")
        z = self.ldm.encode_to_latent(jnp.asarray(batch["image"]), rng=rng)
        # torch .std() is the unbiased (ddof=1) estimator (ddpm.py:489)
        std = float(jnp.std(z.reshape(-1), ddof=1))
        scale = 1.0 / std
        self.ldm = dataclasses.replace(self.ldm, scale_factor=scale)
        print(f"setting self.scale_factor to {scale}")
        print("### USING STD-RESCALING ###")
        return scale

    # ------------------------------------------------------- loss parts

    def _apply_model(self, params, x, t, cond):
        ldm = dataclasses.replace(self.ldm, unet_params=params["unet"])
        return ldm.apply_model(x, t, cond)

    def _encode_cond(self, params, raw_cond):
        if raw_cond is None or self.ldm.cond_stage_model is None:
            return raw_cond
        if self.train_cond_stage:
            ldm = dataclasses.replace(
                self.ldm, cond_stage_params=params["cond_stage"]
            )
            return ldm.get_learned_conditioning(raw_cond)
        return jax.lax.stop_gradient(self.ldm.get_learned_conditioning(raw_cond))

    def loss_fn(self, params, batch, rng):
        """batch: dict with the framework-wide named-tensor contract
        (SURVEY.md §1 L6): 'image' [B,H,W,C] in [-1,1] plus the cond key."""
        k_enc, k_t, k_noise = jax.random.split(rng, 3)
        x = batch["image"]
        z = jax.lax.stop_gradient(self.ldm.encode_to_latent(x, rng=k_enc))
        cond = self._encode_cond(params, batch.get(self.ldm.cond_stage_key))

        b = z.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.ldm.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        if self.learn_logvar:
            logvar = params["logvar"]
        elif self.logvar_init != 0.0:
            # static (non-learned) per-t logvar table, ddpm.py:112
            logvar = jnp.full((self.ldm.schedule.num_timesteps,),
                              self.logvar_init, jnp.float32)
        else:
            logvar = None
        return p_losses(
            lambda xx, tt, cc: self._apply_model(params, xx, tt, cc),
            self.ldm.schedule, z, cond, t, noise,
            parameterization=self.ldm.parameterization,
            loss_type=self.loss_type,
            logvar=logvar,
            l_simple_weight=self.l_simple_weight,
            original_elbo_weight=self.original_elbo_weight,
        )

    # ------------------------------------------------------- train step

    def train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        """One optimizer step; with accumulation the batch's leading axis is
        split into ``accumulate_grad_batches`` microbatches scanned on-device."""
        # trace-time guard (ADVICE r4 #2): the W8A8 paths quantize with
        # jnp.round (zero gradient a.e.) and carry no STE — training with
        # SD_TPU_INT8 set would silently plateau instead of erroring
        from sd_tpu.ops.quant import int8_buckets

        if int8_buckets():
            raise RuntimeError(
                "SD_TPU_INT8 is set but int8 is an inference-only serving "
                "mode: round() has zero gradient a.e., so training would "
                "silently learn nothing through quantized sites. Unset "
                "SD_TPU_INT8 to train.")
        accum = self.accumulate_grad_batches

        def grads_of(mb, key):
            (loss, aux), g = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, mb, key
            )
            return g, aux

        if accum > 1:
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch,
            )
            keys = jax.random.split(rng, accum)

            def body(carry, xs):
                g_acc = carry
                mb, key = xs
                g, aux = grads_of(mb, key)
                return jax.tree.map(jnp.add, g_acc, g), aux

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            g_sum, aux = jax.lax.scan(body, zeros, (micro, keys))
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            aux = jax.tree.map(lambda a: a[-1], aux)
        else:
            grads, aux = grads_of(batch, rng)

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params) if state.ema is not None else None
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        return new_state, aux


def create_train_state(ldm, base_lr: float, schedule_fn=None, **kwargs):
    """AdamW (+ optional LR-multiplier schedule), matching
    ``configure_optimizers`` (``ddpm.py:1361-1383``)."""
    tx = optax.adamw(
        learning_rate=(lambda s: base_lr * schedule_fn(s)) if schedule_fn else base_lr
    )
    trainer = LDMTrainer(ldm=ldm, optimizer=tx, **kwargs)
    return trainer, trainer.init_state()


def make_train_step(trainer: LDMTrainer):
    return jax.jit(trainer.train_step)
