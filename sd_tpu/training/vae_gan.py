"""VAE GAN training — the two-optimizer first-stage step.

Rebuild of the reference's autoencoder training (SURVEY.md §3.4):
- ``LPIPSWithDiscriminator`` (``ldm/modules/losses/contperceptual.py:7-110``)
  for AutoencoderKL: L1 + LPIPS, learnable-logvar NLL, KL, PatchGAN hinge
  with the **adaptive generator weight** from the gradient-norm ratio at the
  decoder's last layer (``:32-43``), discriminator delayed to ``disc_start``;
- ``VQLPIPSWithDiscriminator`` (``losses/vqperceptual.py:43-167``) for
  VQModel: pixel(l1/l2) + LPIPS + codebook loss + GAN, codebook-usage
  perplexity.

JAX shape: the Lightning ``optimizer_idx`` alternation becomes two explicit
pure steps (``generator_step`` / ``discriminator_step``), each its own
``value_and_grad``. The adaptive weight's grad-of-grad query is expressed by
differentiating the nll/g scalars w.r.t. the decoder's final conv kernel
only (two extra VJPs, exactly the reference's two ``autograd.grad`` calls).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_tpu.models.vae import AutoencoderKL, VQModel
from sd_tpu.training.discriminator import NLayerDiscriminator
from sd_tpu.training.lpips import LPIPS

__all__ = [
    "hinge_d_loss",
    "vanilla_d_loss",
    "adopt_weight",
    "measure_perplexity",
    "VAEGANTrainer",
]


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """Delay a loss term until ``threshold`` steps. Ref: vqperceptual.py:21-24.
    jit-safe (global_step may be traced)."""
    return jnp.where(global_step < threshold, value, weight)


class BatchResizeWrapper:
    """Per-batch random resize for VQ first-stage training.

    Reference: ``VQModel.get_input`` (``ldm/models/autoencoder.py:25,49-58,
    129-139``) — resize every batch (bicubic) to a uniformly drawn multiple
    of 16 in ``[lo, hi]``; the first few global steps pin the max size so an
    OOM surfaces immediately. TPU-native port: the resize runs HOST-side in
    the input pipeline (MATLAB-bicubic ``data/degradation.py::imresize``;
    the reference uses ``F.interpolate(mode='bicubic')``) — a device-side
    dynamic resize would recompile per size, while host bucketing reuses one
    compiled program per size bucket. Applied to train and validation
    loaders like the reference's ``get_input``; only train batches advance
    the step counter.
    """

    def __init__(self, data, resize_range, seed: int = 0):
        lo, hi = resize_range
        if lo % 16 or hi % 16 or lo > hi:
            raise ValueError(f"batch_resize_range must be ascending "
                             f"multiples of 16, got {resize_range}")
        self._data = data
        self.resize_range = (int(lo), int(hi))
        self._rng = np.random.default_rng(seed)
        self.global_step = 0

    def _resize_batch(self, batch, advance: bool):
        from sd_tpu.data.degradation import imresize

        x = batch.get("image")
        if x is None:
            return batch
        lo, hi = self.resize_range
        if self.global_step <= 4:
            new = hi  # first few batches at max size to surface OOM early
        else:
            new = int(self._rng.choice(np.arange(lo, hi + 16, 16)))
        if advance:
            self.global_step += 1
        x = np.asarray(x)
        if new != x.shape[1]:
            scale = new / x.shape[1]
            x = np.stack([imresize(im, scale) for im in x])
            batch = dict(batch, image=x)
        return batch

    def _wrap(self, it, advance: bool):
        if it is None:
            return None
        return (self._resize_batch(b, advance) for b in it)

    def train_dataloader(self):
        return self._wrap(self._data.train_dataloader(), True)

    def val_dataloader(self):
        return self._wrap(self._data.val_dataloader(), False)

    def test_dataloader(self):
        return self._data.test_dataloader()

    def __getattr__(self, name):
        return getattr(self._data, name)


def measure_perplexity(predicted_indices, n_embed: int):
    """Codebook usage perplexity. Ref: vqperceptual.py:26-33."""
    onehot = jax.nn.one_hot(predicted_indices.reshape(-1), n_embed)
    avg = onehot.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    cluster_use = jnp.sum(avg > 0)
    return perplexity, cluster_use


class VAEGANState(NamedTuple):
    step: jnp.ndarray
    ae_params: Any
    ae_opt: Any
    disc_params: Any
    disc_stats: Any           # BatchNorm running stats
    disc_opt: Any
    logvar: jnp.ndarray       # learnable output log-variance (KL loss only)


@dataclasses.dataclass
class VAEGANTrainer:
    """Two-optimizer first-stage trainer (KL or VQ mode)."""

    model: Any                      # AutoencoderKL | VQModel
    lpips: LPIPS
    lpips_params: Any
    disc_start: int = 0
    kl_weight: float = 1.0          # KL mode
    codebook_weight: float = 1.0    # VQ mode
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    disc_loss: str = "hinge"
    pixel_loss: str = "l1"
    learning_rate: float = 4.5e-6
    logvar_init: float = 0.0

    def __post_init__(self):
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels, n_layers=self.disc_num_layers
        )
        # Adam(lr, betas=(0.5, 0.9)) for both — autoencoder.py:386-395
        self.ae_tx = optax.adam(self.learning_rate, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(self.learning_rate, b1=0.5, b2=0.9)
        self.d_loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        self.is_vq = isinstance(self.model, VQModel)

    # ---------------------------------------------------------------- state

    def init_state(self, rng, image_shape=(1, 64, 64, 3)) -> VAEGANState:
        r1, r2, r3 = jax.random.split(rng, 3)
        x = jnp.zeros(image_shape)
        if self.is_vq:
            ae_params = self.model.init(r1, x)["params"]
        else:
            ae_params = self.model.init(r1, x, rng=r1)["params"]
        disc_vars = self.discriminator.init(r2, x)
        return VAEGANState(
            step=jnp.asarray(0, jnp.int32),
            ae_params=ae_params,
            ae_opt=self.ae_tx.init(ae_params),
            disc_params=disc_vars["params"],
            disc_stats=disc_vars.get("batch_stats", {}),
            disc_opt=self.disc_tx.init(disc_vars["params"]),
            logvar=jnp.asarray(self.logvar_init, jnp.float32),
        )

    # ------------------------------------------------------------- forward

    def _reconstruct(self, ae_params, x, rng):
        if self.is_vq:
            rec, qloss, idx = self.model.apply({"params": ae_params}, x)
            return rec, ("vq", qloss, idx)
        rec, posterior = self.model.apply({"params": ae_params}, x, rng=rng)
        return rec, ("kl", posterior, None)

    def _rec_nll(self, x, rec, logvar):
        if self.pixel_loss == "l1":
            rec_loss = jnp.abs(x - rec)
        else:
            rec_loss = jnp.square(x - rec)
        rec_loss = self.pixelloss_weight * rec_loss
        if self.perceptual_weight > 0:
            p = self.lpips.apply({"params": self.lpips_params}, x, rec)
            rec_loss = rec_loss + self.perceptual_weight * p
        nll = rec_loss / jnp.exp(logvar) + logvar
        nll = jnp.sum(nll) / x.shape[0]
        return nll, rec_loss

    def _disc_logits(self, disc_params, disc_stats, images, train=True):
        """Discriminator logits. The generator loss evaluates the
        discriminator in TRAIN mode (batch statistics) exactly as the
        reference does — under Lightning the whole module is in train mode
        during ``training_step`` (``contperceptual.py:71-74``). The batch-stat
        mutation is discarded here; running stats only advance in the
        discriminator's own step."""
        variables = {"params": disc_params, "batch_stats": disc_stats}
        if train:
            logits, _ = self.discriminator.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            return logits
        return self.discriminator.apply(variables, images, train=False)

    @staticmethod
    def _last_layer_path(ae_params):
        # decoder's final conv kernel — the reference's get_last_layer
        # (autoencoder.py:397-398)
        return ("decoder", "conv_out", "kernel")

    # -------------------------------------------------------- generator

    def generator_step(self, state: VAEGANState, batch, rng) -> Tuple[VAEGANState, Dict]:
        x = batch["image"]

        def split_params(ae_params):
            path = self._last_layer_path(ae_params)
            sub = ae_params
            for p in path[:-1]:
                sub = sub[p]
            return sub[path[-1]]

        def set_last(ae_params, w):
            path = self._last_layer_path(ae_params)
            out = jax.tree.map(lambda x: x, ae_params)  # shallow copy tree
            node = out
            for p in path[:-1]:
                node[p] = dict(node[p])
                node = node[p]
            node[path[-1]] = w
            return out

        def parts(w_last, ae_params, logvar):
            ae = set_last(ae_params, w_last)
            rec, aux = self._reconstruct(ae, x, rng)
            nll, rec_loss = self._rec_nll(x, rec, logvar)
            logits_fake = self._disc_logits(state.disc_params, state.disc_stats, rec)
            g_loss = -jnp.mean(logits_fake)
            if aux[0] == "kl":
                reg = jnp.sum(aux[1].kl()) / x.shape[0]
                extra = {}
            else:
                reg = aux[1]
                perp, used = measure_perplexity(aux[2], self.model.n_embed)
                extra = {"perplexity": perp, "cluster_usage": used}
            return nll, g_loss, reg, rec_loss, extra

        w_last = split_params(state.ae_params)

        # adaptive d_weight: ||d nll/d w_last|| / ||d g/d w_last||
        # (contperceptual.py:32-43) — two scalar VJPs, detached.
        if self.disc_factor > 0.0:
            g_nll = jax.grad(lambda w: parts(w, state.ae_params, state.logvar)[0])(w_last)
            g_g = jax.grad(lambda w: parts(w, state.ae_params, state.logvar)[1])(w_last)
            d_weight = jnp.linalg.norm(g_nll.ravel()) / (
                jnp.linalg.norm(g_g.ravel()) + 1e-4
            )
            d_weight = jnp.clip(d_weight, 0.0, 1e4) * self.disc_weight
            d_weight = jax.lax.stop_gradient(d_weight)
        else:
            d_weight = jnp.asarray(0.0)

        disc_factor = adopt_weight(self.disc_factor, state.step, self.disc_start)

        def total_loss(trainables):
            ae_params, logvar = trainables
            w = split_params(ae_params)
            nll, g_loss, reg, rec_loss, extra = parts(w, ae_params, logvar)
            reg_w = self.kl_weight if not self.is_vq else self.codebook_weight
            loss = nll + reg_w * reg + d_weight * disc_factor * g_loss
            return loss, (nll, g_loss, reg, rec_loss, extra)

        (loss, (nll, g_loss, reg, rec_loss, extra)), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )((state.ae_params, state.logvar))

        updates, ae_opt = self.ae_tx.update(grads[0], state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, updates)
        logvar = state.logvar - self.learning_rate * grads[1]

        log = {
            "total_loss": loss, "nll_loss": nll, "g_loss": g_loss,
            "rec_loss": jnp.mean(rec_loss), "d_weight": d_weight,
            "disc_factor": disc_factor, "logvar": logvar,
            ("kl_loss" if not self.is_vq else "quant_loss"): reg,
            **extra,
        }
        return state._replace(ae_params=ae_params, ae_opt=ae_opt, logvar=logvar), log

    # ---------------------------------------------------- discriminator

    def discriminator_step(self, state: VAEGANState, batch, rng) -> Tuple[VAEGANState, Dict]:
        x = batch["image"]
        rec, _ = self._reconstruct(state.ae_params, x, rng)
        rec = jax.lax.stop_gradient(rec)
        disc_factor = adopt_weight(self.disc_factor, state.step, self.disc_start)

        def d_loss_fn(disc_params):
            variables = {"params": disc_params, "batch_stats": state.disc_stats}
            logits_real, stats1 = self.discriminator.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            logits_fake, stats2 = self.discriminator.apply(
                {"params": disc_params, "batch_stats": stats1["batch_stats"]},
                rec, train=True, mutable=["batch_stats"],
            )
            d_loss = disc_factor * self.d_loss_fn(logits_real, logits_fake)
            return d_loss, (logits_real, logits_fake, stats2["batch_stats"])

        (d_loss, (lr_, lf_, stats)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)
        updates, disc_opt = self.disc_tx.update(grads, state.disc_opt,
                                                state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        log = {
            "disc_loss": d_loss,
            "logits_real": jnp.mean(lr_),
            "logits_fake": jnp.mean(lf_),
        }
        return state._replace(
            disc_params=disc_params, disc_opt=disc_opt, disc_stats=stats
        ), log

    # ------------------------------------------------------------- step

    def train_step(self, state: VAEGANState, batch, rng) -> Tuple[VAEGANState, Dict]:
        """One full iteration = generator step then discriminator step (the
        Lightning alternation, autoencoder.py:351-384)."""
        r1, r2 = jax.random.split(rng)
        state, g_log = self.generator_step(state, batch, r1)
        state, d_log = self.discriminator_step(state, batch, r2)
        state = state._replace(step=state.step + 1)
        return state, {**g_log, **d_log}
