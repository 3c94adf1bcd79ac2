"""Training orchestration — the ``main.py`` harness rebuilt (SURVEY.md L4).

Pieces, mapped to the reference:
- :class:`DataModuleFromConfig` (``main.py:162-237``): train/val loaders from
  config nodes via the target registry;
- LR scaling rule ``lr = accum x ndev x bs x base_lr`` (``main.py:685-693``);
- :class:`ImageLogger` (``main.py:289-392``): periodic ``log_images`` grids
  (750-step default cadence + early power-of-2 steps);
- SetupCallback behavior (``main.py:240-286``): logdir/config dump at start;
- checkpointing: save_last + monitored top-k (``main.py:569-590``) through
  ``sd_tpu.utils.checkpoint``; SIGUSR1 -> immediate save ("melk",
  ``main.py:696-713``); exception-path save (``main.py:717-722``);
- resume from a logdir (``main.py:477-495``).
"""

from __future__ import annotations

import dataclasses
import os
import signal
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from sd_tpu.parallel.mesh import is_main_process
from sd_tpu.utils.checkpoint import CheckpointManager, latest_checkpoint, restore_checkpoint
from sd_tpu.utils.config import instantiate_from_config
from sd_tpu.utils.image import (make_grid, save_image, segmentation_to_rgb,
                                text_to_image)

__all__ = ["DataModuleFromConfig", "ImageLogger", "Trainer", "log_images"]


class DataModuleFromConfig:
    """Builds DataLoaders from dataset config nodes. Ref: ``main.py:162-237``."""

    def __init__(self, batch_size: int, train: Optional[Dict] = None,
                 validation: Optional[Dict] = None, test: Optional[Dict] = None,
                 num_workers: Optional[int] = None, wrap: bool = False,
                 num_shards: int = 1, shard_index: int = 0):
        from sd_tpu.data.base import DataLoader

        self.batch_size = batch_size
        self.loaders: Dict[str, DataLoader] = {}
        for split, cfg in [("train", train), ("validation", validation),
                           ("test", test)]:
            if cfg is None:
                continue
            ds = instantiate_from_config(cfg)
            self.loaders[split] = DataLoader(
                ds, batch_size=batch_size, shuffle=split == "train",
                num_shards=num_shards, shard_index=shard_index,
            )

    def train_dataloader(self):
        return self.loaders["train"]

    def val_dataloader(self):
        return self.loaders.get("validation")

    def test_dataloader(self):
        return self.loaders.get("test")


def log_images(ldm, batch, rng, n_row: int = 4, sample_steps: int = 20,
               sample: bool = True, plot_diffusion_rows: bool = True,
               plot_denoise_rows: bool = False) -> Dict[str, np.ndarray]:
    """The LDM ``log_images`` contract (``ddpm.py:1250-1359``): a dict of
    named [-1,1] image arrays — inputs, reconstruction, conditioning,
    diffusion row, samples (+ denoise row)."""
    from sd_tpu.pipelines.txt2img import latents_to_images
    from sd_tpu.samplers import ddim_sample, progressive_denoising

    out: Dict[str, np.ndarray] = {}
    n = min(n_row, batch["image"].shape[0])
    x = jnp.asarray(batch["image"][:n])
    out["inputs"] = np.asarray(x)

    rng, k_enc, k_samp, k_diff = jax.random.split(rng, 4)
    z = ldm.encode_to_latent(x, rng=k_enc)
    out["reconstruction"] = np.asarray(ldm.decode_first_stage(z)) if (
        ldm.first_stage_model is not None) else np.asarray(z)

    raw_cond = batch.get(ldm.cond_stage_key)
    cond = None
    if raw_cond is not None and ldm.cond_stage_model is not None:
        if isinstance(raw_cond, list) and isinstance(raw_cond[0], str):
            out["conditioning"] = text_to_image(
                (x.shape[2] * 4, x.shape[1] * 4), raw_cond[:n])
            raw_cond = None  # host strings need a tokenizer; pipelines own it
        else:
            cond = ldm.get_learned_conditioning(jnp.asarray(raw_cond[:n]))
            rc = np.asarray(raw_cond[:n])
            if rc.ndim == 4 and rc.shape[-1] > 3:  # ismap (ddpm.py:1279-1280)
                out["original_conditioning"] = segmentation_to_rgb(rc)

    if plot_diffusion_rows:  # ddpm.py:1277-1294
        rows = []
        for t_frac in np.linspace(0, ldm.schedule.num_timesteps - 1, 6):
            t = jnp.full((n,), int(t_frac), jnp.int32)
            noise = jax.random.normal(k_diff, z.shape, z.dtype)
            rows.append(np.asarray(ldm.decode_first_stage(
                ldm.q_sample(z, t, noise))))
        out["diffusion_row"] = make_grid(
            np.concatenate(rows), n_rows=n)[None]

    if sample and (cond is not None or ldm.conditioning_key is None):
        z_samp, _ = ddim_sample(
            ldm.apply_model, ldm.schedule, z.shape, cond, k_samp,
            num_steps=sample_steps,
        )
        out["samples"] = np.asarray(ldm.decode_first_stage(z_samp))
        if plot_denoise_rows:
            _, x0_traj = progressive_denoising(
                ldm.apply_model, ldm.schedule, z.shape, cond=cond, rng=k_samp,
                log_every_t=ldm.schedule.num_timesteps // 6,
            )
            decoded = [np.asarray(ldm.decode_first_stage(t)) for t in x0_traj]
            out["denoise_row"] = make_grid(np.concatenate(decoded), n_rows=n)[None]
    return out


def log_images_vae(model, params, batch, rng, n_row: int = 4):
    """First-stage log_images contract (``autoencoder.py:400-415``): inputs,
    reconstructions, and decoded random latents."""
    from sd_tpu.models.vae import AutoencoderKL, VQModel

    n = min(n_row, batch["image"].shape[0])
    x = jnp.asarray(batch["image"][:n])
    out = {"inputs": np.asarray(x)}
    if isinstance(model, VQModel):
        rec, _, _ = model.apply({"params": params}, x)
        z = model.apply({"params": params}, x, method=model.encode_pre_quant)
        noise = jax.random.normal(rng, z.shape, z.dtype)
        out["samples"] = np.asarray(
            model.apply({"params": params}, noise, method=model.decode))
    else:
        rec, posterior = model.apply({"params": params}, x, rng=rng)
        noise = jax.random.normal(rng, posterior.mean.shape)
        out["samples"] = np.asarray(
            model.apply({"params": params}, noise, method=model.decode))
    out["reconstructions"] = np.asarray(rec)
    return out


class ImageLogger:
    """Periodic image logging. Cadence: every ``every`` steps, plus early
    power-of-2 steps (``main.py:372-381``)."""

    def __init__(self, logdir: str, every: int = 750, max_images: int = 4,
                 log_first_n: bool = True):
        self.dir = os.path.join(logdir, "images")
        self.every = every
        self.max_images = max_images
        self.log_first_n = log_first_n
        os.makedirs(self.dir, exist_ok=True)

    def should_log(self, step: int) -> bool:
        if step % self.every == 0:
            return True
        return self.log_first_n and step <= 8 and (step & (step - 1)) == 0

    def __call__(self, ldm, batch, step: int, rng, split: str = "train"):
        if not (self.should_log(step) and is_main_process()):
            return
        imgs = log_images(ldm, batch, rng, n_row=self.max_images)
        for name, arr in imgs.items():
            grid = make_grid(np.clip((arr + 1.0) / 2.0, 0, 1))
            path = os.path.join(
                self.dir, f"{split}_{name}_step{step:08}.png")
            save_image((grid * 255).astype(np.uint8), path)


@dataclasses.dataclass
class Trainer:
    """Step-driven training loop with checkpoints, image logging, signals."""

    trainer_obj: Any              # LDMTrainer or VAEGANTrainer
    ldm: Any
    logdir: str
    max_steps: int = 1000
    val_every: int = 0
    ckpt_every: int = 1000
    monitor: Optional[str] = None
    image_logger: Optional[ImageLogger] = None
    seed: int = 42
    log_every: int = 50
    metrics_writer: Optional[Any] = None  # e.g. utils.metrics.MetricsWriter

    def __post_init__(self):
        os.makedirs(self.logdir, exist_ok=True)
        self.ckpt = CheckpointManager(
            os.path.join(self.logdir, "checkpoints"), monitor=self.monitor)
        # self-describing run products: inference-from-run-dir rebuilds the
        # FROZEN stages from the run config + this seed (they are not part of
        # the trainable checkpoint), so the seed must travel in the sidecar
        self.ckpt.extra_meta["seed"] = int(self.seed)
        self.ckpt.extra_meta["use_ema"] = bool(
            getattr(self.trainer_obj, "use_ema", False))
        self._melk_requested = False
        try:
            signal.signal(signal.SIGUSR1, self._melk)
        except ValueError:
            pass  # not in main thread

    def _melk(self, *args):  # main.py:696-703
        print("Summoning checkpoint (SIGUSR1).")
        self._melk_requested = True

    def _set_scale_factor(self, scale: float):
        """Rebind a (restored or freshly calibrated) latent scale_factor into
        the live LDM bundles and record it in checkpoint metadata."""
        self.ckpt.extra_meta["scale_factor"] = float(scale)
        if getattr(self.trainer_obj, "ldm", None) is not None:
            self.trainer_obj.ldm = dataclasses.replace(
                self.trainer_obj.ldm, scale_factor=float(scale))
        if self.ldm is not None:
            self.ldm = dataclasses.replace(self.ldm, scale_factor=float(scale))

    def dump_config(self, config: Dict):
        """SetupCallback config dump (``main.py:257-275``)."""
        if not is_main_process():
            return
        cfgdir = os.path.join(self.logdir, "configs")
        os.makedirs(cfgdir, exist_ok=True)
        with open(os.path.join(cfgdir, "project.yaml"), "w") as f:
            yaml.safe_dump(config, f)

    def fit(self, state, data: DataModuleFromConfig, resume: bool = False):
        """Run the training loop; returns the final state.

        CONSUMES ``state``: the jitted step donates its input buffers, and
        ``init_state``'s params alias the live LDM's param pytree, so after
        the first step neither the passed-in state nor the original model
        params may be read again — use the returned state (the loop itself
        always rebinds; validation/image-logging rebind from the new state).

        Resume is EXACT: the train-step key is ``fold_in(PRNGKey(seed),
        step)`` (not a chained split, which would desynchronize after a
        restore), and on resume the loader is fast-forwarded to the restored
        step's (epoch, position) — the DataLoader's shuffle is already
        epoch-deterministic (``seed + epoch``). A run killed mid-training
        (SIGUSR1 "melk" or exception checkpoint) and resumed therefore
        reproduces the uninterrupted run's parameters bit-for-bit; the
        reference only restores trainer state (``main.py:477-495``) and
        replays Lightning's nondeterministic loader, so this is strictly
        stronger. Verified by ``tools/convergence_run.py`` /
        ``tests/test_convergence.py``.
        """
        rng = jax.random.PRNGKey(self.seed)
        step_base = jax.random.fold_in(rng, 0x5d0)  # train-step key chain
        restored = False
        if resume:
            path = latest_checkpoint(os.path.join(self.logdir, "checkpoints"))
            if path:
                state, meta = restore_checkpoint(path, target=state)
                restored = True
                print(f"Restored from {path} (step {meta and meta.get('step')})")
                # restore a std-calibrated latent scale (ddpm.py:476-491 sets
                # it as a buffer, so the reference round-trips it through the
                # state_dict; we round-trip it through checkpoint metadata)
                if meta and meta.get("scale_factor") is not None:
                    self._set_scale_factor(float(meta["scale_factor"]))

        # first-batch latent-std calibration (ddpm.py:476-491): only on a
        # fresh run (the reference gates on ``not restarted_from_ckpt``), and
        # BEFORE the train step is traced so the jit constant is calibrated
        if getattr(self.trainer_obj, "scale_by_std", False) and not restored:
            rng, k_cal = jax.random.split(rng)
            batch = _to_device(next(iter(data.train_dataloader())))
            scale = self.trainer_obj.calibrate_scale_by_std(batch, k_cal)
            self._set_scale_factor(scale)

        # donate the incoming state: the loop rebinds it every iteration and
        # never touches the old buffers, so XLA reuses the params + optimizer
        # moments in place instead of holding both generations in HBM
        # (~2x 8.5 GB transient at 860M/AdamW scale; harmless no-op on CPU)
        step_fn = jax.jit(self.trainer_obj.train_step, donate_argnums=(0,))
        # The step counter is tracked on HOST: state.step advances by exactly
        # one per train_step, so fetching it every iteration (r1 behavior)
        # paid this environment's ~40-50 ms RPC floor per step and serialized
        # dispatch. Steps now dispatch asynchronously back-to-back; the only
        # device sync is one scalar fetch per `log_every` steps (the same
        # async-chain technique bench.py uses).
        step = int(jax.device_get(state.step))
        t0, t0_step = time.time(), step
        # fast-forward the loader to the restored (epoch, position) so the
        # resumed run sees the exact batch sequence of an uninterrupted one
        # (DataModuleFromConfig hands back the same DataLoader object every
        # call; ad-hoc generators without .epoch simply aren't fast-forwarded)
        skip = 0
        if step:
            probe = data.train_dataloader()
            n = len(probe) if hasattr(probe, "epoch") else 0
            if n > 0:
                probe.epoch = step // n
                skip = step % n
        try:
            while step < self.max_steps:
                for batch in data.train_dataloader():
                    if skip:
                        skip -= 1
                        continue
                    if step >= self.max_steps:
                        break
                    rng, k_log = jax.random.split(rng)
                    k = jax.random.fold_in(step_base, step)
                    state, aux = step_fn(state, _to_device(batch), k)
                    step += 1
                    if step % self.log_every == 0:
                        loss = float(jax.device_get(
                            aux.get("loss", aux.get("total_loss", jnp.nan))))
                        rate = (step - t0_step) / max(time.time() - t0, 1e-9)
                        print(f"step {step}: loss={loss:.4f} ({rate:.2f} it/s)")
                        if self.metrics_writer is not None:
                            self.metrics_writer.write(
                                step, {"train/loss": loss, "train/it_per_sec": rate})
                    if self.image_logger is not None and self.ldm is not None:
                        rebind = {"unet_params": state.params["unet"]}
                        if "cond_stage" in state.params:  # cond_stage_trainable
                            rebind["cond_stage_params"] = state.params["cond_stage"]
                        ldm = dataclasses.replace(self.ldm, **rebind)
                        self.image_logger(ldm, batch, step, k_log)
                    if step % self.ckpt_every == 0 or self._melk_requested:
                        self.ckpt.save_last(state, step, _scalars(aux))
                        self._melk_requested = False
                    if self.val_every and step % self.val_every == 0:
                        self._validate(state, data, rng, step)
        except BaseException:
            # exception-path checkpoint (main.py:717-722)
            self.ckpt.save_last(state, step)
            raise
        self.ckpt.save_last(state, step)
        return state

    def _validate(self, state, data, rng, step):
        """Validation over a few batches with current AND EMA params — the
        reference logs both (``ddpm.py:357-364``: validation_step runs the
        plain step, then repeats it under ``ema_scope`` with ``_ema`` suffix).
        """
        loader = data.val_dataloader()
        if loader is None:
            return
        ema = getattr(state, "ema", None)
        # async dispatch: keep every per-batch loss ON DEVICE and fetch once
        # at the end — each jax.device_get through the TPU tunnel pays the
        # ~40-50 ms RPC floor, so the pass issues O(1) syncs, not O(batches)
        losses, losses_ema = [], []
        for i, batch in enumerate(loader):
            if i >= 8:
                break
            rng, k = jax.random.split(rng)
            dev_batch = _to_device(batch)
            loss, aux = self.trainer_obj.loss_fn(state.params, dev_batch, k)
            losses.append(loss)
            if ema is not None:
                loss_e, _ = self.trainer_obj.loss_fn(ema.shadow, dev_batch, k)
                losses_ema.append(loss_e)
        fetched = jax.device_get(losses + losses_ema)
        metrics = {"val/loss_simple": float(np.mean(fetched[:len(losses)]))}
        if losses_ema:
            metrics["val/loss_simple_ema"] = float(
                np.mean(fetched[len(losses):]))
        print(f"validation @ step {step}: {metrics}")
        if self.metrics_writer is not None:
            self.metrics_writer.write(step, metrics)
        self.ckpt.save_monitored(state, step, metrics)


def _to_device(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


def _scalars(aux):
    return {k: v for k, v in aux.items() if jnp.ndim(v) == 0}


def scale_learning_rate(base_lr: float, batch_size: int, n_devices: int,
                        accumulate: int = 1, scale: bool = True) -> float:
    """``lr = accum x ndev x bs x base_lr`` (``main.py:685-693``)."""
    if not scale:
        return base_lr
    lr = accumulate * n_devices * batch_size * base_lr
    print(
        f"Setting learning rate to {lr:.2e} = {accumulate} (accum) * "
        f"{n_devices} (devices) * {batch_size} (batchsize) * {base_lr:.2e} (base_lr)"
    )
    return lr
