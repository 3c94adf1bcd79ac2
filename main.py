"""Training CLI — rebuild of the reference ``main.py`` (L4 orchestration).

Usage mirrors the reference: ``python main.py --base <cfg.yaml> [cfg2.yaml]
-t [--resume logdir] [nested.key=value ...]``. OmegaConf's multi-base merge +
dotlist overrides run through the sd_tpu config layer; the Lightning Trainer
becomes the step-driven sd_tpu trainer over a jax.sharding mesh.
"""

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[],
                   help="base config yamls, merged left-to-right")
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="resume from logdir or checkpoint")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--val_every", type=int, default=0)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--no_images", action="store_true",
                   help="skip ImageLogger sample grids (each firing runs a "
                        "DDIM sampling scan — minutes of remote-compile RPC "
                        "per cadence point when training on the TPU tunnel)")
    p.add_argument("--scale_lr", type=lambda v: v.lower() != "false", default=True)
    p.add_argument("--ckpt", type=str, default="",
                   help="torch .ckpt to warm-start from (weight port)")
    return p.parse_known_args()


def main():
    opt, unknown = parse_args()
    import jax

    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

    import optax

    from sd_tpu.training.diffusion_loss import LDMTrainer
    from sd_tpu.training.lr_schedules import lambda_linear
    from sd_tpu.training.trainer import (
        DataModuleFromConfig,
        ImageLogger,
        Trainer,
        scale_learning_rate,
    )
    from sd_tpu.utils.config import (
        apply_dotlist,
        build_latent_diffusion,
        instantiate_from_config,
        load_yaml,
        merge_configs,
    )

    # ---- config assembly (main.py:460-516)
    configs = [load_yaml(b) for b in opt.base]
    if opt.resume:
        logdir = opt.resume.rstrip("/")
        base_cfgs = sorted(
            os.path.join(logdir, "configs", f)
            for f in os.listdir(os.path.join(logdir, "configs"))
        ) if os.path.isdir(os.path.join(logdir, "configs")) else []
        configs = [load_yaml(b) for b in base_cfgs] + configs
    else:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        name = opt.name or (os.path.splitext(os.path.basename(opt.base[0]))[0]
                            if opt.base else "run")
        logdir = os.path.join(opt.logdir, f"{now}_{name}")

    config = merge_configs(configs)
    dotlist = [a for a in unknown if "=" in a and not a.startswith("--")]
    config = apply_dotlist(config, dotlist)

    # ---- model
    rng = jax.random.PRNGKey(opt.seed)
    state_dict = None
    if opt.ckpt:
        from sd_tpu.utils.port import load_torch_state_dict

        state_dict = load_torch_state_dict(opt.ckpt)

    model_target = config["model"]["target"]
    is_first_stage_training = model_target.split(".")[-1] in (
        "AutoencoderKL", "VQModel", "VQModelInterface")
    if is_first_stage_training:
        return train_first_stage(opt, config, rng)
    ldm = build_latent_diffusion(config["model"], rng=rng,
                                 state_dict=state_dict,
                                 init_params=state_dict is None)

    # ---- data
    data_cfg = dict(config["data"]["params"])
    data = DataModuleFromConfig(
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        **data_cfg,
    )

    # ---- optimizer + LR rule (main.py:685-693)
    base_lr = config["model"]["params"].get("base_learning_rate", 1e-4)
    lr = scale_learning_rate(base_lr, data_cfg["batch_size"],
                             jax.device_count(), scale=opt.scale_lr)
    sched_cfg = config["model"]["params"].get("scheduler_config")
    if sched_cfg:
        sched = instantiate_from_config(sched_cfg)
        tx = optax.adamw(lambda s: lr * sched(s))
    else:
        tx = optax.adamw(lr)

    # model-level training knobs from the YAML (ddpm.py ctor kwargs):
    # cond_stage_trainable -> optimizer/EMA/ckpt coverage of the cond stage
    # (ddpm.py:509-528,1361-1366), learn_logvar (ddpm.py:111-114,1367-1369),
    # scale_by_std first-batch latent calibration (ddpm.py:476-491)
    mp = config["model"]["params"]
    train_cond_stage = bool(mp.get("cond_stage_trainable", False))
    if train_cond_stage:
        print("LatentDiffusion: Also optimizing conditioner params!")
    trainer_obj = LDMTrainer(
        ldm=ldm, optimizer=tx,
        train_cond_stage=train_cond_stage,
        scale_by_std=bool(mp.get("scale_by_std", False)),
        learn_logvar=bool(mp.get("learn_logvar", False)),
        logvar_init=float(mp.get("logvar_init", 0.0)),
        loss_type=mp.get("loss_type", "l2"),
        l_simple_weight=float(mp.get("l_simple_weight", 1.0)),
        original_elbo_weight=float(mp.get("original_elbo_weight", 0.0)),
        use_ema=bool(mp.get("use_ema", True)),
    )
    state = trainer_obj.init_state()

    from sd_tpu.utils.profiling import MetricsWriter

    harness = Trainer(
        trainer_obj=trainer_obj, ldm=ldm, logdir=logdir,
        max_steps=opt.max_steps, seed=opt.seed,
        val_every=opt.val_every, ckpt_every=opt.ckpt_every,
        log_every=opt.log_every,
        monitor=config["model"].get("params", {}).get("monitor"),
        image_logger=None if opt.no_images else ImageLogger(logdir),
        metrics_writer=MetricsWriter(logdir),
    )
    harness.dump_config(config)

    if opt.train:
        harness.fit(state, data, resume=bool(opt.resume))
    print(f"Done. Logs at {logdir}")


def train_first_stage(opt, config, rng):
    """Autoencoder (VAE-GAN) training path — the reference's
    configs/autoencoder/*.yaml flow (two-optimizer step, SURVEY §3.4)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from sd_tpu.training.lpips import LPIPS
    from sd_tpu.training.trainer import (
        DataModuleFromConfig,
        Trainer,
        scale_learning_rate,
    )
    from sd_tpu.training.vae_gan import VAEGANTrainer
    from sd_tpu.utils.config import instantiate_from_config

    p = config["model"]["params"]
    model = instantiate_from_config(config["model"])
    if hasattr(model, "ldm"):  # registry may hand back an LDM bundle
        raise ValueError("expected a first-stage model config")

    loss_cfg = dict(p.get("lossconfig", {}).get("params", {}))
    data_cfg = dict(config["data"]["params"])
    data = DataModuleFromConfig(
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        **data_cfg,
    )
    resize_range = p.get("batch_resize_range")
    if resize_range is not None:
        from sd_tpu.training.vae_gan import BatchResizeWrapper

        data = BatchResizeWrapper(data, tuple(resize_range))
        print(f"{type(model).__name__}: Using per-batch resizing in range "
              f"{tuple(resize_range)}.")

    base_lr = p.get("base_learning_rate",
                    config["model"].get("base_learning_rate", 4.5e-6))
    lr = scale_learning_rate(base_lr, data_cfg["batch_size"], jax.device_count())

    # image size from the first train batch contract
    sample = next(iter(data.train_dataloader()))
    img_shape = sample["image"].shape

    lpips = LPIPS()
    x0 = jnp.zeros((1,) + img_shape[1:])
    lpips_params = lpips.init(jax.random.PRNGKey(0), x0, x0)["params"]
    known = {"disc_start", "kl_weight", "codebook_weight", "pixelloss_weight",
             "perceptual_weight", "disc_num_layers", "disc_in_channels",
             "disc_factor", "disc_weight", "disc_loss", "logvar_init"}
    trainer_obj = VAEGANTrainer(
        model=model, lpips=lpips, lpips_params=lpips_params,
        learning_rate=lr,
        **{k: v for k, v in loss_cfg.items() if k in known},
    )
    state = trainer_obj.init_state(rng, image_shape=img_shape)

    harness = Trainer(trainer_obj=trainer_obj, ldm=None, logdir=opt.logdir,
                      max_steps=opt.max_steps, seed=opt.seed)
    harness.dump_config(config)
    if opt.train:
        harness.fit(state, data, resume=bool(opt.resume))
    print(f"Done (first-stage). Logs at {opt.logdir}")


if __name__ == "__main__":
    main()
