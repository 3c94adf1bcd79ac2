"""Config layer: YAML object graphs with an explicit target registry.

The reference makes every YAML node with ``target:``+``params:`` instantiable
via import-by-string (``ldm/util.py:78-93``). The rebuild keeps the YAML
contract — all 20 shipped model configs parse unchanged — but resolves
targets through an explicit registry (SURVEY.md §5.6 recommendation: no
arbitrary import execution), with reference module paths aliased to their
sd_tpu equivalents. OmegaConf's multi-base merge + CLI dotlist
(``main.py:514-516``) is reimplemented on plain dicts.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml

__all__ = [
    "load_yaml",
    "merge_configs",
    "apply_dotlist",
    "instantiate_from_config",
    "register_target",
    "build_latent_diffusion",
    "build_latent_diffusion_from_run",
]


# ---------------------------------------------------------------- yaml utils


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def merge_configs(configs: Sequence[Dict]) -> Dict:
    """Left-to-right deep merge (later wins), like OmegaConf.merge."""

    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                out[k] = merge(a[k], v) if k in a else v
            return out
        return b

    out: Dict = {}
    for c in configs:
        out = merge(out, c or {})
    return out


def apply_dotlist(cfg: Dict, dotlist: Sequence[str]) -> Dict:
    """Apply ``nested.key=value`` overrides (values YAML-parsed)."""
    cfg = copy.deepcopy(cfg)
    for item in dotlist:
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


# ------------------------------------------------------------------ registry

_REGISTRY: Dict[str, Callable[..., Any]] = {}

# sentinels (ddpm.py:444-445, ldm/util.py:80-83)
FIRST_STAGE_SENTINEL = "__is_first_stage__"
UNCONDITIONAL_SENTINEL = "__is_unconditional__"


def register_target(*names: str):
    def deco(fn):
        for n in names:
            _REGISTRY[n] = fn
        return fn

    return deco


def instantiate_from_config(cfg: Dict, **extra) -> Any:
    """Resolve a ``{target, params}`` node. Ref contract: ``ldm/util.py:78-93``."""
    if not isinstance(cfg, dict) or "target" not in cfg:
        if cfg in (FIRST_STAGE_SENTINEL, UNCONDITIONAL_SENTINEL):
            return cfg
        raise KeyError(f"Expected a config dict with 'target', got: {cfg!r}")
    target = cfg["target"]
    if target not in _REGISTRY:
        raise KeyError(
            f"Unknown target {target!r}. Register it with sd_tpu.utils.config."
            f"register_target."
        )
    params = dict(cfg.get("params") or {})
    return _REGISTRY[target](params, **extra)


def _register_builtins():
    from sd_tpu.models.clip import CLIP_VIT_L_14_TEXT, CLIPTextModel
    from sd_tpu.models.encoders import (
        BERTEmbedder,
        ClassEmbedder,
        SpatialRescaler,
        TransformerEmbedder,
    )
    from sd_tpu.models.unet import UNetConfig, UNetModel
    from sd_tpu.models.vae import AutoencoderKL, IdentityFirstStage, VQModel

    @register_target(
        "ldm.modules.diffusionmodules.openaimodel.UNetModel",
        "sd_tpu.models.unet.UNetModel",
    )
    def _unet(p):
        return UNetModel(config=UNetConfig.from_dict(p))

    @register_target(
        "ldm.models.autoencoder.AutoencoderKL", "sd_tpu.models.vae.AutoencoderKL"
    )
    def _kl(p):
        return AutoencoderKL(ddconfig=p["ddconfig"], embed_dim=p["embed_dim"])

    @register_target(
        "ldm.models.autoencoder.VQModelInterface",
        "ldm.models.autoencoder.VQModel",
        "sd_tpu.models.vae.VQModel",
    )
    def _vq(p):
        return VQModel(
            ddconfig=p["ddconfig"], n_embed=p["n_embed"], embed_dim=p["embed_dim"]
        )

    @register_target(
        "ldm.models.autoencoder.IdentityFirstStage",
        "sd_tpu.models.vae.IdentityFirstStage",
    )
    def _ident(p):
        return IdentityFirstStage()

    @register_target(
        "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
        "sd_tpu.models.clip.CLIPTextModel",
    )
    def _clip(p):
        return CLIPTextModel(CLIP_VIT_L_14_TEXT)

    @register_target(
        "ldm.modules.encoders.modules.ClassEmbedder",
        "sd_tpu.models.encoders.ClassEmbedder",
    )
    def _classemb(p):
        return ClassEmbedder(
            embed_dim=p["embed_dim"], n_classes=p.get("n_classes", 1000)
        )

    @register_target(
        "ldm.modules.encoders.modules.BERTEmbedder",
        "sd_tpu.models.encoders.BERTEmbedder",
    )
    def _bert(p):
        return BERTEmbedder(
            n_embed=p["n_embed"], n_layer=p["n_layer"],
            vocab_size=p.get("vocab_size", 30522),
            max_seq_len=p.get("max_seq_len", 77),
        )

    @register_target(
        "ldm.modules.encoders.modules.TransformerEmbedder",
        "sd_tpu.models.encoders.TransformerEmbedder",
    )
    def _tfe(p):
        return TransformerEmbedder(
            n_embed=p["n_embed"], n_layer=p["n_layer"],
            vocab_size=p.get("vocab_size", 30522),
            max_seq_len=p.get("max_seq_len", 77),
        )

    @register_target(
        "ldm.modules.encoders.modules.SpatialRescaler",
        "sd_tpu.models.encoders.SpatialRescaler",
    )
    def _rescaler(p):
        return SpatialRescaler(**p)

    # ------------------------------------------------------ data targets
    def _data(name, cls_path):
        @register_target(name, cls_path and f"sd_tpu.data.{cls_path}")
        def _build(p):
            import importlib

            mod_name, cls_name = cls_path.rsplit(".", 1)
            mod = importlib.import_module(f"sd_tpu.data.{mod_name}")
            return getattr(mod, cls_name)(**p)

    for ref, ours in [
        ("ldm.data.lsun.LSUNChurchesTrain", "lsun.LSUNChurchesTrain"),
        ("ldm.data.lsun.LSUNChurchesValidation", "lsun.LSUNChurchesValidation"),
        ("ldm.data.lsun.LSUNBedroomsTrain", "lsun.LSUNBedroomsTrain"),
        ("ldm.data.lsun.LSUNBedroomsValidation", "lsun.LSUNBedroomsValidation"),
        ("ldm.data.lsun.LSUNCatsTrain", "lsun.LSUNCatsTrain"),
        ("ldm.data.lsun.LSUNCatsValidation", "lsun.LSUNCatsValidation"),
        ("ldm.data.imagenet.ImageNetTrain", "imagenet.ImageNetTrain"),
        ("ldm.data.imagenet.ImageNetValidation", "imagenet.ImageNetValidation"),
        ("ldm.data.imagenet.ImageNetSRTrain", "imagenet.ImageNetSRTrain"),
        ("ldm.data.imagenet.ImageNetSRValidation", "imagenet.ImageNetSRValidation"),
        ("sd_tpu.data.synthetic.SyntheticImages", "synthetic.SyntheticImages"),
        ("sd_tpu.data.synthetic.ColoredShapes", "synthetic.ColoredShapes"),
    ]:
        _data(ref, ours)

    @register_target("sd_tpu.training.trainer.DataModuleFromConfig",
                     "main.DataModuleFromConfig")
    def _datamodule(p):
        from sd_tpu.training.trainer import DataModuleFromConfig

        return DataModuleFromConfig(**p)

    # ----------------------------------------------------- LR schedulers
    @register_target("ldm.lr_scheduler.LambdaLinearScheduler",
                     "sd_tpu.training.lr_schedules.lambda_linear")
    def _lambda_linear(p):
        from sd_tpu.training.lr_schedules import lambda_linear

        return lambda_linear(p["warm_up_steps"], p["f_min"], p["f_max"],
                             p["f_start"], p["cycle_lengths"])

    @register_target("ldm.lr_scheduler.LambdaWarmUpCosineScheduler2",
                     "sd_tpu.training.lr_schedules.lambda_warmup_cosine2")
    def _lambda_cos2(p):
        from sd_tpu.training.lr_schedules import lambda_warmup_cosine2

        return lambda_warmup_cosine2(p["warm_up_steps"], p["f_min"],
                                     p["f_max"], p["f_start"],
                                     p["cycle_lengths"])

    @register_target("ldm.lr_scheduler.LambdaWarmUpCosineScheduler",
                     "sd_tpu.training.lr_schedules.lambda_warmup_cosine")
    def _lambda_cos(p):
        from sd_tpu.training.lr_schedules import lambda_warmup_cosine

        return lambda_warmup_cosine(p["warm_up_steps"], p["lr_min"],
                                    p["lr_max"], p["lr_start"],
                                    p["max_decay_steps"])

    @register_target(
        "ldm.models.diffusion.ddpm.LatentDiffusion",
        "ldm.models.diffusion.ddpm.Layout2ImgDiffusion",
        "sd_tpu.models.ldm.LatentDiffusion",
    )
    def _ldm(p, init_params: bool = False, rng=None, state_dict=None):
        # Layout2ImgDiffusion == LatentDiffusion + bbox conditioning in the
        # data layer + bbox plots in log_images (ddpm.py:1424-1445)
        return build_latent_diffusion(
            {"target": "ldm.models.diffusion.ddpm.LatentDiffusion", "params": p},
            rng=rng, init_params=init_params, state_dict=state_dict,
        )

    @register_target("torch.nn.Identity")
    def _identity(p):
        return lambda x, *a, **k: x

    @register_target("ldm.modules.losses.contperceptual.DummyLoss")
    def _dummy_loss(p):
        return dict(kind="dummy_loss")

    # Datasets the reference references but does not ship (SURVEY §2.7
    # "missing-in-repo datasets" — the data layer is pluggable by target)
    for missing in [
        "ldm.data.openimages.FullOpenImagesTrain",
        "ldm.data.openimages.FullOpenImagesValidation",
        "ldm.data.openimages.SuperresOpenImagesAdvancedTrain",
        "ldm.data.openimages.SuperresOpenImagesAdvancedValidation",
        "ldm.data.openimages.OpenImagesBBoxTrain",
        "ldm.data.openimages.OpenImagesBBoxValidation",
        "ldm.data.landscapes.RFWTrain",
        "ldm.data.landscapes.RFWValidation",
        "ldm.data.faceshq.FFHQTrain",
        "ldm.data.faceshq.FFHQValidation",
        "ldm.data.faceshq.CelebAHQTrain",
        "ldm.data.faceshq.CelebAHQValidation",
        "taming.data.faceshq.FFHQTrain",
        "taming.data.faceshq.FFHQValidation",
        "taming.data.faceshq.CelebAHQTrain",
        "taming.data.faceshq.CelebAHQValidation",
        "ldm.data.previews.pytorch_dataset.PreviewsTrain",
        "ldm.data.previews.pytorch_dataset.PreviewsValidation",
    ]:
        def _missing(p, _name=missing):
            raise NotImplementedError(
                f"dataset target {_name!r} is a pluggable external dataset "
                f"(absent from the reference repo too); provide your own via "
                f"register_target."
            )

        _REGISTRY[missing] = _missing

    # losses (instantiated by VAE training configs)
    @register_target("ldm.modules.losses.LPIPSWithDiscriminator",
                     "ldm.modules.losses.contperceptual.LPIPSWithDiscriminator")
    def _kl_loss_cfg(p):
        return dict(kind="lpips_with_discriminator", **p)

    @register_target("taming.modules.losses.vqperceptual.VQLPIPSWithDiscriminator",
                     "ldm.modules.losses.vqperceptual.VQLPIPSWithDiscriminator")
    def _vq_loss_cfg(p):
        return dict(kind="vq_lpips_with_discriminator", **p)


_register_builtins()


# ------------------------------------------------------------- model builder


def build_latent_diffusion(
    model_cfg: Dict,
    rng: Optional[jax.Array] = None,
    init_params: bool = True,
    state_dict: Optional[Dict[str, np.ndarray]] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    weight_quant_overlay: bool = True,
):
    """Build a :class:`sd_tpu.models.ldm.LatentDiffusion` from a reference-style
    model config node (the ``model:`` section of the shipped YAMLs).

    ``init_params=True`` random-initializes everything (for training/tests);
    passing ``state_dict`` ports a reference checkpoint instead
    (``ddpm.py:186-202``-equivalent load, via the per-model port layers).

    ``compute_dtype`` rebinds every stage's module dtype and casts the float
    param leaves — the inference-precision policy (pipelines pass bf16,
    matching the reference's fp16 ``autocast`` sampling scope,
    ``txt2img.py:288-343``; norm/softmax fp32 islands stay inside the
    modules). Default None keeps fp32 — the training/parity default.
    """
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.clip import CLIP_VIT_L_14_TEXT, port_clip_text
    from sd_tpu.models.encoders import ClassEmbedder
    from sd_tpu.models.ldm import LatentDiffusion
    from sd_tpu.models.unet import port_unet
    from sd_tpu.models.vae import (
        AutoencoderKL,
        IdentityFirstStage,
        VQModel,
        port_autoencoder_kl,
        port_vq_model,
    )

    p = dict(model_cfg.get("params") or {})
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    schedule = DiffusionSchedule.create(
        timesteps=p.get("timesteps", 1000),
        beta_schedule=p.get("beta_schedule", "linear"),
        linear_start=p.get("linear_start", 1e-4),
        linear_end=p.get("linear_end", 2e-2),
        cosine_s=p.get("cosine_s", 8e-3),
        v_posterior=p.get("v_posterior", 0.0),
        parameterization=p.get("parameterization", "eps"),
    )

    def _rebind_dtype(module):
        if (compute_dtype is not None and module is not None
                and hasattr(module, "dtype") and hasattr(module, "clone")):
            return module.clone(dtype=compute_dtype)
        return module

    unet = _rebind_dtype(instantiate_from_config(p["unet_config"]))
    ucfg = unet.config
    image_size = p.get("image_size", ucfg.image_size)
    channels = p.get("channels", ucfg.in_channels)

    first_stage = None
    if "first_stage_config" in p:
        first_stage = _rebind_dtype(
            instantiate_from_config(p["first_stage_config"]))

    cond_cfg = p.get("cond_stage_config")
    conditioning_key = p.get("conditioning_key")
    if conditioning_key is None and cond_cfg not in (None, UNCONDITIONAL_SENTINEL):
        conditioning_key = "crossattn"  # LDM default (ddpm.py:437-441)
    cond_stage = None
    cond_is_first_stage = False
    if cond_cfg == UNCONDITIONAL_SENTINEL or cond_cfg is None:
        conditioning_key = None
    elif cond_cfg == FIRST_STAGE_SENTINEL:
        cond_stage = first_stage  # share (ddpm.py:509-515)
        cond_is_first_stage = True
    else:
        cond_stage = _rebind_dtype(instantiate_from_config(cond_cfg))

    # ------------------------------------------------------ parameters
    unet_params = first_params = cond_params = None
    if state_dict is not None:
        unet_params = port_unet(state_dict, ucfg, prefix="model.diffusion_model.")
        if isinstance(first_stage, AutoencoderKL):
            first_params = port_autoencoder_kl(
                state_dict, first_stage.ddconfig, prefix="first_stage_model."
            )
        elif isinstance(first_stage, VQModel):
            first_params = port_vq_model(
                state_dict, first_stage.ddconfig, prefix="first_stage_model."
            )
        if cond_is_first_stage:
            cond_params = first_params
        elif cond_stage is not None and any(
            k.startswith("cond_stage_model.transformer.text_model.")
            for k in state_dict
        ):
            cond_params = port_clip_text(
                state_dict, CLIP_VIT_L_14_TEXT,
                prefix="cond_stage_model.transformer.text_model.",
            )
    elif init_params:
        r_unet, r_first, r_cond = jax.random.split(rng, 3)
        latent = jnp.zeros((1, image_size, image_size, channels))
        t0 = jnp.zeros((1,), jnp.int32)
        ctx = None
        y = None
        if conditioning_key in ("crossattn", "hybrid") and ucfg.context_dim:
            ctx = jnp.zeros((1, 77, ucfg.context_dim))
        if conditioning_key == "adm":
            y = jnp.zeros((1,), jnp.int32)
        xin = latent
        if conditioning_key in ("concat", "hybrid"):
            xin = jnp.zeros((1, image_size, image_size, ucfg.in_channels))
        unet_params = unet.init(r_unet, xin, t0, ctx, y)["params"]

        if first_stage is not None and not isinstance(first_stage, IdentityFirstStage):
            res = first_stage.ddconfig["resolution"]
            img = jnp.zeros((1, res, res, first_stage.ddconfig["in_channels"]))
            first_params = first_stage.init(r_first, img)["params"]
        if cond_is_first_stage:
            cond_params = first_params
        elif cond_stage is not None:
            cond_in = _example_cond_input(cond_stage)
            cond_params = cond_stage.init(r_cond, cond_in)["params"]

    if compute_dtype is not None:
        def _cast(tree):
            if tree is None:
                return None
            return jax.tree.map(
                lambda x: jnp.asarray(x).astype(compute_dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else jnp.asarray(x), tree)

        unet_params = _cast(unet_params)
        first_params = _cast(first_params)
        cond_params = (first_params if cond_is_first_stage
                       else _cast(cond_params))

    ldm = LatentDiffusion(
        unet=unet,
        unet_params=unet_params,
        schedule=schedule,
        first_stage_model=first_stage,
        first_stage_params=first_params,
        cond_stage_model=cond_stage,
        cond_stage_params=cond_params,
        conditioning_key=conditioning_key,
        scale_factor=p.get("scale_factor", 1.0),
        parameterization=p.get("parameterization", "eps"),
        cond_stage_key=p.get("cond_stage_key", "caption"),
    )
    if weight_quant_overlay:
        ldm = maybe_weight_quant_overlay(ldm, compute_dtype)
    return ldm


def maybe_weight_quant_overlay(ldm, compute_dtype=None):
    """Attach the load-time int8 weight overlay when the int8 serving mode
    is active (ops/quant.py::prequantize_weights — bitwise the inline math,
    hoisted out of sampler scan programs; tools/exp_wq_hoist.py). No-op
    unless an int8 weight bucket would dispatch (SD_TPU_INT8 + TPU + bf16;
    SD_TPU_WQ_HOIST=0 opts out)."""
    import dataclasses

    from sd_tpu.ops.quant import prequantize_weights, wq_hoist_wanted

    if not wq_hoist_wanted():
        return ldm
    cdt = compute_dtype if compute_dtype is not None else jnp.float32
    return dataclasses.replace(
        ldm,
        unet_qw=prequantize_weights(ldm.unet_params, cdt),
        first_stage_qw=(
            prequantize_weights(ldm.first_stage_params, cdt)
            if ldm.first_stage_params is not None else None),
    )


def build_latent_diffusion_from_run(
    run_path: str,
    config_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    use_ema: bool = True,
):
    """Build an inference-ready LDM from a framework training run.

    The analog of the reference's load-from-logdir inference
    (``scripts/sample_diffusion.py:108-140``): resolve the run's checkpoint
    (``last``/highest step), restore the TRAINABLE params (EMA shadow by
    default — the release convention), rebuild the frozen stages from the
    run's dumped config + recorded seed (they are not part of the trainable
    checkpoint in this framework), and apply the sidecar ``scale_factor``
    (the scale_by_std calibration, ``ddpm.py:476-491``).

    Returns ``(ldm, meta)``. Raises on anything unresolvable — a run dir
    must never silently sample random weights (VERDICT r4 weak #3).
    """
    from sd_tpu.utils.checkpoint import load_run_params, run_config_path

    params, meta = load_run_params(run_path, use_ema=use_ema)
    config_path = config_path or run_config_path(run_path)
    if config_path is None:
        raise FileNotFoundError(
            f"no model config for run {run_path!r}: the logdir has no "
            f"configs/project.yaml — pass --config explicitly")
    cfg = load_yaml(config_path)
    model_cfg = cfg["model"] if "model" in cfg else cfg

    if rng is None:
        seed = meta.get("seed")
        if seed is None:
            print("build_latent_diffusion_from_run: run predates seed "
                  "sidecars — frozen stages use seed 23 (main.py default); "
                  "pass rng explicitly if the run used another",
                  flush=True)
            seed = 23
        rng = jax.random.PRNGKey(int(seed))

    # overlay deferred: the restored params replace the random init below,
    # and a stale overlay would silently serve the wrong int8 weights
    ldm = build_latent_diffusion(model_cfg, rng=rng, init_params=True,
                                 compute_dtype=compute_dtype,
                                 weight_quant_overlay=False)

    def _cast(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(x).astype(compute_dtype)
            if compute_dtype is not None
            and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else jnp.asarray(x), tree)

    rebind: Dict[str, Any] = {"unet_params": _cast(params["unet"])}
    if "cond_stage" in params:  # cond_stage_trainable runs checkpoint it too
        rebind["cond_stage_params"] = _cast(params["cond_stage"])
    if meta.get("scale_factor") is not None:
        rebind["scale_factor"] = float(meta["scale_factor"])
    import dataclasses

    ldm = maybe_weight_quant_overlay(dataclasses.replace(ldm, **rebind),
                                     compute_dtype)
    src = meta.get("params_source", "current")
    print(f"Restored {src} params from run {run_path} "
          f"(step {meta.get('step')}, scale_factor={ldm.scale_factor})",
          flush=True)
    return ldm, meta


def _example_cond_input(cond_stage):
    from sd_tpu.models.clip import CLIPTextModel
    from sd_tpu.models.encoders import (
        BERTEmbedder,
        ClassEmbedder,
        SpatialRescaler,
        TransformerEmbedder,
    )

    if isinstance(cond_stage, (CLIPTextModel,)):
        return jnp.zeros((1, 77), jnp.int32)
    if isinstance(cond_stage, (BERTEmbedder, TransformerEmbedder)):
        return jnp.zeros((1, cond_stage.max_seq_len), jnp.int32)
    if isinstance(cond_stage, ClassEmbedder):
        return jnp.zeros((1,), jnp.int32)
    if isinstance(cond_stage, SpatialRescaler):
        return jnp.zeros((1, 32, 32, cond_stage.in_channels))
    raise NotImplementedError(type(cond_stage))
