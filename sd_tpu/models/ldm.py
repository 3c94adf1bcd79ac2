"""LatentDiffusion — the main model: diffusion in a frozen autoencoder's
latent space with pluggable conditioning.

Functional rebuild of the reference's model layer
(``ldm/models/diffusion/ddpm.py:424-1445``): instead of a stateful Lightning
module, :class:`LatentDiffusion` is a plain container of (module defs +
param pytrees + schedule + policy scalars) whose methods are pure and
jittable. The pieces:

- conditioning-mode dispatch (``DiffusionWrapper``, ``ddpm.py:1395-1421``
  and the key table ``ddpm.py:29-31``): None / concat / crossattn / hybrid /
  adm;
- first-stage encode/decode with the latent ``scale_factor``
  (``ddpm.py:542-549,705-713,825-858``), incl. the VQModelInterface
  force-not-quantize decode path;
- ``get_learned_conditioning`` (``ddpm.py:551-562``);
- ``apply_model`` — the single hot entry to the UNet (``ddpm.py:891``).

Training losses live in ``sd_tpu/training``; samplers in ``sd_tpu/samplers``
take ``ldm.apply_model`` as their eps model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.distributions import DiagonalGaussian
from sd_tpu.core.schedules import DiffusionSchedule, q_sample
from sd_tpu.models.unet import UNetConfig, UNetModel
from sd_tpu.models.vae import AutoencoderKL, IdentityFirstStage, VQModel

__all__ = ["LatentDiffusion", "CONDITIONING_KEYS"]

# conditioning_key -> batch key the wrapper consumes (ddpm.py:29-31)
CONDITIONING_KEYS = {"concat": "c_concat", "crossattn": "c_crossattn", "adm": "y"}


@dataclasses.dataclass
class LatentDiffusion:
    """Bundle of modules + params forming the latent diffusion model.

    ``first_stage_model``/``cond_stage_model`` are module instances (or
    callables); ``*_params`` their pytrees. ``cond_stage_model`` may be None
    for unconditional models.
    """

    unet: UNetModel
    unet_params: Any
    schedule: DiffusionSchedule
    first_stage_model: Any = None
    first_stage_params: Any = None
    cond_stage_model: Any = None
    cond_stage_params: Any = None
    conditioning_key: Optional[str] = "crossattn"
    scale_factor: float = 1.0
    parameterization: str = "eps"
    # cond_stage_key tells pipelines which batch entry feeds the cond stage
    cond_stage_key: str = "caption"
    # sliding-window tiling for large canvases (the reference's
    # split_input_params, ddpm.py:601-651): dict(ks, stride, vqf) or None
    split_input_params: Optional[Dict[str, Any]] = None

    # ------------------------------------------------------------- UNet

    def _tiled(self, fn, x, out_scale: int = 1):
        """Apply fn over overlapping tiles when split_input_params is set
        (the fold/unfold path of ddpm.py:902-984 / 715-757 / 825-858)."""
        from sd_tpu.pipelines.tiled import tiled_apply

        p = self.split_input_params
        ks = p["ks"][0] if isinstance(p.get("ks"), (tuple, list)) else p.get("ks", 128)
        stride = (p["stride"][0] if isinstance(p.get("stride"), (tuple, list))
                  else p.get("stride", 64))
        return tiled_apply(
            fn, x, ks=min(ks, x.shape[1]), stride=stride, out_scale=out_scale,
            clip_min=p.get("clip_min_weight", 0.01),
            clip_max=p.get("clip_max_weight", 0.5),
        )

    def apply_model(self, x, t, cond) -> jnp.ndarray:
        if self.split_input_params is not None and self.conditioning_key in (None, "crossattn"):
            b = x.shape[0]

            def per_tile(patches):
                # patches are batch-major [B*P, ...]: each element's P tiles
                # are contiguous -> repeat-interleave t and cond
                reps = patches.shape[0] // b
                t_rep = jnp.repeat(t, reps, axis=0)
                c_rep = jax.tree.map(
                    lambda c: jnp.repeat(c, reps, axis=0), cond
                ) if cond is not None else None
                return self._apply_model_inner(patches, t_rep, c_rep)

            return self._tiled(per_tile, x)
        return self._apply_model_inner(x, t, cond)

    def _apply_model_inner(self, x, t, cond) -> jnp.ndarray:
        """Conditioning-mode dispatch around the UNet. Ref: ``ddpm.py:1395-1421``.

        ``cond`` may be:
        - None (unconditional),
        - a tensor (interpreted via ``conditioning_key``),
        - a dict with 'c_concat' / 'c_crossattn' / 'y' lists or tensors.
        """
        key = self.conditioning_key
        if cond is not None and not isinstance(cond, dict):
            cond = {CONDITIONING_KEYS.get(key, "c_crossattn"): cond}
        cond = cond or {}

        def get(name):
            v = cond.get(name)
            if v is None:
                return None
            if isinstance(v, (list, tuple)):
                v = jnp.concatenate(v, axis=-1) if name != "y" else v[0]
            return v

        c_concat = get("c_concat")
        c_crossattn = get("c_crossattn")
        y = get("y")

        if key is None:
            return self.unet.apply({"params": self.unet_params}, x, t)
        if key == "concat":
            xc = jnp.concatenate([x, c_concat], axis=-1)
            return self.unet.apply({"params": self.unet_params}, xc, t)
        if key == "crossattn":
            return self.unet.apply({"params": self.unet_params}, x, t, c_crossattn)
        if key == "hybrid":
            xc = jnp.concatenate([x, c_concat], axis=-1)
            return self.unet.apply({"params": self.unet_params}, xc, t, c_crossattn)
        if key == "adm":
            return self.unet.apply({"params": self.unet_params}, x, t, None, y)
        raise NotImplementedError(f"conditioning_key {key}")

    # ----------------------------------------------------- first stage

    def encode_first_stage(self, x) -> Any:
        """Image -> posterior / latent (unscaled). Ref: ``ddpm.py:825-858``
        (incl. the patch-distributed tiled path when split_input_params has
        patch_distributed_vq)."""
        m = self.first_stage_model
        if m is None or isinstance(m, IdentityFirstStage):
            return x
        p = self.split_input_params
        if p is not None and p.get("patch_distributed_vq"):
            vqf = p.get("vqf", 4)
            ks = p["ks"][0] if isinstance(p.get("ks"), (tuple, list)) else p.get("ks", 128)

            def enc_tile(patches):
                if isinstance(m, VQModel):
                    return m.apply({"params": self.first_stage_params}, patches,
                                   method=m.encode_pre_quant)
                moments_model = m.apply({"params": self.first_stage_params},
                                        patches, method=m.encode)
                return jnp.concatenate(
                    [moments_model.mean, moments_model.logvar], axis=-1)

            out = self._tiled(enc_tile, x, out_scale=1.0 / vqf)
            if isinstance(m, VQModel):
                return out
            from sd_tpu.core.distributions import DiagonalGaussian

            return DiagonalGaussian.from_moments(out)
        if isinstance(m, VQModel):
            return m.apply({"params": self.first_stage_params}, x,
                           method=m.encode_pre_quant)
        return m.apply({"params": self.first_stage_params}, x, method=m.encode)

    def get_first_stage_encoding(self, encoding, rng=None) -> jnp.ndarray:
        """Sample/pass-through + scale. Ref: ``ddpm.py:542-549``."""
        if isinstance(encoding, DiagonalGaussian):
            z = encoding.sample(rng) if rng is not None else encoding.mode()
        else:
            z = encoding
        return self.scale_factor * z

    def encode_to_latent(self, x, rng=None) -> jnp.ndarray:
        return self.get_first_stage_encoding(self.encode_first_stage(x), rng)

    def decode_first_stage(self, z, force_not_quantize: bool = True) -> jnp.ndarray:
        """Latent -> image. Ref: ``ddpm.py:705-713`` (1/scale, then decode;
        VQModelInterface decodes pre-quant latents with quantization inside,
        ``ddpm.py:708-710`` passes force_not_quantize=False for predicted ids
        only — the standard path quantizes)."""
        z = z / self.scale_factor
        m = self.first_stage_model
        if m is None or isinstance(m, IdentityFirstStage):
            return z
        p = self.split_input_params
        if p is not None and p.get("patch_distributed_vq"):
            vqf = p.get("vqf", 4)
            ks_img = (p["ks"][0] if isinstance(p.get("ks"), (tuple, list))
                      else p.get("ks", 128))

            def dec_tile(patches):
                if isinstance(m, VQModel):
                    return m.apply({"params": self.first_stage_params}, patches,
                                   not force_not_quantize and True,
                                   method=m.decode)
                return m.apply({"params": self.first_stage_params}, patches,
                               method=m.decode)

            from sd_tpu.pipelines.tiled import tiled_apply

            stride = (p["stride"][0] if isinstance(p.get("stride"), (tuple, list))
                      else p.get("stride", 64))
            return tiled_apply(
                dec_tile, z, ks=min(ks_img // vqf, z.shape[1]),
                stride=max(stride // vqf, 1), out_scale=vqf,
                clip_min=p.get("clip_min_weight", 0.01),
                clip_max=p.get("clip_max_weight", 0.5),
            )
        if isinstance(m, VQModel):
            return m.apply({"params": self.first_stage_params}, z,
                           not force_not_quantize and True, method=m.decode)
        return m.apply({"params": self.first_stage_params}, z, method=m.decode)

    # ------------------------------------------------------ cond stage

    def get_learned_conditioning(self, c) -> jnp.ndarray:
        """Run the conditioning encoder. Ref: ``ddpm.py:551-562``.

        ``c`` is whatever the cond stage consumes: token ids for CLIP/BERT,
        class ids, images, segmentation maps. Models exposing ``encode`` use
        it (the reference's duck-typing), else they're called directly.
        """
        m = self.cond_stage_model
        if m is None:
            return c
        if hasattr(m, "encode") and hasattr(m, "apply"):
            return m.apply({"params": self.cond_stage_params}, c, method=m.encode)
        if hasattr(m, "apply"):
            return m.apply({"params": self.cond_stage_params}, c)
        return m(c)

    # ------------------------------------------------------- diffusion

    def q_sample(self, x_start, t, noise) -> jnp.ndarray:
        return q_sample(self.schedule, x_start, t, noise)

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    def eps_model(self) -> Callable:
        """The sampler-facing model fn (x, t, cond) -> eps."""
        return self.apply_model

    def with_params(self, unet_params) -> "LatentDiffusion":
        """Functional ``ema_scope`` (``ddpm.py:171-184``): evaluating with EMA
        weights is just binding the shadow pytree — no store/copy/restore."""
        return dataclasses.replace(self, unet_params=unet_params)

    def make_quantize_fn(self) -> Optional[Callable]:
        """x0-quantization hook for the samplers' ``quantize_x0``
        (``ddim.py:197-198``): pass pred_x0 through the VQ codebook."""
        m = self.first_stage_model
        if not isinstance(m, VQModel):
            return None

        def quantize(x0):
            z_q, _, _ = m.apply(
                {"params": self.first_stage_params}, x0 / self.scale_factor,
                method=m.quantize_latent,
            )
            return z_q * self.scale_factor

        return quantize
