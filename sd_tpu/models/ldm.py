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

    # ------------------------------------------------------------- UNet

    def apply_model(self, x, t, cond) -> jnp.ndarray:
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
        """Image -> posterior / latent (unscaled). Ref: ``ddpm.py:825-858``."""
        m = self.first_stage_model
        if m is None or isinstance(m, IdentityFirstStage):
            return x
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
