"""img2img (SDEdit) and inpainting pipelines.

Reference flows (SURVEY.md §3.3):
- img2img (``scripts/img2img.py``): encode init image -> q_sample to
  ``t_enc = strength * steps`` on the DDIM grid -> partial reverse loop.
- inpaint (``scripts/inpaint.py``): conditioning = VQ-encoded masked image
  channel-concat downsampled mask (UNet in_ch = 7), DDIM, composite
  ``(1-mask)*image + mask*pred``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.ldm import LatentDiffusion
from sd_tpu.pipelines.txt2img import Txt2ImgPipeline, latents_to_images
from sd_tpu.samplers import ddim_decode, ddim_sample, ddim_stochastic_encode

__all__ = ["Img2ImgPipeline", "InpaintPipeline", "preprocess_image", "preprocess_mask"]


def preprocess_image(img: np.ndarray) -> np.ndarray:
    """HWC uint8/float image -> [1, H', W', C] float32 in [-1, 1], H/W
    floored to multiples of 32 (``img2img.py:48-57``)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    h, w = (h // 32) * 32, (w // 32) * 32
    img = img[:h, :w]
    return (img[None] * 2.0 - 1.0).astype(np.float32)


def preprocess_mask(mask: np.ndarray, downsample: int = 8) -> np.ndarray:
    """HW {0,1} mask -> latent-resolution [1, h, w, 1] float32 where
    1 = region to inpaint (``inpaint.py:11-30`` conventions)."""
    mask = np.asarray(mask).astype(np.float32)
    if mask.ndim == 3:
        mask = mask[..., 0]
    h, w = mask.shape
    mh, mw = h // downsample, w // downsample
    small = mask.reshape(mh, downsample, mw, downsample).max(axis=(1, 3))
    return small[None, :, :, None]


@dataclasses.dataclass
class Img2ImgPipeline:
    """Strength-controlled image-to-image translation."""

    base: Txt2ImgPipeline

    def __call__(
        self,
        init_image: np.ndarray,
        prompts: Sequence[str],
        rng,
        strength: float = 0.75,
        steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompts: Optional[Sequence[str]] = None,
    ) -> np.ndarray:
        assert 0.0 <= strength <= 1.0, "strength must be in [0, 1] (img2img.py:236)"
        ldm = self.base.ldm
        prompts = list(prompts)
        b = len(prompts)

        from sd_tpu.pipelines._jit import cached_jit

        rng, k_enc, k_noise, k_dec = jax.random.split(rng, 4)
        x = jnp.asarray(preprocess_image(init_image))
        x = jnp.tile(x, (b, 1, 1, 1))

        cond = self.base.encode_prompts(prompts)
        uncond = self.base.encode_prompts(
            list(negative_prompts) if negative_prompts is not None else [""] * b
        )

        t_enc = int(strength * steps)  # img2img.py:239-241
        # one compiled program per (steps, t_enc, scale): VAE encode ->
        # stochastic encode -> DDIM decode -> image decode. Params flow in
        # as jit args (never closure constants — see Txt2ImgPipeline notes).
        key = ("img2img", steps, t_enc, float(guidance_scale))

        def build():
            def run(p, x, cond, uncond, k_enc, k_noise, k_dec):
                m = ldm.bind_params(p)
                init_latent = m.encode_to_latent(x, rng=k_enc)
                if t_enc == 0:
                    return latents_to_images(m, init_latent)
                z_enc = ddim_stochastic_encode(
                    m.schedule, init_latent, t_enc - 1, k_noise,
                    num_steps=steps)
                z = ddim_decode(
                    m.apply_model, m.schedule, z_enc, cond, t_enc,
                    num_steps=steps, uncond=uncond,
                    guidance_scale=guidance_scale, rng=k_dec)
                return latents_to_images(m, z)

            return jax.jit(run)

        images = np.asarray(jax.device_get(
            cached_jit(self, key, build)(ldm.runtime_params(), x, cond,
                                         uncond, k_enc, k_noise, k_dec)))
        return (images * 255.0 + 0.5).astype(np.uint8)


@dataclasses.dataclass
class InpaintPipeline:
    """Concat-conditioned inpainting (``scripts/inpaint.py`` flow).

    The LDM must be concat-conditioned (UNet in_channels = latent + cond
    channels, e.g. 7 = 3+4 for inpainting_big); the cond stage IS the first
    stage (``__is_first_stage__`` in the shipped config)."""

    ldm: LatentDiffusion
    downsample: int = 8  # inpainting_big uses a VQ-f4 stage -> 4

    def __call__(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        rng,
        steps: int = 50,
    ) -> np.ndarray:
        ldm = self.ldm
        img = jnp.asarray(preprocess_image(image))
        m_full = jnp.asarray(np.asarray(mask, np.float32))[None, :, :, None]
        m_full = m_full[:, : img.shape[1], : img.shape[2]]
        masked = img * (1.0 - m_full)

        from sd_tpu.pipelines._jit import cached_jit

        m_lat = jnp.asarray(preprocess_mask(np.asarray(mask), self.downsample))

        # one compiled program per step count (shapes auto-retrace):
        # cond-encode -> DDIM sample -> decode -> composite (inpaint.py:76-98)
        def build():
            def run(p, img, masked, m_full, m_lat, rng):
                m = ldm.bind_params(p)
                c_img = m.get_first_stage_encoding(
                    m.encode_first_stage(masked))
                cond = {"c_concat": jnp.concatenate([c_img, m_lat], axis=-1)}
                shape = (1, c_img.shape[1], c_img.shape[2], c_img.shape[3])
                z, _ = ddim_sample(
                    m.apply_model, m.schedule, shape, cond, rng,
                    num_steps=steps)
                pred = latents_to_images(m, z)
                img01 = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
                return (1.0 - m_full) * img01 + m_full * pred

            return jax.jit(run)

        out = cached_jit(self, ("inpaint", steps), build)(
            ldm.runtime_params(), img, masked, m_full, m_lat, rng)
        out = np.asarray(jax.device_get(out))
        return (out * 255.0 + 0.5).astype(np.uint8)
