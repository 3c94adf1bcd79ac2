"""Super-resolution pipeline — rebuild of the reference's notebook demo
(``notebook_helpers.py:107-268``): the LDM-SR (bsr) model upsamples a LR
image 4x by diffusing in the f4 latent space conditioned on the LR input
(concat mode), with tiled sliding-window application for inputs >= 128²
(the only activation site of ``split_input_params`` in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.ldm import LatentDiffusion
from sd_tpu.pipelines.tiled import tiled_apply
from sd_tpu.pipelines.txt2img import latents_to_images
from sd_tpu.samplers import ddim_sample

__all__ = ["SuperResPipeline", "prepare_sr_cond"]


def prepare_sr_cond(lr_image: np.ndarray, up_f: int = 4):
    """LR uint8/float HWC -> ([1,h,w,3] in [-1,1] LR cond, target HW).

    Ref: ``notebook_helpers.py:107-124`` — the LR image itself (scaled to
    [-1,1]) is the conditioning; the model upsamples by up_f.
    """
    img = np.asarray(lr_image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    c = img[None] * 2.0 - 1.0
    h, w = img.shape[:2]
    return c.astype(np.float32), (h * up_f, w * up_f)


@dataclasses.dataclass
class SuperResPipeline:
    """Concat-conditioned SR sampling with optional tiling.

    The LDM must be an SR model (concat conditioning on the LR image,
    ``cond_stage_key: LR_image`` — bsr_sr config). ``tile_threshold``
    reproduces the reference's >=128 gate (``notebook_helpers.py:149``).
    """

    ldm: LatentDiffusion
    up_f: int = 4
    vqf: int = 4          # first-stage downsampling factor (bsr_sr is f4)
    tile_threshold: int = 128
    tile_ks: int = 128
    tile_stride: int = 64

    def __call__(self, lr_image: np.ndarray, rng, steps: int = 50,
                 eta: float = 1.0) -> np.ndarray:
        cond_img, (out_h, out_w) = prepare_sr_cond(lr_image, self.up_f)
        h, w = cond_img.shape[1:3]

        if max(out_h, out_w) >= self.tile_threshold and (
            out_h > self.tile_ks or out_w > self.tile_ks
        ):
            # tile in OUTPUT space: each output tile conditions on the
            # corresponding LR patch (ks/up_f) — the split_input_params path
            lr_ks = self.tile_ks // self.up_f
            lr_stride = self.tile_stride // self.up_f

            def denoise_tile(lr_patches):
                return self._sample(jnp.asarray(lr_patches), rng, steps, eta)

            out = tiled_apply(
                denoise_tile, jnp.asarray(cond_img), ks=lr_ks, stride=lr_stride,
                out_scale=self.up_f,
            )
        else:
            out = self._sample(jnp.asarray(cond_img), rng, steps, eta)
        out = np.asarray(jax.device_get(jnp.clip((out + 1.0) / 2.0, 0, 1)))
        return (out * 255.0 + 0.5).astype(np.uint8)

    def _sample(self, cond_img, rng, steps, eta):
        """cond_img [N, h, w, 3] -> upsampled [N, h*f, w*f, 3] in [-1,1].

        One compiled program per (steps, eta); jax.jit retraces per patch
        shape (sd_tpu/pipelines/_jit.py rationale)."""
        from sd_tpu.pipelines._jit import cached_jit

        ldm = self.ldm

        def build():
            def run(p, cond_img, rng):
                m = ldm.bind_params(p)
                n, h, w, _ = cond_img.shape
                # the SR LDM diffuses in an f(vqf) latent over the OUTPUT
                # resolution; for bsr_sr up_f == vqf == 4 -> latent hw == LR hw
                shape = (n, h * self.up_f // self.vqf,
                         w * self.up_f // self.vqf,
                         m.unet.config.out_channels)
                cond = {"c_concat": jax.image.resize(
                    cond_img, (n,) + shape[1:3] + (3,), method="bicubic")}
                z, _ = ddim_sample(m.apply_model, m.schedule, shape, cond,
                                   rng, num_steps=steps, eta=eta)
                return m.decode_first_stage(z)

            return jax.jit(run)

        return cached_jit(self, ("sr_sample", steps, float(eta)), build)(
            ldm.runtime_params(), cond_img, rng)
