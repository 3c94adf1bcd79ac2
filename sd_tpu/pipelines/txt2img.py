"""txt2img — the flagship inference pipeline (``scripts/txt2img.py`` rebuild).

Reference flow (SURVEY.md §3.2): tokenize -> CLIP encode (cond + empty-string
uncond) -> sampler loop with CFG (PLMS default, 50 steps, scale 7.5, 512²)
-> VAE decode -> safety check -> watermark -> PNG.

TPU design: three compiled programs — text encode, the full S-step sampler
scan, and the VAE decode — executed back-to-back on device; only tokenization
and PNG IO touch the host. Batches are CFG-doubled inside the scan, not here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.ldm import LatentDiffusion
from sd_tpu.samplers import ddim_sample, dpm_solver_sample, plms_sample

__all__ = ["Txt2ImgPipeline", "latents_to_images"]


def latents_to_images(ldm: LatentDiffusion, latents) -> jnp.ndarray:
    """Decode latents and map [-1, 1] -> [0, 1] (``txt2img.py:313-315``)."""
    x = ldm.decode_first_stage(latents)
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def _to_uint8(images_01) -> jnp.ndarray:
    """[0,1] float -> u8, same rounding as the reference's host-side
    ``(x * 255 + 0.5).astype(uint8)`` (txt2img.py:313-315), on device."""
    x = images_01.astype(jnp.float32) * 255.0 + 0.5
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


@dataclasses.dataclass
class Txt2ImgPipeline:
    """End-to-end text-to-image sampling around a LatentDiffusion bundle.

    ``tokenizer`` maps List[str] -> [B, 77] int32 (host side).
    ``safety_checker``/``watermarker`` are optional postprocess hooks with
    the reference's contracts (``txt2img.py:69-95``): the safety checker
    takes the decoded uint8 batch (device array — scored on device before
    the single fetch), the watermarker maps host uint8 [B,H,W,3] -> same.
    """

    ldm: LatentDiffusion
    tokenizer: Any
    safety_checker: Optional[Callable] = None
    watermarker: Optional[Callable] = None
    latent_channels: int = 4
    downsample: int = 8
    # Optional jax.sharding.Mesh: batch-shards every device program over the
    # 'data' axis (the BASELINE v5e-8 serving scenario — SURVEY §2.10). The
    # conditioning is placed with a NamedSharding before the cached sampler
    # program runs; GSPMD propagates the batch sharding through the scan,
    # decode, and safety scoring. Requires batch % mesh.shape['data'] == 0.
    mesh: Optional[Any] = None

    # --- compiled-program cache -------------------------------------------
    # The samplers are eager `lax.scan` programs whose closures capture fresh
    # constants (schedule tables, conditioning) every call — without caching,
    # EVERY pipeline call recompiles (~15 s/request through the TPU tunnel,
    # measured via scripts/serve.py). Each distinct static configuration
    # (sampler, resolution, steps, scale, eta, arg presence) compiles once;
    # conditioning/rng/x_T flow in as traced arguments.
    #
    # Model params ALSO flow in as traced arguments (fetched fresh from
    # self.ldm at every call): closing the 860M-param bundle over jit embeds
    # it as literal constants — a multi-GB program body the remote-compile
    # tunnel rejects (HTTP 413) and a CSE hazard (see LatentDiffusion
    # .runtime_params). Side benefit: checkpoint/EMA hot-swap never
    # recompiles — rebind self.ldm and the cached programs pick it up.

    def _get_jit(self, key, builder):
        from sd_tpu.pipelines._jit import cached_jit

        return cached_jit(self, key, builder)

    def _shard_batch(self, arr):
        """Place ``arr`` batch-sharded over the mesh's 'data' axis."""
        from jax.sharding import NamedSharding, PartitionSpec

        n = self.mesh.shape["data"]
        assert arr.shape[0] % n == 0, (
            f"batch {arr.shape[0]} not divisible by the mesh data-axis "
            f"size {n}")
        spec = PartitionSpec("data", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _sample_params(self):
        """Param bundles the sampler program needs: the UNet always; every
        stage when the tiled/bbox path may re-encode inside the program."""
        if self.ldm.split_input_params is not None:
            return self.ldm.runtime_params()
        return self.ldm.runtime_params("unet_params")

    def _make_sample_jit(self, sampler, height, width, steps, scale, eta,
                         has_uncond, has_xt):
        def run(p, cond, uncond, rng, x_T):
            return self.sample_latents(
                cond, uncond, rng, height=height, width=width, steps=steps,
                guidance_scale=scale, sampler=sampler, eta=eta, x_T=x_T,
                params=p)

        if has_uncond and has_xt:
            f = jax.jit(run)
            return lambda p, c, u, r, x: f(p, c, u, r, x)
        if has_uncond:
            f = jax.jit(lambda p, c, u, r: run(p, c, u, r, None))
            return lambda p, c, u, r, x: f(p, c, u, r)
        if has_xt:
            f = jax.jit(lambda p, c, r, x: run(p, c, None, r, x))
            return lambda p, c, u, r, x: f(p, c, r, x)
        f = jax.jit(lambda p, c, r: run(p, c, None, r, None))
        return lambda p, c, u, r, x: f(p, c, r)

    def encode_prompts(self, prompts: Sequence[str]) -> jnp.ndarray:
        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        encode = self._get_jit(
            "encode", lambda: jax.jit(
                lambda p, tok: self.ldm.bind_params(p)
                .get_learned_conditioning(tok)))
        return encode(self.ldm.runtime_params("cond_stage_params"), tokens)

    def sample_latents(
        self,
        cond,
        uncond,
        rng,
        height: int = 512,
        width: int = 512,
        steps: int = 50,
        guidance_scale: float = 7.5,
        sampler: str = "plms",
        eta: float = 0.0,
        x_T=None,
        params=None,
    ):
        ldm = self.ldm if params is None else self.ldm.bind_params(params)
        b = cond.shape[0] if hasattr(cond, "shape") else jax.tree.leaves(cond)[0].shape[0]
        shape = (b, height // self.downsample, width // self.downsample,
                 self.latent_channels)
        common = dict(cond=cond, uncond=uncond, guidance_scale=guidance_scale,
                      rng=rng, x_T=x_T)
        if sampler == "plms":
            z, _ = plms_sample(ldm.apply_model, ldm.schedule, shape,
                               num_steps=steps, **common)
        elif sampler == "ddim":
            z, _ = ddim_sample(ldm.apply_model, ldm.schedule, shape,
                               num_steps=steps, eta=eta, **common)
        elif sampler in ("dpm", "dpm_solver", "dpmsolver"):
            z = dpm_solver_sample(ldm.apply_model, ldm.schedule, shape,
                                  num_steps=steps, **common)
        else:
            raise ValueError(f"unknown sampler {sampler!r}")
        return z

    def _issue(
        self,
        prompts: Sequence[str],
        rng,
        negative_prompts: Optional[Sequence[str]] = None,
        height: int = 512,
        width: int = 512,
        steps: int = 50,
        guidance_scale: float = 7.5,
        sampler: str = "plms",
        eta: float = 0.0,
        x_T=None,
    ):
        """Dispatch one request's full device program chain asynchronously:
        encode -> sampler scan -> decode-to-uint8 -> safety scores. Returns
        (device images u8, device flags or None) WITHOUT synchronizing —
        JAX queues the programs, so callers can issue request i+1 before
        fetching request i (see :meth:`map_batches`)."""
        prompts = list(prompts)
        cond = self.encode_prompts(prompts)
        uncond = None
        if guidance_scale != 1.0:
            neg = negative_prompts if negative_prompts is not None else [""] * len(prompts)
            uncond = self.encode_prompts(list(neg))
        if self.mesh is not None:
            cond = self._shard_batch(cond)
            uncond = self._shard_batch(uncond) if uncond is not None else None
            x_T = self._shard_batch(x_T) if x_T is not None else None
        skey = ("sample", sampler, height, width, steps,
                float(guidance_scale), float(eta), uncond is not None,
                x_T is not None)
        sample = self._get_jit(skey, lambda: self._make_sample_jit(
            sampler, height, width, steps, guidance_scale, eta,
            uncond is not None, x_T is not None))
        z = sample(self._sample_params(), cond, uncond, rng, x_T)
        # decode emits uint8 ON DEVICE: the fetch ships 1/4 the bytes of the
        # old float32 path (25 MB -> 6.3 MB at 512² batch 8 — material
        # through the TPU tunnel), and the safety checker scores the device
        # array BEFORE the fetch instead of re-uploading host images.
        decode = self._get_jit(
            "decode", lambda: jax.jit(
                lambda p, z: _to_uint8(
                    latents_to_images(self.ldm.bind_params(p), z))))
        images_dev = decode(self.ldm.runtime_params("first_stage_params"), z)
        scores_dev = (self.safety_checker.nsfw_scores(images_dev)
                      if self.safety_checker is not None else None)
        return images_dev, scores_dev

    def _finish(self, issued) -> np.ndarray:
        """Fetch + host postprocess of an :meth:`_issue` handle: one uint8
        image fetch, tiny flags fetch, placeholder replacement, watermark."""
        images_dev, scores_dev = issued
        if scores_dev is not None:
            flags = np.asarray(jax.device_get(scores_dev))
            images_u8 = np.asarray(jax.device_get(images_dev))
            if flags.any():
                from sd_tpu.pipelines.safety import placeholder_image

                images_u8 = images_u8.copy()
                for i, bad in enumerate(flags):
                    if bad:
                        images_u8[i] = placeholder_image(
                            *images_u8.shape[1:3])
            # per-image flags kept for callers that report them (serve.py);
            # flagged images are already replaced by the checker contract
            self.last_safety_flags = list(map(bool, flags))
        else:
            images_u8 = np.asarray(jax.device_get(images_dev))
            self.last_safety_flags = None
        if self.watermarker is not None:
            # batch contract: [B, H, W, 3] u8 -> [B, H, W, 3] u8
            images_u8 = self.watermarker(images_u8)
        return images_u8

    def __call__(
        self,
        prompts: Sequence[str],
        rng,
        negative_prompts: Optional[Sequence[str]] = None,
        height: int = 512,
        width: int = 512,
        steps: int = 50,
        guidance_scale: float = 7.5,
        sampler: str = "plms",
        eta: float = 0.0,
        x_T=None,
    ) -> np.ndarray:
        """Returns uint8 images [B, H, W, 3]."""
        self.last_safety_flags = None  # reset: no stale flags across calls
        return self._finish(self._issue(
            prompts, rng, negative_prompts=negative_prompts, height=height,
            width=width, steps=steps, guidance_scale=guidance_scale,
            sampler=sampler, eta=eta, x_T=x_T))

    def map_batches(self, requests, depth: int = 2):
        """Pipelined throughput driver: yields uint8 image batches for an
        iterable of request dicts (kwargs for :meth:`__call__`, must include
        ``prompts`` and ``rng``), keeping up to ``depth`` requests in flight
        so host postprocess (fetch, safety replacement, watermark, IO in the
        caller) of batch i overlaps device execution of batch i+1 — JAX
        dispatch is asynchronous, so issuing ahead keeps the chip busy while
        the host works. Steady-state throughput approaches pure device time
        (measured via tools/bench_pipeline.py). Flags for batch i are in
        ``last_safety_flags`` at yield time, as with ``__call__``."""
        from collections import deque

        inflight = deque()
        for req in requests:
            inflight.append(self._issue(**req))
            if len(inflight) >= depth:
                yield self._finish(inflight.popleft())
        while inflight:
            yield self._finish(inflight.popleft())
