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
    # Layout2Img: the bbox tokenizer used for per-patch crop re-tokenization
    # in the tiled path (ddpm.py:929-969)
    bbox_tokenizer: Any = None
    scale_factor: float = 1.0
    parameterization: str = "eps"
    # cond_stage_key tells pipelines which batch entry feeds the cond stage
    cond_stage_key: str = "caption"
    # sliding-window tiling for large canvases (the reference's
    # split_input_params, ddpm.py:601-651): dict(ks, stride, vqf) or None
    split_input_params: Optional[Dict[str, Any]] = None
    # load-time weight-quantization overlays for the int8 serving mode
    # (ops/quant.py::prequantize_weights): int8 copies of the conv/FF
    # weights, passed to apply as the "qw" collection. None = modules
    # quantize inline per step (same math bitwise; the overlay saves a
    # measured 1.6 ms/CFG-step inside sampler scan programs —
    # tools/exp_wq_hoist.py). Populated by pipelines/build.py when an int8
    # weight bucket is active.
    unet_qw: Any = None
    first_stage_qw: Any = None

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
        if self.split_input_params is not None:
            return self._apply_model_tiled(x, t, cond)
        return self._apply_model_inner(x, t, cond)

    def _apply_model_tiled(self, x, t, cond) -> jnp.ndarray:
        """Sliding-window UNet application (``ddpm.py:902-984``), covering
        every conditioning route of the reference's fold/unfold branch — and
        the hybrid mode its ``assert len(cond) == 1`` excludes:

        - spatial conditioning (``cond_stage_key`` in image/LR_image/
          segmentation/bbox_img, or any ``c_concat``): the conditioning map
          is tiled with the SAME patch grid as x and paired patch-wise
          (``ddpm.py:917-927``);
        - ``coordinates_bbox``: per-patch crop re-tokenization — the last two
          conditioning tokens are replaced with the patch's crop code and
          re-encoded through the cond stage (``ddpm.py:929-969``);
        - non-spatial context (text): repeated per patch.

        Patches run as ONE batched UNet call on a [B*P, ...] batch
        (batch-major flattening: element b's patches are contiguous) instead
        of the reference's python loop over crops.
        """
        from sd_tpu.pipelines.tiled import extract_patches, fold_patches

        p = self.split_input_params
        ks = p["ks"][0] if isinstance(p.get("ks"), (tuple, list)) else p.get("ks", 128)
        stride = (p["stride"][0] if isinstance(p.get("stride"), (tuple, list))
                  else p.get("stride", 64))
        # square patches: clamp to the SMALLER canvas dim (the reference
        # clamps both, ddpm.py:609-615)
        ks = min(ks, x.shape[1], x.shape[2])
        b, h, w, _ = x.shape
        key = self.conditioning_key

        x_p, sy, sx = extract_patches(x, ks, stride)  # [B, P, ks, ks, C]
        n_patches = x_p.shape[1]
        flat = x_p.reshape((b * n_patches,) + x_p.shape[2:])
        t_rep = jnp.repeat(t, n_patches, axis=0)

        def tile_spatial(c):
            """Tile a [B, H, W, C] conditioning map with the x patch grid."""
            c_p, _, _ = extract_patches(c, ks, stride)
            return c_p.reshape((b * n_patches,) + c_p.shape[2:])

        def repeat_ctx(c):
            return jnp.repeat(c, n_patches, axis=0)

        cond_dict = cond
        if cond_dict is not None and not isinstance(cond_dict, dict):
            cond_dict = {CONDITIONING_KEYS.get(key, "c_crossattn"): cond_dict}
        cond_dict = dict(cond_dict or {})

        def as_tensor(v, name):
            if not isinstance(v, (list, tuple)):
                return v
            if name == "y":
                return v[0]
            # same axes as _apply_model_inner.get (ddpm.py:1405-1413)
            return jnp.concatenate(v, axis=1 if name == "c_crossattn" else -1)

        cond_flat: Optional[Dict[str, Any]] = None
        if cond_dict:
            if self.cond_stage_key == "coordinates_bbox":
                cond_flat = {"c_crossattn": self._bbox_patch_conditioning(
                    as_tensor(cond_dict["c_crossattn"], "c_crossattn"),
                    sy, sx, ks, b)}
            else:
                cond_flat = {}
                for k, v in cond_dict.items():
                    v = as_tensor(v, k)
                    if k == "y":
                        cond_flat[k] = repeat_ctx(v)
                    elif k == "c_concat" or (
                        v.ndim == 4 and v.shape[1:3] == (h, w)
                        and self.cond_stage_key in (
                            "image", "LR_image", "segmentation", "bbox_img")
                    ):
                        cond_flat[k] = tile_spatial(v)
                    else:
                        cond_flat[k] = repeat_ctx(v)

        out_flat = self._apply_model_inner(flat, t_rep, cond_flat)
        out_p = out_flat.reshape((b, n_patches) + out_flat.shape[1:])
        return fold_patches(
            out_p, (h, w), ks, sy, sx,
            p.get("clip_min_weight", 0.01), p.get("clip_max_weight", 0.5),
        )

    def _bbox_patch_conditioning(self, ids, sy, sx, ks: int, b: int):
        """Per-patch bbox crop re-tokenization (``ddpm.py:929-969``).

        ``ids`` are the RAW layout token ids [B, n] (Layout2Img feeds token
        ids through ``apply_model``; the cond stage embeds them). For each
        patch, the final two tokens are replaced by the patch's crop code
        from ``bbox_tokenizer.crop_encoder`` and the sequence re-encoded.
        The reference computes top-left coordinates from the uniform unfold
        grid; we use the actual patch offsets (identical when the grid
        divides evenly, and correct for the right-aligned remainder patch
        the reference's unfold silently drops)."""
        assert self.bbox_tokenizer is not None, (
            "coordinates_bbox tiling requires ldm.bbox_tokenizer")
        p = self.split_input_params
        assert "original_image_size" in p, (
            "BoundingBoxRescaling is missing original_image_size")
        full_h, full_w = p["original_image_size"]
        m = self.first_stage_model
        # num_downs from the first stage's ddconfig (ddpm.py:938-939:
        # 2 ** (encoder.num_resolutions - 1)); explicit vqf overrides
        ch_mult = (getattr(m, "ddconfig", None) or {}).get("ch_mult")
        if "vqf" in p:
            rescale = p["vqf"]
        elif ch_mult:
            rescale = 2 ** (len(ch_mult) - 1)
        else:
            rescale = 4

        crops = []
        for y in np.asarray(sy).reshape(-1):
            for xx in np.asarray(sx).reshape(-1):
                bbox = (rescale * xx / full_w, rescale * y / full_h,
                        rescale * ks / full_w, rescale * ks / full_h)
                crops.append(self.bbox_tokenizer.crop_encoder(bbox))
        crops = jnp.asarray(np.stack(crops))                      # [P, 2]
        n_patches = crops.shape[0]

        cut = ids[:, :-2]                                         # [B, n-2]
        # batch-major flat layout: element b's patches contiguous
        cut_rep = jnp.repeat(cut, n_patches, axis=0)              # [B*P, n-2]
        crops_rep = jnp.tile(crops, (b, 1))                       # [B*P, 2]
        adapted = jnp.concatenate([cut_rep, crops_rep], axis=1)
        return self.get_learned_conditioning(adapted)

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
                # DiffusionWrapper concatenates both lists along torch dim 1
                # (ddpm.py:1405-1413): channels for c_concat (NHWC -> -1),
                # TOKENS for c_crossattn (RDM stacks query+neighbor contexts)
                if name == "y":
                    v = v[0]
                elif name == "c_crossattn":
                    v = jnp.concatenate(v, axis=1)
                else:
                    v = jnp.concatenate(v, axis=-1)
            return v

        c_concat = get("c_concat")
        c_crossattn = get("c_crossattn")
        y = get("y")

        if key is None:
            return self.unet.apply(self._unet_variables(), x, t)
        if key == "concat":
            xc = jnp.concatenate([x, c_concat], axis=-1)
            return self.unet.apply(self._unet_variables(), xc, t)
        if key == "crossattn":
            return self.unet.apply(self._unet_variables(), x, t, c_crossattn)
        if key == "hybrid":
            xc = jnp.concatenate([x, c_concat], axis=-1)
            return self.unet.apply(self._unet_variables(), xc, t, c_crossattn)
        if key == "adm":
            return self.unet.apply(self._unet_variables(), x, t, None, y)
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
                    return m.apply(self._first_stage_variables(), patches,
                                   method=m.encode_pre_quant)
                moments_model = m.apply(self._first_stage_variables(),
                                        patches, method=m.encode)
                return jnp.concatenate(
                    [moments_model.mean, moments_model.logvar], axis=-1)

            out = self._tiled(enc_tile, x, out_scale=1.0 / vqf)
            if isinstance(m, VQModel):
                return out
            from sd_tpu.core.distributions import DiagonalGaussian

            return DiagonalGaussian.from_moments(out)
        if isinstance(m, VQModel):
            return m.apply(self._first_stage_variables(), x,
                           method=m.encode_pre_quant)
        return m.apply(self._first_stage_variables(), x, method=m.encode)

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
                    return m.apply(self._first_stage_variables(), patches,
                                   not force_not_quantize and True,
                                   method=m.decode)
                return m.apply(self._first_stage_variables(), patches,
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
            return m.apply(self._first_stage_variables(), z,
                           not force_not_quantize and True, method=m.decode)
        return m.apply(self._first_stage_variables(), z, method=m.decode)

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
        weights is just binding the shadow pytree — no store/copy/restore.

        Drops any ``unet_qw`` overlay: it was quantized from the PREVIOUS
        weights and would silently serve stale int8 kernels. Callers that
        want the overlay re-derive it (pipelines/build.py does)."""
        return dataclasses.replace(self, unet_params=unet_params,
                                   unet_qw=None)

    def _unet_variables(self) -> Dict[str, Any]:
        v = {"params": self.unet_params}
        if self.unet_qw is not None:
            v["qw"] = self.unet_qw
        return v

    def _first_stage_variables(self) -> Dict[str, Any]:
        v = {"params": self.first_stage_params}
        if self.first_stage_qw is not None:
            v["qw"] = self.first_stage_qw
        return v

    # --------------------------------------------- params as jit ARGUMENTS
    # Never close the param bundle over a jitted program: XLA embeds closures
    # as literal constants, which (a) balloons the program body to the full
    # checkpoint size — the remote-compile tunnel rejects flagship programs
    # outright (HTTP 413) and any real deployment recompiles per checkpoint,
    # and (b) lets CSE merge structurally identical weights (measured: zero
    # params deleted ~6 ms/step of real work from the r2 bench). Pipelines
    # fetch `runtime_params()` at call time and rebind inside the traced fn
    # with `bind_params` — which also makes checkpoint/EMA hot-swap free.

    PARAM_FIELDS = ("unet_params", "first_stage_params", "cond_stage_params")
    # weight-quantization overlays ride along with their param bundle so the
    # int8 "qw" path sees jit ARGUMENTS too (same CSE/413 reasoning above)
    QW_FIELDS = {"unet_params": "unet_qw",
                 "first_stage_params": "first_stage_qw"}

    def runtime_params(self, *fields: str) -> Dict[str, Any]:
        """Live param pytrees keyed by field name, for passing as jit args.

        With no ``fields``, returns every non-None param bundle (the tiled /
        bbox paths may touch all three stages inside one program); pass field
        names to scope a program to just what it uses. A param field's
        ``qw`` overlay (when set) is included automatically.
        """
        names = list(fields or self.PARAM_FIELDS)
        names += [q for f, q in self.QW_FIELDS.items() if f in names]
        return {f: getattr(self, f) for f in names
                if getattr(self, f) is not None}

    def bind_params(self, params: Dict[str, Any]) -> "LatentDiffusion":
        """Rebind (traced) param pytrees — the inside-jit half of the pair."""
        return dataclasses.replace(self, **params)

    def make_quantize_fn(self) -> Optional[Callable]:
        """x0-quantization hook for the samplers' ``quantize_x0``
        (``ddim.py:197-198``): pass pred_x0 through the VQ codebook."""
        m = self.first_stage_model
        if not isinstance(m, VQModel):
            return None

        def quantize(x0):
            z_q, _, _ = m.apply(
                self._first_stage_variables(), x0 / self.scale_factor,
                method=m.quantize_latent,
            )
            return z_q * self.scale_factor

        return quantize
