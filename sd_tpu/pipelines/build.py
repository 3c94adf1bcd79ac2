"""Shared txt2img pipeline construction for the CLI entry points.

`scripts/txt2img.py` and `scripts/serve.py` build the same stack: model
(tiny or YAML config + optional torch checkpoint), tokenizer (in-repo BPE
via ``SD_TPU_BPE_VOCAB``, hard refusal on real-checkpoint + hash-tokenizer
combos), safety checker and invisible watermark (on by default — the
reference output contract, ``scripts/txt2img.py:69-95,317-343``). One
builder keeps the two CLIs from diverging.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

__all__ = ["build_txt2img_pipeline", "inference_compute_dtype"]


def inference_compute_dtype():
    """The inference-precision policy shared by every sampling CLI/pipeline.

    bf16 compute + bf16 params (fp32 norm/softmax islands stay inside the
    modules) — the analog of the reference's fp16 ``autocast`` sampling
    scope (``scripts/txt2img.py:288-343``). ``SD_TPU_PRECISION=fp32`` opts
    out (e.g. for activation-parity debugging). Returns a dtype for
    ``build_latent_diffusion(compute_dtype=...)`` or None for fp32.
    """
    import jax.numpy as jnp

    prec = os.environ.get("SD_TPU_PRECISION", "bf16").lower()
    return None if prec in ("fp32", "float32") else jnp.bfloat16


def build_txt2img_pipeline(
    *,
    tiny: bool = False,
    config: Optional[str] = None,
    ckpt: Optional[str] = None,
    safety: bool = True,
    safety_ckpt: Optional[str] = None,
    watermark: bool = True,
    min_hw: int = 512,
    latent_channels: int = 4,
    downsample: int = 8,
    seed: int = 0,
    use_ema: bool = True,
):
    """Build a ready Txt2ImgPipeline. Returns (pipe, clamped_tiny_hw).

    ``ckpt`` may be a torch ``.ckpt`` file (weight port) or a framework run
    logdir / orbax checkpoint dir (``main.py`` products — restores the
    trainable params, EMA by default, + the sidecar scale_factor).
    ``min_hw`` is min(H, W) of the serving/sampling resolution — used only
    to gate the watermark's DWT capacity floor. ``clamped_tiny_hw`` is 64
    when ``tiny`` (callers clamp their H/W), else None.
    """
    import jax

    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

    from sd_tpu.data.tokenizer import HashTokenizer
    from sd_tpu.pipelines.txt2img import Txt2ImgPipeline
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml

    rng = jax.random.PRNGKey(seed)
    tiny_hw = None
    if tiny:
        from sd_tpu.utils.testing import tiny_sd_model_config

        ldm = build_latent_diffusion(tiny_sd_model_config(), rng=rng)
        tok = HashTokenizer(64)
        pipe = Txt2ImgPipeline(
            ldm=ldm, tokenizer=lambda t: tok(t, context_length=8),
            downsample=2)
        tiny_hw = 64
    else:
        from sd_tpu.utils.checkpoint import is_run_path

        state_dict = None
        from_run = bool(ckpt) and is_run_path(ckpt)
        if from_run:
            # framework run dir: trainable params (EMA by default) + sidecar
            # scale_factor; frozen stages rebuilt from the run config + seed
            from sd_tpu.utils.checkpoint import run_config_path
            from sd_tpu.utils.config import build_latent_diffusion_from_run

            ldm, _ = build_latent_diffusion_from_run(
                ckpt, config_path=config,
                compute_dtype=inference_compute_dtype(), use_ema=use_ema)
            cfg = load_yaml(config or run_config_path(ckpt))
        else:
            cfg = load_yaml(
                config or "configs/stable-diffusion/v1-inference.yaml")
            if ckpt:
                from sd_tpu.utils.port import load_torch_state_dict

                print(f"Loading state dict from {ckpt}", file=sys.stderr)
                state_dict = load_torch_state_dict(ckpt)
            ldm = build_latent_diffusion(cfg["model"], rng=rng,
                                         state_dict=state_dict,
                                         init_params=state_dict is None,
                                         compute_dtype=inference_compute_dtype())
        bpe = os.environ.get("SD_TPU_BPE_VOCAB")
        if bpe:
            from sd_tpu.data.tokenizer import CLIPTokenizer

            tokenizer = CLIPTokenizer.from_openai_gz(bpe)
        elif from_run:
            # framework-trained runs in this environment train against the
            # HashTokenizer stream — the matching tokenizer IS the hash one
            print("run-dir checkpoint without SD_TPU_BPE_VOCAB: using the "
                  "HashTokenizer (valid iff the run trained with it)",
                  file=sys.stderr)
            tokenizer = HashTokenizer()
        elif state_dict is not None:
            # A real checkpoint with the debug HashTokenizer would silently
            # produce garbage conditioning — refuse instead.
            raise SystemExit(
                "Loaded a real checkpoint but no BPE vocab is configured: "
                "set SD_TPU_BPE_VOCAB to the CLIP merges file "
                "(bpe_simple_vocab_16e6.txt.gz). The hash tokenizer is only "
                "valid for random-weight (--tiny/debug) runs."
            )
        else:
            tokenizer = HashTokenizer()
        pipe = Txt2ImgPipeline(ldm=ldm, tokenizer=tokenizer,
                               latent_channels=latent_channels,
                               downsample=downsample)

    # NOTE: the int8 load-time weight overlay ("qw") is attached inside
    # build_latent_diffusion / build_latent_diffusion_from_run
    # (utils/config.py::maybe_weight_quant_overlay) so EVERY entry point —
    # these pipelines, img2img, sample_diffusion, serve, tools — gets it.

    if safety:
        from sd_tpu.pipelines.safety import SafetyChecker, port_safety_checker

        safety_ckpt = safety_ckpt or os.environ.get("SD_TPU_SAFETY_CKPT")
        if safety_ckpt:
            from sd_tpu.utils.port import load_torch_state_dict

            pipe.safety_checker = port_safety_checker(
                load_torch_state_dict(safety_ckpt))
        else:
            print("safety checker: no trained weights — running with "
                  "unreachable thresholds (scores computed, NOTHING will be "
                  "flagged); pass --safety_ckpt / SD_TPU_SAFETY_CKPT to arm",
                  file=sys.stderr)
            pipe.safety_checker = SafetyChecker.untrained(
                jax.random.PRNGKey(0))
    effective_hw = min(min_hw, 64) if tiny else min_hw
    if watermark and effective_hw >= 32:  # DWT capacity floor
        from sd_tpu.utils.watermark import embed_watermark_batch

        # batch contract [B,H,W,3] u8 -> same; payload "StableDiffusionV1"
        pipe.watermarker = embed_watermark_batch
    return pipe, tiny_hw
