"""inpaint CLI — rebuild of the reference ``scripts/inpaint.py``.

Expects ``--indir`` with image/mask pairs (``*.png`` + ``*_mask.png``), runs
concat-conditioned DDIM inpainting, composites, and saves to ``--outdir``.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--config", type=str,
                   default="configs/latent-diffusion/inpainting_big.yaml")
    p.add_argument("--ckpt", type=str)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    opt = p.parse_args()

    import jax

    # SD_TPU_PLATFORM=cpu forces the CPU backend (the axon sitecustomize pins
    # the TPU tunnel, whose per-program compile RPC is slow for small runs)
    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

    from sd_tpu.pipelines.img2img import InpaintPipeline
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml
    from sd_tpu.utils.image import load_image, save_image

    rng = jax.random.PRNGKey(opt.seed)
    if opt.tiny:
        from sd_tpu.utils.testing import tiny_sd_model_config

        cfg = tiny_sd_model_config()
        pp = cfg["params"]
        pp["conditioning_key"] = "concat"
        pp["cond_stage_config"] = "__is_first_stage__"
        pp["unet_config"]["params"].update(
            in_channels=9, use_spatial_transformer=False, context_dim=None
        )
        ldm = build_latent_diffusion(cfg, rng=rng)
        pipe = InpaintPipeline(ldm=ldm, downsample=2)
    else:
        cfg = load_yaml(opt.config)
        state_dict = None
        if opt.ckpt:
            from sd_tpu.utils.port import load_torch_state_dict

            state_dict = load_torch_state_dict(opt.ckpt)
        from sd_tpu.pipelines.build import inference_compute_dtype

        ldm = build_latent_diffusion(cfg["model"], rng=rng, state_dict=state_dict,
                                     init_params=state_dict is None,
                                     compute_dtype=inference_compute_dtype())
        pipe = InpaintPipeline(ldm=ldm, downsample=4)  # inpainting_big is VQ-f4

    masks = sorted(glob.glob(os.path.join(opt.indir, "*_mask.png")))
    images = [m.replace("_mask.png", ".png") for m in masks]
    print(f"Found {len(masks)} inputs.")
    os.makedirs(opt.outdir, exist_ok=True)
    for i, (img_p, mask_p) in enumerate(zip(images, masks)):
        image = load_image(img_p)
        mask = (np.asarray(load_image(mask_p))[..., 0] > 127).astype(np.float32)
        out = pipe(image, mask, jax.random.fold_in(rng, i), steps=opt.steps)
        save_image(out[0], os.path.join(opt.outdir, os.path.basename(img_p)))
    print(f"Done -> {opt.outdir}")


if __name__ == "__main__":
    main()
