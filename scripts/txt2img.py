"""txt2img CLI — flag-compatible rebuild of the reference ``scripts/txt2img.py``.

Loads a YAML model config (+ optional torch ``.ckpt`` via the weight-port
layer), builds the jitted pipeline, and writes samples + an n_rows grid.
``--tiny`` runs the bundled tiny random-weight model (no checkpoints ship in
this environment) so the full flow is drivable end-to-end.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, default="a painting of a virus monster playing guitar")
    p.add_argument("--outdir", type=str, default="outputs/txt2img-samples")
    p.add_argument("--skip_grid", action="store_true")
    p.add_argument("--skip_save", action="store_true")
    p.add_argument("--ddim_steps", "--steps", dest="ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--dpm_solver", action="store_true")
    p.add_argument("--fixed_code", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", "--height", dest="H", type=int, default=512)
    p.add_argument("--W", "--width", dest="W", type=int, default=512)
    p.add_argument("--C", type=int, default=4)
    p.add_argument("--f", type=int, default=8)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--n_rows", type=int, default=0)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--from-file", dest="from_file", type=str)
    p.add_argument("--config", type=str, default=None,
                   help="model config yaml (default: the run dir's dumped "
                        "config for run-dir --ckpt, else "
                        "configs/stable-diffusion/v1-inference.yaml)")
    p.add_argument("--ckpt", type=str)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true",
                   help="use the bundled tiny random-weight model")
    # The reference applies BOTH by default (txt2img.py:69-95,317-343);
    # these opt-outs match common upstream forks.
    p.add_argument("--no-watermark", dest="watermark", action="store_false",
                   help="skip the invisible watermark on saved images")
    p.add_argument("--no-safety", dest="safety", action="store_false",
                   help="skip the NSFW safety checker")
    p.add_argument("--safety_ckpt", type=str,
                   default=os.environ.get("SD_TPU_SAFETY_CKPT"),
                   help="HF StableDiffusionSafetyChecker state_dict (.ckpt/.pt)"
                        " to port; without it the checker runs with"
                        " unreachable thresholds (flags nothing)")
    return p.parse_args()


def main():
    opt = parse_args()
    import jax

    # SD_TPU_PLATFORM=cpu forces the CPU backend (the axon sitecustomize pins
    # the TPU tunnel, whose per-program compile RPC is slow for small runs)
    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

    from sd_tpu.pipelines.build import build_txt2img_pipeline
    from sd_tpu.utils.image import save_grid, save_image

    rng = jax.random.PRNGKey(opt.seed)

    # Safety checker + invisible watermark: applied by default through the
    # pipeline's native postprocess hooks, matching the reference's output
    # contract (txt2img.py:69-95,317-343).
    pipe, tiny_hw = build_txt2img_pipeline(
        tiny=opt.tiny, config=opt.config, ckpt=opt.ckpt,
        safety=opt.safety, safety_ckpt=opt.safety_ckpt,
        watermark=opt.watermark, min_hw=min(opt.H, opt.W),
        latent_channels=opt.C, downsample=opt.f, seed=opt.seed)
    if tiny_hw:
        opt.H, opt.W = min(opt.H, tiny_hw), min(opt.W, tiny_hw)

    sampler = "dpm" if opt.dpm_solver else ("plms" if opt.plms else "ddim")
    if opt.from_file:
        with open(opt.from_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
    else:
        prompts = [opt.prompt] * opt.n_samples

    os.makedirs(opt.outdir, exist_ok=True)
    sample_dir = os.path.join(opt.outdir, "samples")
    os.makedirs(sample_dir, exist_ok=True)
    base_count = len(os.listdir(sample_dir))

    x_T = None
    if opt.fixed_code:
        x_T = jax.random.normal(
            jax.random.fold_in(rng, 999),
            (len(prompts), opt.H // pipe.downsample, opt.W // pipe.downsample,
             pipe.latent_channels),
        )

    all_samples = []
    for it in range(opt.n_iter):
        imgs = pipe(
            prompts, jax.random.fold_in(rng, it), height=opt.H, width=opt.W,
            steps=opt.ddim_steps, guidance_scale=opt.scale, sampler=sampler,
            eta=opt.ddim_eta, x_T=x_T,
        )
        all_samples.append(imgs)
        if not opt.skip_save:
            for img in imgs:
                save_image(img, os.path.join(sample_dir, f"{base_count:05}.png"))
                base_count += 1

    if not opt.skip_grid:
        grid = np.concatenate(all_samples)
        save_grid(grid, os.path.join(opt.outdir, "grid-0000.png"),
                  n_rows=opt.n_rows or len(prompts))
    print(f"Your samples are ready at {opt.outdir}")


if __name__ == "__main__":
    main()
