"""img2img CLI — rebuild of the reference ``scripts/img2img.py`` (SDEdit)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, default="a fantasy landscape")
    p.add_argument("--init-img", dest="init_img", type=str, required=True)
    p.add_argument("--outdir", type=str, default="outputs/img2img-samples")
    p.add_argument("--ddim_steps", "--steps", dest="ddim_steps", type=int, default=50)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--config", type=str, default=None,
                   help="model config yaml (default: the run dir's dumped "
                        "config for run-dir --ckpt, else "
                        "configs/stable-diffusion/v1-inference.yaml)")
    p.add_argument("--ckpt", type=str)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    opt = parse_args()
    import jax

    # SD_TPU_PLATFORM=cpu forces the CPU backend (the axon sitecustomize pins
    # the TPU tunnel, whose per-program compile RPC is slow for small runs)
    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

    from sd_tpu.data.tokenizer import HashTokenizer
    from sd_tpu.pipelines.img2img import Img2ImgPipeline
    from sd_tpu.pipelines.txt2img import Txt2ImgPipeline
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml
    from sd_tpu.utils.image import load_image, save_image

    rng = jax.random.PRNGKey(opt.seed)
    if opt.tiny:
        from sd_tpu.utils.testing import tiny_sd_model_config

        ldm = build_latent_diffusion(tiny_sd_model_config(), rng=rng)
        tok = HashTokenizer(64)
        base = Txt2ImgPipeline(ldm=ldm, tokenizer=lambda t: tok(t, context_length=8),
                               downsample=2)
    else:
        from sd_tpu.pipelines.build import inference_compute_dtype
        from sd_tpu.utils.checkpoint import is_run_path

        if opt.ckpt and is_run_path(opt.ckpt):
            # framework run dir (main.py product): trainable params (EMA) +
            # sidecar scale_factor; hard-errors instead of random weights
            from sd_tpu.utils.config import build_latent_diffusion_from_run

            ldm, _ = build_latent_diffusion_from_run(
                opt.ckpt, config_path=opt.config,
                compute_dtype=inference_compute_dtype())
        else:
            cfg = load_yaml(opt.config
                            or "configs/stable-diffusion/v1-inference.yaml")
            state_dict = None
            if opt.ckpt:
                from sd_tpu.utils.port import load_torch_state_dict

                state_dict = load_torch_state_dict(opt.ckpt)
            ldm = build_latent_diffusion(cfg["model"], rng=rng,
                                         state_dict=state_dict,
                                         init_params=state_dict is None,
                                         compute_dtype=inference_compute_dtype())
        base = Txt2ImgPipeline(ldm=ldm, tokenizer=HashTokenizer())

    pipe = Img2ImgPipeline(base)
    init = load_image(opt.init_img)
    os.makedirs(opt.outdir, exist_ok=True)
    count = 0
    for it in range(opt.n_iter):
        out = pipe(init, [opt.prompt] * opt.n_samples,
                   jax.random.fold_in(rng, it), strength=opt.strength,
                   steps=opt.ddim_steps, guidance_scale=opt.scale)
        for img in out:
            save_image(img, os.path.join(opt.outdir, f"{count:05}.png"))
            count += 1
    print(f"Done: {count} samples in {opt.outdir}")


if __name__ == "__main__":
    main()
