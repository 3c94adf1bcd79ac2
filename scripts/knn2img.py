"""knn2img CLI — retrieval-augmented sampling (RDM). Rebuild of the
reference ``scripts/knn2img.py``: CLIP-text query -> top-k neighbors from a
CLIP image-embedding database -> concat as crossattn context -> DDIM/PLMS."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, default="a happy bear reading a newspaper")
    p.add_argument("--outdir", type=str, default="outputs/knn2img-samples")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--database", type=str, help="npz index (build_index) path")
    p.add_argument("--use_neighbors", action="store_true")
    p.add_argument("--config", type=str)
    p.add_argument("--ckpt", type=str)
    p.add_argument("--H", type=int, default=768)
    p.add_argument("--W", type=int, default=768)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

    from sd_tpu.pipelines.retrieval import Searcher, knn_conditioning
    from sd_tpu.pipelines.txt2img import latents_to_images
    from sd_tpu.samplers import ddim_sample, plms_sample
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml
    from sd_tpu.utils.image import save_image

    rng = jax.random.PRNGKey(opt.seed)

    if opt.tiny:
        from sd_tpu.utils.testing import tiny_sd_model_config

        cfg = tiny_sd_model_config(context_dim=24)
        ldm = build_latent_diffusion(cfg, rng=rng)
        d_embed = 24
        f, latent_c = 2, 4
        opt.H = opt.W = 32

        def encode_text(prompts):  # random-projection stand-in text encoder
            k = jax.random.PRNGKey(abs(hash(tuple(prompts))) % 2**31)
            return jax.random.normal(k, (len(prompts), d_embed))
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
        d_embed = 768
        f, latent_c = 16, 16  # RDM is an f16 model (knn2img.py:365)

        from sd_tpu.data.tokenizer import HashTokenizer
        from sd_tpu.models.clip import CLIPTextModelWithProjection

        proj = CLIPTextModelWithProjection()
        tok = HashTokenizer()
        proj_params = proj.init(rng, jnp.zeros((1, 77), jnp.int32))["params"]

        def encode_text(prompts):
            return proj.apply({"params": proj_params}, jnp.asarray(tok(prompts)))

    prompts = [opt.prompt] * opt.n_samples
    q = encode_text(prompts)

    if opt.use_neighbors:
        assert opt.database, "--use_neighbors requires --database"
        searcher = Searcher(opt.database)
        cond, uncond = knn_conditioning(q, searcher, k=opt.knn)
    else:
        cond = jnp.asarray(q)[:, None, :]
        uncond = jnp.zeros_like(cond)

    shape = (len(prompts), opt.H // f, opt.W // f, latent_c)
    sampler = plms_sample if opt.plms else ddim_sample
    z, _ = sampler(ldm.apply_model, ldm.schedule, shape, cond, rng,
                   num_steps=opt.ddim_steps, uncond=uncond,
                   guidance_scale=opt.scale)
    imgs = np.asarray(jax.device_get(latents_to_images(ldm, z)))
    os.makedirs(opt.outdir, exist_ok=True)
    for i, img in enumerate((imgs * 255 + 0.5).astype(np.uint8)):
        save_image(img, os.path.join(opt.outdir, f"{i:05}.png"))
    print(f"Saved {len(imgs)} samples to {opt.outdir}")


if __name__ == "__main__":
    main()
