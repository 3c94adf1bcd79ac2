"""Bulk (un)conditional sampling for FID-style eval — rebuild of the
reference ``scripts/sample_diffusion.py``.

Samples N images from an LDM checkpoint (DDIM or vanilla ancestral), logs
throughput (``sample_diffusion.py:104-105``), and saves ADM-style ``.npz``
(+ PNGs) for external scoring.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--resume", type=str,
                   help="torch .ckpt file, or a framework run logdir / orbax "
                        "checkpoint dir (main.py products)")
    p.add_argument("-c", "--config", type=str)
    p.add_argument("--no_ema", action="store_true",
                   help="run-dir loads: use current params instead of the "
                        "EMA shadow")
    p.add_argument("-n", "--n_samples", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("-e", "--eta", type=float, default=1.0)
    p.add_argument("-v", "--vanilla_sample", action="store_true")
    p.add_argument("--custom_steps", type=int, default=50)
    p.add_argument("-l", "--logdir", type=str, default="outputs/diffusion-samples")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--classes", type=str, default=None,
                   help="class-conditional sampling (ClassEmbedder cond stage, "
                        "e.g. cin256-v2 / cin-ldm-vq-f8): comma-separated "
                        "ImageNet ids cycled over the batch, or 'random'")
    p.add_argument("--scale", type=float, default=1.0,
                   help="CFG scale for class-cond sampling; uncond is the "
                        "extra embedding id (n_classes-1, the 1001-class "
                        "convention) unless --uncond_class is given")
    p.add_argument("--uncond_class", type=int, default=None)
    opt = p.parse_args()

    import jax

    # SD_TPU_PLATFORM=cpu forces the CPU backend (the axon sitecustomize pins
    # the TPU tunnel, whose per-program compile RPC is slow for small runs)
    if os.environ.get("SD_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])
    import jax.numpy as jnp

    from sd_tpu.pipelines.txt2img import latents_to_images
    from sd_tpu.samplers import ddim_sample, p_sample_loop
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml
    from sd_tpu.utils.image import save_image

    rng = jax.random.PRNGKey(opt.seed)
    if opt.tiny:
        from sd_tpu.utils.testing import (tiny_class_cond_model_config,
                                          tiny_uncond_model_config)

        tiny_cfg = (tiny_class_cond_model_config() if opt.classes is not None
                    else tiny_uncond_model_config())
        ldm = build_latent_diffusion(tiny_cfg, rng=rng)
        latent_hw, latent_c = 16, 4
    else:
        from sd_tpu.pipelines.build import inference_compute_dtype

        if opt.resume and not os.path.isfile(opt.resume):
            # framework run logdir / orbax checkpoint dir: restores trainable
            # params (EMA by default) + the sidecar scale_factor; hard-errors
            # on anything unloadable (never samples random weights silently)
            from sd_tpu.utils.checkpoint import run_config_path
            from sd_tpu.utils.config import build_latent_diffusion_from_run

            ldm, _ = build_latent_diffusion_from_run(
                opt.resume, config_path=opt.config,
                compute_dtype=inference_compute_dtype(),
                use_ema=not opt.no_ema)
            cfg = load_yaml(opt.config or run_config_path(opt.resume))
        else:
            cfg = load_yaml(opt.config)
            state_dict = None
            if opt.resume:
                from sd_tpu.utils.port import load_torch_state_dict

                state_dict = load_torch_state_dict(opt.resume)
            else:
                print("WARNING: no checkpoint (-r) given — sampling RANDOM "
                      "weights (debug/smoke only)")
            ldm = build_latent_diffusion(cfg["model"], rng=rng,
                                         state_dict=state_dict,
                                         init_params=state_dict is None,
                                         compute_dtype=inference_compute_dtype())
        latent_hw = cfg["model"]["params"].get("image_size", 64)
        latent_c = cfg["model"]["params"].get("channels", 4)

    os.makedirs(opt.logdir, exist_ok=True)
    img_dir = os.path.join(opt.logdir, "img")
    os.makedirs(img_dir, exist_ok=True)

    # class-conditional sampling (cin256-v2 / cin-ldm-vq-f8 recipe): class ids
    # through the ClassEmbedder cond stage; CFG uncond is the extra embedding
    # row (the 1001-class convention) when --scale > 1
    class_ids = None
    if opt.classes is not None:
        n_classes = getattr(ldm.cond_stage_model, "n_classes", 1000)
        if opt.classes == "random":
            class_ids = np.asarray(
                jax.random.randint(jax.random.fold_in(rng, 777),
                                   (opt.n_samples,), 0, min(n_classes, 1000)))
        else:
            ids = [int(s) for s in opt.classes.split(",")]
            class_ids = np.resize(np.asarray(ids, np.int32), opt.n_samples)
        uncond_id = (opt.uncond_class if opt.uncond_class is not None
                     else n_classes - 1)

    all_images = []
    n_saved = 0
    while n_saved < opt.n_samples:
        b = min(opt.batch_size, opt.n_samples - n_saved)
        shape = (b, latent_hw, latent_hw, latent_c)
        k = jax.random.fold_in(rng, n_saved)
        cond = uncond = None
        scale = 1.0
        if class_ids is not None:
            cond = ldm.get_learned_conditioning(
                jnp.asarray(class_ids[n_saved:n_saved + b]))
            if opt.scale != 1.0:
                uncond = ldm.get_learned_conditioning(
                    jnp.full((b,), uncond_id, jnp.int32))
                scale = opt.scale
        t0 = time.time()
        if opt.vanilla_sample:
            z, _ = p_sample_loop(ldm.apply_model, ldm.schedule, shape,
                                 cond, rng=k, uncond=uncond,
                                 guidance_scale=scale)
        else:
            z, _ = ddim_sample(ldm.apply_model, ldm.schedule, shape, cond, k,
                               num_steps=opt.custom_steps, eta=opt.eta,
                               uncond=uncond, guidance_scale=scale)
        imgs = latents_to_images(ldm, z)
        imgs = np.asarray(jax.device_get(imgs))
        t1 = time.time()
        print(f"Throughput for this batch: {b / (t1 - t0):.4f} samples/sec")
        imgs_u8 = (imgs * 255.0 + 0.5).astype(np.uint8)
        for img in imgs_u8:
            save_image(img, os.path.join(img_dir, f"{n_saved:06}.png"))
            n_saved += 1
        all_images.append(imgs_u8)

    arr = np.concatenate(all_images)
    npz_path = os.path.join(
        opt.logdir, f"{arr.shape[0]}-{arr.shape[1]}x{arr.shape[2]}-samples.npz"
    )
    np.savez(npz_path, arr)
    print(f"Saved {n_saved} samples -> {npz_path}")


if __name__ == "__main__":
    main()
