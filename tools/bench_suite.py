"""BASELINE benchmark-config suite — one artifact covering every
driver-assigned benchmark configuration (BASELINE.md "Rebuild targets"):

  vae      kl-f8 VAE 512^2 encode+decode roundtrip (ref models/first_stage_models/kl-f8)
  cin      class-cond ImageNet LDM, DDIM-20 + CFG (ref configs/latent-diffusion/cin256-v2.yaml)
  txt2img  SD v1.4 flagship 512^2 PLMS-50 CFG 7.5 batch 8 (the headline operating point)
  img2img  strength sweep {0.3, 0.5, 0.8} on the flagship (scripts/img2img.py flow)
  inpaint  concat-conditioned inpainting_big (ref models/ldm/inpainting_big)
  rdm      RDM knn2img 768^2: Searcher top-k over a synthetic index ->
           [B, 1+k, 768] crossattn context, large-batch CFG DDIM-50
           (ref configs/retrieval-augmented-diffusion/768x768.yaml)
  train    flagship 860M UNet train step (tools/bench_train.py flagship)

All models are built from the reference YAMLs through the sd_tpu registry
with random weights (zero-egress environment — no released checkpoints
exist here; shapes, programs, and FLOPs are the real ones). Params ride as
jit ARGUMENTS everywhere (never closure constants — the r3 CSE lesson).
Correctness for these configs lives in tests/ (seed parity, VAE roundtrip
parity); this tool records the PERFORMANCE side on the current device.

Usage:
  python tools/bench_suite.py [--only vae,cin,...] [--tiny] [--out BENCH_SUITE.json]

--tiny shrinks every stage to smoke scale (CPU-feasible) to validate the
harness itself; real numbers need the chip. Stages run sequentially in one
process (remote-compile RPC makes per-stage processes prohibitively slow);
caches are dropped between stages to bound HBM.
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SD_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

import jax.numpy as jnp
import numpy as np

REF = "/root/reference"


def _sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))  # tunnel-proof sync


def _build(config_path, rng_seed=0):
    from sd_tpu.pipelines.build import inference_compute_dtype
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml

    cfg = load_yaml(config_path)
    return build_latent_diffusion(
        cfg["model"], rng=jax.random.PRNGKey(rng_seed), init_params=True,
        compute_dtype=inference_compute_dtype()), cfg


def _teardown():
    gc.collect()
    jax.clear_caches()


# --------------------------------------------------------------- stages


def stage_vae(tiny):
    """kl-f8 512^2 roundtrip: encode (sample posterior) -> decode."""
    from sd_tpu.models.vae import AutoencoderKL
    from sd_tpu.utils.config import instantiate_from_config, load_yaml

    cfg = load_yaml(os.path.join(REF, "models/first_stage_models/kl-f8/config.yaml"))
    m = instantiate_from_config(cfg["model"])
    assert isinstance(m, AutoencoderKL)
    hw = 64 if tiny else 512
    b = 2 if tiny else 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]

    @jax.jit
    def roundtrip(p, x, k):
        post = m.apply({"params": p}, x, method=m.encode)
        z = post.sample(k)
        return m.apply({"params": p}, z, method=m.decode)

    k = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    _sync(roundtrip(params, x, k))
    compile_s = time.perf_counter() - t0
    iters = 2 if tiny else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = roundtrip(params, x, k)
    _sync(y)
    dt = (time.perf_counter() - t0) / iters
    return {"config": "first_stage_models/kl-f8", "resolution": hw, "batch": b,
            "ms_per_image_roundtrip": round(dt * 1000 / b, 2),
            "compile_s": round(compile_s, 1)}


def stage_cin(tiny):
    """Class-cond ImageNet LDM (cin256-v2), DDIM-20 with CFG 1.5."""
    from sd_tpu.pipelines.txt2img import latents_to_images
    from sd_tpu.samplers import ddim_sample

    if tiny:
        from sd_tpu.utils.config import build_latent_diffusion
        from sd_tpu.utils.testing import tiny_class_cond_model_config

        ldm = build_latent_diffusion(tiny_class_cond_model_config(),
                                     rng=jax.random.PRNGKey(0))
        hw, ch, b, steps = 16, 4, 2, 4
    else:
        ldm, _ = _build(os.path.join(REF, "configs/latent-diffusion/cin256-v2.yaml"))
        hw, ch, b, steps = 64, 3, 16, 20

    n_classes = getattr(ldm.cond_stage_model, "n_classes", 1000)
    cls = jnp.arange(b, dtype=jnp.int32) % min(n_classes - 1, 1000)
    cond = ldm.get_learned_conditioning(cls)
    uncond = ldm.get_learned_conditioning(
        jnp.full((b,), n_classes - 1, jnp.int32))

    def run(p, cond, uncond, k):
        m = ldm.bind_params(p)
        z, _ = ddim_sample(m.apply_model, m.schedule, (b, hw, hw, ch), cond,
                           k, num_steps=steps, eta=0.0, uncond=uncond,
                           guidance_scale=1.5)
        return latents_to_images(m, z)

    fn = jax.jit(run)
    p = ldm.runtime_params()
    t0 = time.perf_counter()
    _sync(fn(p, cond, uncond, jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    iters = 1 if tiny else 3
    t0 = time.perf_counter()
    for i in range(iters):
        y = fn(p, cond, uncond, jax.random.PRNGKey(2 + i))
    _sync(y)
    dt = (time.perf_counter() - t0) / iters
    return {"config": "latent-diffusion/cin256-v2", "sampler": f"ddim-{steps}",
            "cfg_scale": 1.5, "batch": b,
            "samples_per_sec": round(b / dt, 3), "compile_s": round(compile_s, 1)}


def stage_txt2img(tiny):
    """Flagship SD v1 txt2img at the headline operating point, e2e pipeline."""
    from sd_tpu.pipelines.build import build_txt2img_pipeline

    if tiny:
        pipe, hw = build_txt2img_pipeline(tiny=True, min_hw=64)
        b, steps = 2, 4
        h = w = hw
    else:
        pipe, _ = build_txt2img_pipeline(
            config="configs/stable-diffusion/v1-inference.yaml", min_hw=512)
        b, steps, h, w = 8, 50, 512, 512
    prompts = ["a photograph of an astronaut riding a horse"] * b

    def run(seed):
        return pipe(prompts, jax.random.PRNGKey(seed), height=h, width=w,
                    steps=steps, guidance_scale=7.5, sampler="plms")

    t0 = time.perf_counter()
    imgs = run(0)
    compile_s = time.perf_counter() - t0
    assert len(imgs) == b
    iters = 1 if tiny else 3
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        run(i + 1)
        best = min(best, time.perf_counter() - t0)
    return {"config": "stable-diffusion/v1-inference", "sampler": f"plms-{steps}",
            "cfg_scale": 7.5, "batch": b, "resolution": h,
            "images_per_sec_e2e": round(b / best, 4),
            "compile_s": round(compile_s, 1)}


def stage_img2img(tiny):
    """Flagship img2img strength sweep (scripts/img2img.py flow)."""
    from sd_tpu.pipelines.build import build_txt2img_pipeline
    from sd_tpu.pipelines.img2img import Img2ImgPipeline

    if tiny:
        base, hw = build_txt2img_pipeline(tiny=True, min_hw=64)
        b, steps = 2, 4
    else:
        base, _ = build_txt2img_pipeline(
            config="configs/stable-diffusion/v1-inference.yaml", min_hw=512)
        b, steps, hw = 8, 50, 512
    pipe = Img2ImgPipeline(base=base)
    init = np.random.default_rng(0).integers(
        0, 255, (hw, hw, 3), dtype=np.uint8)
    prompts = ["a fantasy landscape"] * b

    out = {}
    for strength in (0.3, 0.5, 0.8):
        t0 = time.perf_counter()
        imgs = pipe(init, prompts, jax.random.PRNGKey(1), strength=strength,
                    steps=steps, guidance_scale=5.0)
        compile_s = time.perf_counter() - t0
        assert imgs.shape[0] == b
        t0 = time.perf_counter()
        pipe(init, prompts, jax.random.PRNGKey(2), strength=strength,
             steps=steps, guidance_scale=5.0)
        warm = time.perf_counter() - t0
        out[str(strength)] = {"images_per_sec": round(b / warm, 4),
                              "compile_s": round(compile_s, 1)}
    return {"config": "stable-diffusion/v1-inference (img2img)",
            "sampler": f"ddim-{steps}", "batch": b, "strengths": out}


def stage_inpaint(tiny):
    """Concat-conditioned inpainting (ref models/ldm/inpainting_big)."""
    from sd_tpu.pipelines.img2img import InpaintPipeline

    if tiny:
        # the tiny inpaint path is exercised by scripts/inpaint.py --tiny;
        # reuse its concat-conditioned tiny model via the CLI helper
        from sd_tpu.utils.config import build_latent_diffusion
        from sd_tpu.utils.testing import tiny_sd_model_config

        cfg = tiny_sd_model_config()
        p = cfg["params"]
        p["conditioning_key"] = "concat"
        p["cond_stage_config"] = "__is_first_stage__"
        p["unet_config"]["params"]["in_channels"] = 4 + 4 + 1
        p["unet_config"]["params"]["use_spatial_transformer"] = False
        p["unet_config"]["params"]["context_dim"] = None
        ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(0))
        hw, b, steps, ds = 64, 1, 4, 2
    else:
        ldm, cfg = _build(os.path.join(REF, "models/ldm/inpainting_big/config.yaml"))
        hw, b, steps, ds = 512, 4, 50, 4
    pipe = InpaintPipeline(ldm=ldm, downsample=ds)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (hw, hw, 3), dtype=np.uint8)
    mask = np.zeros((hw, hw), np.uint8)
    mask[hw // 4: 3 * hw // 4, hw // 4: 3 * hw // 4] = 255

    t0 = time.perf_counter()
    out = pipe(image, mask, jax.random.PRNGKey(1), steps=steps)
    compile_s = time.perf_counter() - t0
    assert out.shape[:2] == (hw, hw) or out.shape[1:3] == (hw, hw)
    t0 = time.perf_counter()
    pipe(image, mask, jax.random.PRNGKey(2), steps=steps)
    warm = time.perf_counter() - t0
    return {"config": "ldm/inpainting_big", "sampler": f"ddim-{steps}",
            "resolution": hw, "batch": b,
            "sec_per_image": round(warm, 3), "compile_s": round(compile_s, 1)}


def stage_rdm(tiny):
    """RDM knn2img: Searcher top-k -> [B, 1+k, 768] context, CFG DDIM."""
    import tempfile

    from sd_tpu.pipelines.retrieval import (Searcher, build_index,
                                            knn_conditioning)
    from sd_tpu.pipelines.txt2img import latents_to_images
    from sd_tpu.samplers import ddim_sample

    if tiny:
        from sd_tpu.utils.config import build_latent_diffusion
        from sd_tpu.utils.testing import tiny_sd_model_config

        ldm = build_latent_diffusion(tiny_sd_model_config(context_dim=24),
                                     rng=jax.random.PRNGKey(0))
        hw, ch, b, steps, d, k = 16, 4, 2, 4, 24, 3
    else:
        ldm, _ = _build(os.path.join(
            REF, "configs/retrieval-augmented-diffusion/768x768.yaml"))
        hw, ch, b, steps, d, k = 48, 16, 16, 50, 768, 4

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        part = os.path.join(td, "part0.npz")
        np.savez(part, embeddings=rng.standard_normal((4096, d), np.float32))
        idx = build_index([part], os.path.join(td, "index.npz"))
        searcher = Searcher(idx)
        q = rng.standard_normal((b, d)).astype(np.float32)
        t0 = time.perf_counter()
        cond, uncond = knn_conditioning(q, searcher, k=k)
        knn_ms = (time.perf_counter() - t0) * 1000

    def run(p, cond, uncond, key):
        m = ldm.bind_params(p)
        z, _ = ddim_sample(m.apply_model, m.schedule, (b, hw, hw, ch), cond,
                           key, num_steps=steps, eta=0.0, uncond=uncond,
                           guidance_scale=5.0)
        return latents_to_images(m, z)

    fn = jax.jit(run)
    p = ldm.runtime_params()
    t0 = time.perf_counter()
    _sync(fn(p, cond, uncond, jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    iters = 1 if tiny else 2
    t0 = time.perf_counter()
    for i in range(iters):
        y = fn(p, cond, uncond, jax.random.PRNGKey(2 + i))
    _sync(y)
    dt = (time.perf_counter() - t0) / iters
    return {"config": "retrieval-augmented-diffusion/768x768",
            "sampler": f"ddim-{steps}", "cfg_scale": 5.0, "batch": b,
            "knn_top{}_host_ms".format(k): round(knn_ms, 2),
            "samples_per_sec": round(b / dt, 3),
            "compile_s": round(compile_s, 1)}


def stage_train(tiny):
    """Flagship 860M train step — delegates to tools/bench_train.py."""
    import contextlib
    import io

    import bench_train

    if tiny:
        os.environ.setdefault("TRAIN_BENCH_ITERS", "2")
        os.environ.setdefault("TRAIN_BENCH_BATCH", "1")
        # shrink the trunk too — an 860M fwd+bwd compile is minutes-to-hours
        # on the 1-core CPU backend and validates nothing about the harness
        os.environ.setdefault("TRAIN_BENCH_CH", "64")
        os.environ.setdefault("TRAIN_BENCH_RES", "16")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_train.flagship()
    return json.loads(buf.getvalue().strip().splitlines()[-1])


STAGES = {"vae": stage_vae, "cin": stage_cin, "txt2img": stage_txt2img,
          "img2img": stage_img2img, "inpaint": stage_inpaint,
          "rdm": stage_rdm, "train": stage_train}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated stage subset (default: all)")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-scale every stage (harness validation)")
    ap.add_argument("--out", type=str, default=None,
                    help="write/merge results into this JSON file")
    opt = ap.parse_args()

    names = opt.only.split(",") if opt.only else list(STAGES)
    unknown = [n for n in names if n not in STAGES]
    if unknown:
        raise SystemExit(f"unknown stages {unknown}; have {list(STAGES)}")

    results = {"device": str(jax.devices()[0]), "tiny": opt.tiny}
    for name in names:
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            results[name] = STAGES[name](opt.tiny)
        except Exception as e:  # record and continue — one artifact per run
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        results[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({name: results[name]}), flush=True)
        if opt.out:  # write incrementally — a timeout mid-suite keeps results
            merged = {}
            if os.path.exists(opt.out):
                with open(opt.out) as f:
                    merged = json.load(f)
            merged.update(results)
            with open(opt.out, "w") as f:
                json.dump(merged, f, indent=1)
        _teardown()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
