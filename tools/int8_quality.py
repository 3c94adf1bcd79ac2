"""W8A8 sample-quality check on a REAL trained model.

The zero-egress environment has no released SD checkpoint, so the
BASELINE-style quality gate for the int8 conv path (``sd_tpu/ops/quant.py``)
cannot run at flagship scale. What it CAN run: the convergence
demonstration (``tools/convergence_run.py``) trains a real class-conditional
diffusion model on the deterministic ColoredShapes distribution through
``main.py`` — a trained checkpoint with known ground truth. This tool
samples that trained model twice on the TPU with identical seeds — bf16
(shipped default) and ``SD_TPU_INT8=all`` — and reports:

  - per-class color fidelity (foreground mean RGB vs the class color) and
    background fidelity for BOTH variants — does int8 still draw the right
    shapes?
  - PSNR between the bf16 and int8 sample sets (how far the lossy path
    drifts from the reference samples);
  - side-by-side grids into the convergence artifacts dir.

Note the toy model is a STRESS test for W8A8: its convs are 32-64 channels
wide, so per-tensor activation quantization noise is proportionally much
larger than at SD scale (320-1280 channels, where int8 averaging is far
kinder). Passing here is strong evidence the path is numerically sane.

Usage: python tools/int8_quality.py [--run /tmp/convergence_r4/<ts>_runa]
       [--per-class 2] [--steps 50] [--out artifacts/convergence]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/sd_tpu/convergence-shapes.yaml")


def find_run():
    cands = sorted(glob.glob("/tmp/convergence_r4/*_runa"))
    assert cands, "no convergence run found; run tools/convergence_run.py"
    return cands[-1]


def sample_set(ldm, cond, shape, key, steps):
    """Full clipped ancestral chain — the reference's PIXEL-SPACE sampling
    convention (``ddpm.py::p_sample_loop`` with ``clip_denoised=True``).
    The probe trains in pixel space (IdentityFirstStage), where unclipped
    DDIM x0-extrapolation can blow past [-1,1] and off-manifold (measured:
    unclipped DDIM-50 left half the classes as noise with pixel ranges
    +-10; the clipped chain samples every class cleanly, top-1 = 1.0)."""
    del steps  # the ancestral chain runs the full 1000-step schedule
    from sd_tpu.samplers.ancestral import p_sample_loop

    z, _ = p_sample_loop(ldm.apply_model, ldm.schedule, shape, cond=cond,
                         rng=key, clip_denoised=True)
    return np.asarray(ldm.decode_first_stage(z)).astype(np.float32)


def color_report(imgs, labels):
    """Foreground color fidelity vs the parametric class colors."""
    from sd_tpu.data.synthetic import ColoredShapes

    colors = ColoredShapes._COLORS
    ok, bg_errs, fg_errs = 0, [], []
    for img, lab in zip(imgs, labels):
        lum = img.max(-1) - (-0.95)
        fg = lum > 0.5
        bg_errs.append(float(np.abs(img[~fg] - (-0.95)).mean())
                       if (~fg).any() else 0.0)
        if not fg.any():
            fg_errs.append(2.0)
            continue
        mean_rgb = img[fg].mean(0)
        true = colors[lab // 4]
        fg_errs.append(float(np.abs(mean_rgb - true).mean()))
        nearest = int(np.argmin(np.abs(colors - mean_rgb).mean(1)))
        ok += int(nearest == lab // 4)
    return {
        "color_top1_acc": round(ok / len(imgs), 4),
        "fg_color_mae": round(float(np.mean(fg_errs)), 4),
        "bg_mae": round(float(np.mean(bg_errs)), 4),
    }


def flagship_agreement(steps: int, out_dir: str):
    """bf16-vs-int8 agreement at FLAGSHIP scale (r4 verdict #5 extension):
    the toy probe's sites are too small to dispatch the r5 ff/attn int8
    kernels (FF gate inner>=2560, flash QK^T gate Nk>=2048), so this leg
    runs the 860M SD-v1 UNet (synthetic seeded weights — zero-egress env)
    through a CFG DDIM latent trajectory twice with identical seeds and
    reports the accumulated numeric drift of the FULL int8 serving mode at
    the exact sites it ships on. Weights are random, so this is a numeric
    agreement gate, not a sample-quality one — but every quantized kernel
    (convs, GEGLU-FF, flash QK^T) dispatches at its real shape.
    """
    import jax
    import jax.numpy as jnp

    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.unet import UNetConfig, UNetModel
    from sd_tpu.samplers import ddim_sample

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    b = 2
    x0 = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((b,), jnp.float32)
    key = jax.random.PRNGKey(7)
    kc, ku, kp, ks = jax.random.split(key, 4)
    cond = 0.02 * jax.random.normal(kc, (b, 77, 768), jnp.bfloat16)
    uncond = 0.02 * jax.random.normal(ku, (b, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x0, t0, cond), kp)
    params = jax.tree.map(
        lambda s: (0.02 * jax.random.normal(
            jax.random.fold_in(kp, hash(s.shape) % (2**31)), s.shape)
        ).astype(s.dtype), shapes)["params"]
    schedule = DiffusionSchedule.create()

    def apply_model(x, t, c):
        return unet.apply({"params": params}, x.astype(jnp.bfloat16), t, c
                          ).astype(jnp.float32)

    def run_arm():
        jax.clear_caches()
        z, _ = ddim_sample(apply_model, schedule, (b, 64, 64, 4), cond, ks,
                           num_steps=steps, uncond=uncond,
                           guidance_scale=7.5)
        return np.asarray(z, np.float32)

    os.environ.pop("SD_TPU_INT8", None)
    z_bf16 = run_arm()
    os.environ["SD_TPU_INT8"] = "all"
    try:
        z_int8 = run_arm()
    finally:
        os.environ.pop("SD_TPU_INT8", None)
    assert not np.array_equal(z_bf16, z_int8), (
        "flagship int8 arm identical to bf16 — int8 kernels did not dispatch")
    rel = float(np.linalg.norm(z_bf16 - z_int8) / np.linalg.norm(z_bf16))
    peak = float(z_bf16.max() - z_bf16.min())
    mse = float(np.mean((z_bf16 - z_int8) ** 2))
    psnr = 10 * np.log10(peak**2 / max(mse, 1e-12))
    rep = {
        "steps": steps,
        "mode": "all (conv,ff,attn)",
        "latent_rel_l2": round(rel, 5),
        "latent_psnr_db": round(float(psnr), 2),
        "bf16_latent_std": round(float(z_bf16.std()), 4),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "int8_flagship_agreement.json"),
              "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))
    # every per-kernel rel error measured <=1e-2 (bench_attn int8attn) and
    # the conv/FF dequant is per-channel; a trajectory that accumulates past
    # 10% rel drift would mean a kernel-level regression
    ok = rel < 0.10
    print("INT8 FLAGSHIP AGREEMENT:", "PASS" if ok else "CHECK REPORT")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None)
    ap.add_argument("--per-class", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50)
    # MUST match the training run's -s: the ClassEmbedder is frozen (not in
    # the trainer checkpoint) and the UNet learned against the embedding
    # values drawn from THIS seed (convergence_run.py launches with -s 23)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "artifacts/convergence"))
    ap.add_argument("--flagship", action="store_true",
                    help="run the 860M-UNet numeric agreement leg instead "
                         "(exercises the ff/attn int8 kernels, which the "
                         "toy probe's sites are too small to dispatch)")
    args = ap.parse_args()
    if args.flagship:
        return flagship_agreement(args.steps if args.steps != 50 else 8,
                                  args.out)
    run = args.run or find_run()

    import jax
    import jax.numpy as jnp

    from sd_tpu.utils.checkpoint import restore_checkpoint
    from sd_tpu.utils.config import build_latent_diffusion, load_yaml
    from sd_tpu.utils.image import make_grid, save_image

    # prefer the run's own dumped config (probe v2 trains a different
    # architecture than the r4 convergence-shapes.yaml default)
    dumped = os.path.join(run, "configs", "project.yaml")
    cfg = load_yaml(dumped if os.path.exists(dumped) else CFG)
    ldm = build_latent_diffusion(cfg["model"],
                                 rng=jax.random.PRNGKey(args.seed),
                                 init_params=True,
                                 compute_dtype=jnp.bfloat16)
    tree, meta = restore_checkpoint(os.path.join(run, "checkpoints", "last"))
    # current params, NOT the EMA shadow: at the reference's 0.9999 decay a
    # few-thousand-step toy run leaves the shadow ~0.9999^steps dominated by
    # the random init (the trainer's ImageLogger also samples current params)
    params = tree["params"]
    unet = jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else jnp.asarray(x), params["unet"])
    ldm = ldm.with_params(unet)
    print(f"restored step {meta.get('step')} from {run} "
          f"(ema={'ema' in tree and tree['ema'] is not None})")

    n_cls = 8
    labels = np.repeat(np.arange(n_cls), args.per_class)
    cond = ldm.get_learned_conditioning(jnp.asarray(labels))
    shape = (len(labels), 32, 32, 3)
    key = jax.random.PRNGKey(1234)

    # The A/B flips a TRACE-time env var between the two sample_set calls.
    # p_sample_loop is an eager lax.scan that retraces every call today, but
    # if it is ever routed through the pipelines' cached_jit the second arm
    # would silently reuse the bf16 program and this gate would report a
    # perfect PSNR (ADVICE r4 #4) — clear every cache layer between arms and
    # fail LOUDLY below if the arms come back bitwise identical.
    from sd_tpu.pipelines._jit import clear_jit_cache

    os.environ.pop("SD_TPU_INT8", None)
    clear_jit_cache(ldm)
    jax.clear_caches()
    imgs_bf16 = sample_set(ldm, cond, shape, key, args.steps)
    os.environ["SD_TPU_INT8"] = "all"
    try:
        clear_jit_cache(ldm)
        jax.clear_caches()
        imgs_int8 = sample_set(ldm, cond, shape, key, args.steps)
    finally:
        os.environ.pop("SD_TPU_INT8", None)
    assert not np.array_equal(imgs_bf16, imgs_int8), (
        "bf16 and int8 arms are bitwise identical — the int8 path did not "
        "dispatch (cache reuse or gating regression); the PSNR gate below "
        "would be vacuous")

    mse = float(np.mean((imgs_bf16 - imgs_int8) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # [-1,1] range -> peak 2
    rep = {
        "run": run,
        "sampler": "ancestral-1000 clip_denoised (ddpm.py::p_sample_loop)",
        "samples": int(len(labels)),
        "platform": str(jax.devices()[0]),
        "bf16": color_report(imgs_bf16, labels),
        "int8": color_report(imgs_int8, labels),
        "int8_vs_bf16_psnr_db": round(float(psnr), 2),
    }
    os.makedirs(args.out, exist_ok=True)
    both = np.concatenate([imgs_bf16, imgs_int8])
    grid = make_grid(np.clip((both + 1) / 2, 0, 1), n_rows=len(labels))
    save_image((grid * 255).astype(np.uint8),
               os.path.join(args.out, "int8_vs_bf16_samples.png"))
    with open(os.path.join(args.out, "int8_quality.json"), "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))
    # The gate is AGREEMENT with bf16, not toy-model sample fidelity: a
    # 32-channel DDPM trained a few thousand steps is not a great sampler
    # (color metrics above are reported as context), but whatever it draws,
    # the int8 path must draw the SAME thing — >=30 dB PSNR over the full
    # 1000-step trajectory, and no degradation of the color metrics vs bf16.
    ok = (rep["int8_vs_bf16_psnr_db"] >= 30.0
          and rep["int8"]["fg_color_mae"]
          <= rep["bf16"]["fg_color_mae"] + 0.05)
    print("INT8 QUALITY:", "PASS" if ok else "CHECK REPORT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
