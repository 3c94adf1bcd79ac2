"""End-to-end pipeline tests on tiny models: txt2img / img2img / inpaint
seed-fixed snapshots (the reference has no automated equivalent — SURVEY.md
§4 recommends exactly this pyramid level)."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.data.tokenizer import HashTokenizer
from sd_tpu.models.ldm import LatentDiffusion
from sd_tpu.pipelines.img2img import (
    Img2ImgPipeline,
    InpaintPipeline,
    preprocess_image,
    preprocess_mask,
)
from sd_tpu.pipelines.txt2img import Txt2ImgPipeline
from sd_tpu.utils.config import build_latent_diffusion
from sd_tpu.utils.testing import tiny_sd_model_config, tiny_uncond_model_config


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = tiny_sd_model_config()
    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(7))
    tok = HashTokenizer(vocab_size=64)
    orig = tok.__call__
    tok_call = lambda texts, context_length=8: orig(texts, context_length=8)
    tok.__call__ = tok_call  # tiny context
    pipe = Txt2ImgPipeline(
        ldm=ldm, tokenizer=lambda texts: orig(texts, context_length=8),
        latent_channels=4, downsample=2,
    )
    return pipe


def test_txt2img_end_to_end(tiny_pipe):
    imgs = tiny_pipe(
        ["a tiny test prompt"], jax.random.PRNGKey(0), height=32, width=32,
        steps=4, guidance_scale=3.0, sampler="ddim",
    )
    assert imgs.shape == (1, 32, 32, 3) and imgs.dtype == np.uint8


def test_txt2img_seed_reproducible(tiny_pipe):
    a = tiny_pipe(["prompt"], jax.random.PRNGKey(5), height=32, width=32,
                  steps=3, sampler="plms")
    b = tiny_pipe(["prompt"], jax.random.PRNGKey(5), height=32, width=32,
                  steps=3, sampler="plms")
    np.testing.assert_array_equal(a, b)
    c = tiny_pipe(["prompt"], jax.random.PRNGKey(6), height=32, width=32,
                  steps=3, sampler="plms")
    assert np.any(a != c)


@pytest.mark.parametrize("sampler", ["ddim", "plms", "dpm"])
def test_txt2img_all_samplers(tiny_pipe, sampler):
    imgs = tiny_pipe(["x"], jax.random.PRNGKey(1), height=32, width=32,
                     steps=3, sampler=sampler)
    assert imgs.shape == (1, 32, 32, 3)


def test_txt2img_batch_and_negative(tiny_pipe):
    imgs = tiny_pipe(
        ["a", "b"], jax.random.PRNGKey(2), negative_prompts=["bad", "bad"],
        height=32, width=32, steps=2, sampler="ddim",
    )
    assert imgs.shape == (2, 32, 32, 3)


def test_img2img_strength(tiny_pipe):
    init = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    pipe = Img2ImgPipeline(tiny_pipe)
    out_weak = pipe(init, ["p"], jax.random.PRNGKey(3), strength=0.2, steps=5)
    out_strong = pipe(init, ["p"], jax.random.PRNGKey(3), strength=1.0, steps=5)
    assert out_weak.shape == (1, 32, 32, 3)
    # weak strength stays closer to the (decoded) init than strong
    init_f = init.astype(np.float32)
    d_weak = np.abs(out_weak[0].astype(np.float32) - init_f).mean()
    d_strong = np.abs(out_strong[0].astype(np.float32) - init_f).mean()
    assert d_weak < d_strong


def test_img2img_strength_zero_is_reconstruction(tiny_pipe):
    init = np.full((32, 32, 3), 128, np.uint8)
    pipe = Img2ImgPipeline(tiny_pipe)
    out = pipe(init, ["p"], jax.random.PRNGKey(4), strength=0.0, steps=5)
    assert out.shape == (1, 32, 32, 3)


def test_preprocess_image_mod32():
    img = np.zeros((70, 100, 3), np.uint8)
    out = preprocess_image(img)
    assert out.shape == (1, 64, 96, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_preprocess_mask_downsamples_max():
    m = np.zeros((32, 32))
    m[:8, :8] = 1.0
    out = preprocess_mask(m, downsample=8)
    assert out.shape == (1, 4, 4, 1)
    assert out[0, 0, 0, 0] == 1.0 and out[0, -1, -1, 0] == 0.0


def test_inpaint_concat_conditioned():
    """Concat-mode LDM: UNet sees latent+cond channels, output composited."""
    cfg = tiny_sd_model_config()
    p = cfg["params"]
    p["conditioning_key"] = "concat"
    p["cond_stage_config"] = "__is_first_stage__"
    # UNet in_channels = 4 latent + 4 masked-image latent + 1 mask = 9
    p["unet_config"]["params"].update(
        in_channels=9, use_spatial_transformer=False, context_dim=None
    )
    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(8))
    pipe = InpaintPipeline(ldm=ldm, downsample=2)
    img = np.full((32, 32, 3), 200, np.uint8)
    mask = np.zeros((32, 32))
    mask[8:24, 8:24] = 1.0
    out = pipe(img, mask, jax.random.PRNGKey(9), steps=3)
    assert out.shape == (1, 32, 32, 3)
    # outside the mask the original pixels survive the composite
    np.testing.assert_allclose(out[0, :4, :4].astype(int), 200, atol=2)


def test_unconditional_model_builds_and_samples():
    from sd_tpu.samplers import ddim_sample

    cfg = tiny_uncond_model_config()
    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(10))
    assert ldm.conditioning_key is None
    z, _ = ddim_sample(ldm.apply_model, ldm.schedule, (1, 16, 16, 4), None,
                       jax.random.PRNGKey(0), num_steps=3)
    img = ldm.decode_first_stage(z)
    assert img.shape == (1, 32, 32, 3)


def test_ldm_quantize_fn_and_with_params(rng):
    import dataclasses

    from sd_tpu.utils.testing import tiny_sd_model_config

    cfg = tiny_sd_model_config()
    cfg["params"]["first_stage_config"] = {
        "target": "ldm.models.autoencoder.VQModelInterface",
        "params": {
            "embed_dim": 4, "n_embed": 16,
            "ddconfig": dict(cfg["params"]["first_stage_config"]["params"]["ddconfig"],
                             double_z=False),
        },
    }
    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(11))
    qfn = ldm.make_quantize_fn()
    assert qfn is not None
    z = jax.random.normal(rng, (1, 16, 16, 4))
    zq = qfn(z)
    assert zq.shape == z.shape
    # straight-through identity gradient
    g = jax.grad(lambda z: jnp.sum(qfn(z)))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-5)

    # with_params swaps the UNet weights functionally (ema_scope analog)
    zeros = jax.tree.map(jnp.zeros_like, ldm.unet_params)
    ldm2 = ldm.with_params(zeros)
    assert ldm2.unet_params is zeros and ldm.unet_params is not zeros


def test_apply_model_hybrid_and_adm_paths(rng):
    """DiffusionWrapper dispatch: hybrid (concat + crossattn) and adm (class
    vector) modes (ddpm.py:1405-1419)."""
    from sd_tpu.models.ldm import LatentDiffusion
    from sd_tpu.models.unet import UNetConfig, UNetModel
    from sd_tpu.core.schedules import DiffusionSchedule

    sched = DiffusionSchedule.create(timesteps=100)

    # hybrid: UNet in_channels = 4 latent + 2 concat cond
    cfg = UNetConfig.from_dict(dict(
        image_size=8, in_channels=6, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, legacy=False))
    unet = UNetModel(config=cfg)
    x = jnp.zeros((1, 8, 8, 4))
    cc = jnp.ones((1, 8, 8, 2))
    ctx = jnp.ones((1, 5, 16))
    params = unet.init(rng, jnp.zeros((1, 8, 8, 6)), jnp.zeros((1,)), ctx)["params"]
    ldm = LatentDiffusion(unet=unet, unet_params=params, schedule=sched,
                          conditioning_key="hybrid")
    out = ldm.apply_model(x, jnp.zeros((1,)),
                          {"c_concat": [cc], "c_crossattn": [ctx]})
    assert out.shape == (1, 8, 8, 4)

    # adm: class-conditional via label embedding
    cfg2 = UNetConfig.from_dict(dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=4, num_classes=7))
    unet2 = UNetModel(config=cfg2)
    y = jnp.array([3])
    params2 = unet2.init(rng, x, jnp.zeros((1,)), None, y)["params"]
    # at init every class-info path ends in a zero-init conv (the reference's
    # zero_module contract) -> un-zero all zeros to observe class sensitivity
    leaves, treedef = jax.tree.flatten(params2)
    leaves = [
        jax.random.normal(jax.random.fold_in(rng, i), l.shape) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)
    ]
    params2 = jax.tree.unflatten(treedef, leaves)
    ldm2 = LatentDiffusion(unet=unet2, unet_params=params2, schedule=sched,
                           conditioning_key="adm")
    out2 = ldm2.apply_model(x, jnp.zeros((1,)), {"y": y})
    assert out2.shape == (1, 8, 8, 4)
    # different class -> different output
    out3 = ldm2.apply_model(x, jnp.zeros((1,)), {"y": jnp.array([5])})
    assert np.abs(np.asarray(out2) - np.asarray(out3)).max() > 0


def test_txt2img_cli_applies_safety_and_watermark(tmp_path):
    """The flagship CLI applies the safety checker and invisible watermark by
    default (reference contract: scripts/txt2img.py:69-95,317-343)."""
    import subprocess
    import sys as _sys

    env = dict(os.environ, SD_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [_sys.executable, "scripts/txt2img.py", "--tiny", "--steps", "1",
         "--height", "64", "--width", "64", "--prompt", "wm",
         "--outdir", str(tmp_path), "--skip_grid"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # applied (untrained thresholds); diagnostic goes to stderr
    assert "safety checker" in (proc.stdout + proc.stderr)
    from PIL import Image

    from sd_tpu.utils.watermark import WATERMARK_PAYLOAD, decode_watermark

    img = np.asarray(Image.open(tmp_path / "samples" / "00000.png"))
    decoded = decode_watermark(img)
    # 64x64 has capacity for the first 8 payload bytes (full 136-bit payload
    # fits at >=128x128; production output is 512x512)
    assert decoded[:8] == WATERMARK_PAYLOAD[:8]


def test_pipeline_params_are_runtime_args_hot_swap(tiny_pipe):
    """Params must flow into the cached compiled programs as jit ARGUMENTS,
    not closure constants: closing the flagship 860M bundle over jit embeds
    multi-GB literals (the remote-compile tunnel rejects the program with
    HTTP 413) and lets CSE delete real work (measured ~6 ms/step with zero
    params). Contract check: perturbing ldm params changes the output of the
    ALREADY-CACHED programs — impossible if weights were baked in at trace
    time — and no new program is compiled (cache keys unchanged)."""
    import dataclasses

    key = jax.random.PRNGKey(3)
    a = tiny_pipe(["swap"], key, height=32, width=32, steps=2)
    cached = dict(tiny_pipe._jit_cache)

    orig_ldm = tiny_pipe.ldm
    bump = lambda t: jax.tree.map(lambda x: x + 0.05, t)
    tiny_pipe.ldm = dataclasses.replace(
        orig_ldm,
        unet_params=bump(orig_ldm.unet_params),
        cond_stage_params=bump(orig_ldm.cond_stage_params),
        first_stage_params=bump(orig_ldm.first_stage_params),
    )
    try:
        b = tiny_pipe(["swap"], key, height=32, width=32, steps=2)
    finally:
        tiny_pipe.ldm = orig_ldm

    # same compiled programs served both calls...
    assert list(tiny_pipe._jit_cache.keys()) == list(cached.keys())
    for k, v in cached.items():
        assert tiny_pipe._jit_cache[k] is v
    # ...yet the weights took effect at call time
    assert not np.array_equal(a, b)
    # and the swap back is live too (seed-reproducible baseline)
    c = tiny_pipe(["swap"], key, height=32, width=32, steps=2)
    assert np.array_equal(a, c)


def test_safety_checker_tables_are_runtime_args():
    """Concept tables/thresholds ride as jit args: arming or tightening the
    checker after the program is cached must take effect without rebuild."""
    from sd_tpu.pipelines.safety import SafetyChecker

    chk = SafetyChecker.untrained(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out, flags = chk(imgs)
    assert not any(flags) and np.array_equal(out, imgs)
    # tighten thresholds to always-flag on the SAME cached program
    chk.concept_thresholds = jnp.full((17,), -2.0)
    out2, flags2 = chk(imgs)
    assert all(flags2) and not np.array_equal(out2, imgs)


def test_map_batches_pipelined_matches_sequential(tiny_pipe):
    """The depth-2 pipelined driver must produce byte-identical outputs to
    sequential __call__ (same programs, same seeds — only the host/device
    overlap differs)."""
    reqs = [dict(prompts=[f"p{i}"], rng=jax.random.PRNGKey(i),
                 height=32, width=32, steps=2) for i in range(3)]
    seq = [tiny_pipe(**r) for r in reqs]
    piped = list(tiny_pipe.map_batches(iter(reqs), depth=2))
    assert len(piped) == 3
    for a, b in zip(seq, piped):
        assert np.array_equal(a, b)
