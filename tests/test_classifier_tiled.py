"""Tests for EncoderUNetModel/classifier training and tiled application."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.models.encoder_unet import EncoderUNetConfig, EncoderUNetModel
from sd_tpu.pipelines.tiled import (
    extract_patches,
    fold_patches,
    tiled_apply,
    tiling_weights,
)
from sd_tpu.training.classifier import (
    NoisyLatentClassifierTrainer,
    classifier_guidance_corrector,
    compute_top_k,
)

SCHED = DiffusionSchedule.create(timesteps=100)

TINY_ENC = EncoderUNetConfig(
    in_channels=3, model_channels=32, out_channels=5, num_res_blocks=1,
    attention_resolutions=[2], channel_mult=[1, 2], image_size=16,
    num_head_channels=8,
)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_pools(pool, rng):
    import dataclasses

    cfg = dataclasses.replace(TINY_ENC, pool=pool)
    model = EncoderUNetModel(config=cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,))
    params = model.init(rng, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 5)


def test_compute_top_k():
    logits = jnp.array([[0.1, 0.9, 0.0], [0.9, 0.1, 0.0]])
    labels = jnp.array([1, 1])
    assert float(compute_top_k(logits, labels, 1)) == 0.5
    assert float(compute_top_k(logits, labels, 2)) == 1.0


def test_classifier_trains(rng):
    model = EncoderUNetModel(config=TINY_ENC)
    trainer = NoisyLatentClassifierTrainer(model=model, schedule=SCHED,
                                           learning_rate=1e-3)
    state = trainer.init_state(rng, (16, 16, 3))
    batch = {
        "image": jax.random.normal(rng, (4, 16, 16, 3)),
        "class_label": jnp.array([0, 1, 2, 3]),
    }
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(6):
        state, aux = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(aux["acc@1"]) <= 1.0
    buckets = trainer.eval_noise_buckets(state, batch, rng)
    assert len(buckets) == 10


def test_classifier_guidance_corrector_shifts_eps(rng):
    model = EncoderUNetModel(config=TINY_ENC)
    trainer = NoisyLatentClassifierTrainer(model=model, schedule=SCHED)
    state = trainer.init_state(rng, (16, 16, 3))
    corr = classifier_guidance_corrector(model, state.params, SCHED,
                                         target_labels=jnp.array([1]), scale=2.0)
    x = jax.random.normal(rng, (1, 16, 16, 3))
    e = jnp.zeros_like(x)
    t = jnp.array([50])
    out = corr(e, x, t, None)
    assert out.shape == x.shape
    assert np.abs(np.asarray(out)).max() > 0  # gradient flows


# ------------------------------------------------------------------- tiling


def test_tiling_weights_properties():
    w = tiling_weights(8)
    assert w.shape == (8, 8)
    assert w[0, 0] == w[-1, -1]          # symmetric
    assert w[4, 4] > w[0, 0]             # center heavier than corner
    assert w.min() >= 0.01 and w.max() <= 0.5


def test_extract_fold_identity():
    """Identity fn through tiling must reproduce the input exactly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    out = tiled_apply(lambda p: p, x, ks=8, stride=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_tiled_apply_covers_uneven_grid():
    """Canvas not divisible by stride: right/bottom-aligned final patches."""
    x = jnp.ones((1, 20, 28, 2))
    out = tiled_apply(lambda p: p * 2.0, x, ks=8, stride=6)
    assert out.shape == (1, 20, 28, 2)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_tiled_apply_upscaling_decoder():
    """out_scale=2: each tile doubles (a decoder-like fn); stitched output
    doubles the canvas."""
    x = jnp.ones((1, 16, 16, 4))

    def fake_decoder(p):
        return jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)[..., :3]

    out = tiled_apply(fake_decoder, x, ks=8, stride=4, out_scale=2)
    assert out.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_tiled_model_consistency_on_smooth_fn():
    """A spatially-local fn (blur-free pointwise) gives identical results
    tiled vs untiled."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 3)), jnp.float32)
    fn = lambda p: jnp.tanh(p) * 0.5 + p
    np.testing.assert_allclose(
        np.asarray(tiled_apply(fn, x, ks=8, stride=4)),
        np.asarray(fn(x)), atol=1e-5,
    )


def test_ldm_split_input_params_paths(rng):
    """split_input_params wires tiling into apply_model / encode / decode."""
    import dataclasses

    from sd_tpu.utils.config import build_latent_diffusion
    from sd_tpu.utils.testing import tiny_sd_model_config

    ldm = build_latent_diffusion(tiny_sd_model_config(), rng=jax.random.PRNGKey(40))
    tiled = dataclasses.replace(
        ldm, split_input_params={"ks": 8, "stride": 4, "vqf": 2,
                                 "patch_distributed_vq": True},
    )
    x = jax.random.normal(rng, (1, 32, 32, 4))
    t = jnp.array([5.0])
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 8, 24))
    out_tiled = tiled.apply_model(x, t, ctx)
    assert out_tiled.shape == x.shape

    # tiled encode/decode roundtrip shapes (f2 tiny stage)
    img = jax.random.normal(jax.random.fold_in(rng, 2), (1, 32, 32, 3))
    post = tiled.encode_first_stage(img)
    assert post.mean.shape == (1, 16, 16, 4)
    rec = tiled.decode_first_stage(post.mean * tiled.scale_factor)
    assert rec.shape == (1, 32, 32, 3)


def _tiny_unet(in_channels, rng, context_dim=None, model_channels=32):
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=16, in_channels=in_channels, out_channels=3,
        model_channels=model_channels, attention_resolutions=[2],
        num_res_blocks=1, channel_mult=[1, 2], num_heads=2,
        use_spatial_transformer=context_dim is not None,
        transformer_depth=1, context_dim=context_dim, legacy=False,
    ))
    unet = UNetModel(config=cfg)
    x = jnp.zeros((1, 16, 16, in_channels))
    ctx = jnp.zeros((1, 4, context_dim)) if context_dim else None
    params = unet.init(rng, x[..., :in_channels], jnp.zeros((1,)), ctx)["params"]
    return unet, params


def test_tiled_apply_model_concat(rng):
    """Concat conditioning is tiled with the SAME patch grid as x
    (ddpm.py:917-927: spatial conditioning unfolds alongside the latent) —
    the route the r1 build gated out."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.ldm import LatentDiffusion

    unet, params = _tiny_unet(3 + 2, rng)
    sched = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    c = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 2))
    t = jnp.zeros((2,))

    base = LatentDiffusion(unet=unet, unet_params=params, schedule=sched,
                           conditioning_key="concat", cond_stage_key="segmentation")
    untiled = base.apply_model(x, t, {"c_concat": [c]})

    import dataclasses
    tiled = dataclasses.replace(
        base, split_input_params={"ks": 8, "stride": 4})
    out = tiled.apply_model(x, t, {"c_concat": [c]})
    assert out.shape == untiled.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # degenerate grid (one patch covering the canvas) == untiled exactly
    one_patch = dataclasses.replace(
        base, split_input_params={"ks": 16, "stride": 16})
    np.testing.assert_allclose(
        np.asarray(one_patch.apply_model(x, t, {"c_concat": [c]})),
        np.asarray(untiled), atol=1e-5)


def test_tiled_apply_model_hybrid(rng):
    """Hybrid = spatial c_concat tiled + text context repeated per patch
    (beyond the reference, whose assert len(cond)==1 excludes hybrid)."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.ldm import LatentDiffusion

    unet, params = _tiny_unet(3 + 2, rng, context_dim=16)
    sched = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    x = jax.random.normal(rng, (1, 16, 16, 3))
    c_sp = jax.random.normal(jax.random.fold_in(rng, 1), (1, 16, 16, 2))
    ctx = jax.random.normal(jax.random.fold_in(rng, 2), (1, 4, 16))
    t = jnp.zeros((1,))

    import dataclasses
    base = LatentDiffusion(unet=unet, unet_params=params, schedule=sched,
                           conditioning_key="hybrid")
    cond = {"c_concat": [c_sp], "c_crossattn": [ctx]}
    untiled = base.apply_model(x, t, cond)
    one_patch = dataclasses.replace(
        base, split_input_params={"ks": 16, "stride": 16})
    np.testing.assert_allclose(
        np.asarray(one_patch.apply_model(x, t, cond)), np.asarray(untiled),
        atol=1e-5)
    multi = dataclasses.replace(base, split_input_params={"ks": 8, "stride": 4})
    out = multi.apply_model(x, t, cond)
    assert out.shape == (1, 16, 16, 3) and np.isfinite(np.asarray(out)).all()


def test_tiled_bbox_patch_retokenization(rng):
    """Layout2Img tiled path: per-patch crop codes replace the last two
    layout tokens and are re-encoded (ddpm.py:929-969)."""
    import dataclasses

    import flax.linen as nn

    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.data.layout import BBoxTokenizer
    from sd_tpu.models.ldm import LatentDiffusion

    tok = BBoxTokenizer(n_classes=4, n_bins=32, max_objects=2)

    class TokEmbedder(nn.Module):
        @nn.compact
        def __call__(self, ids):
            return nn.Embed(tok.vocab_size, 16)(ids)

    emb = TokEmbedder()
    ids = jnp.asarray(tok([[(1, 0.1, 0.1, 0.5, 0.5)]]))  # [1, 10]
    emb_params = emb.init(rng, ids)["params"]

    unet, params = _tiny_unet(3, rng, context_dim=16)
    # un-zero the zero-init projections (the zero_module contract) so the
    # cross-attention context can influence the output at init
    leaves, treedef = jax.tree.flatten(params)
    leaves = [
        jax.random.normal(jax.random.fold_in(rng, i), l.shape) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    sched = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    ldm = LatentDiffusion(
        unet=unet, unet_params=params, schedule=sched,
        conditioning_key="crossattn", cond_stage_key="coordinates_bbox",
        cond_stage_model=emb, cond_stage_params=emb_params,
        bbox_tokenizer=tok,
        split_input_params={"ks": 8, "stride": 8,
                            "original_image_size": (64, 64), "vqf": 4},
    )
    x = jax.random.normal(rng, (1, 16, 16, 3))
    out = ldm.apply_model(x, jnp.zeros((1,)), {"c_crossattn": [ids]})
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # crop codes depend on original_image_size -> different size, different out
    ldm2 = dataclasses.replace(
        ldm, split_input_params={"ks": 8, "stride": 8,
                                 "original_image_size": (256, 256), "vqf": 4})
    out2 = ldm2.apply_model(x, jnp.zeros((1,)), {"c_crossattn": [ids]})
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0


def test_tiled_apply_model_nonsquare_canvas(rng):
    """ks must clamp to the SMALLER canvas dim (review r2: width < ks used to
    crash fold_patches with a square-weight broadcast error)."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.ldm import LatentDiffusion

    unet, params = _tiny_unet(3, rng)
    sched = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    import dataclasses
    ldm = LatentDiffusion(unet=unet, unet_params=params, schedule=sched,
                          conditioning_key=None,
                          split_input_params={"ks": 16, "stride": 8})
    x = jax.random.normal(rng, (1, 32, 12, 3))  # width 12 < ks 16
    out = ldm.apply_model(x, jnp.zeros((1,)), None)
    assert out.shape == (1, 32, 12, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_crossattn_cond_list_concatenates_tokens(rng):
    """c_crossattn LISTS concatenate along the TOKEN axis (ddpm.py:1409 —
    RDM stacks query+neighbor contexts), not the embedding axis."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.ldm import LatentDiffusion

    unet, params = _tiny_unet(3, rng, context_dim=16)
    sched = DiffusionSchedule.create(20, "linear", 0.0015, 0.0195)
    ldm = LatentDiffusion(unet=unet, unet_params=params, schedule=sched,
                          conditioning_key="crossattn")
    x = jax.random.normal(rng, (1, 16, 16, 3))
    c1 = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4, 16))
    c2 = jax.random.normal(jax.random.fold_in(rng, 2), (1, 3, 16))
    # 4+3=7 context tokens at the UNet's context_dim=16: embedding-axis
    # concat would produce [1, 4?, 32] and fail the K/V projection
    out = ldm.apply_model(x, jnp.zeros((1,)), {"c_crossattn": [c1, c2]})
    assert out.shape == (1, 16, 16, 3)
