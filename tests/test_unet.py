"""Full-model UNet parity vs the reference UNetModel
(ldm/modules/diffusionmodules/openaimodel.py:413-742) across the config
variants the shipped YAMLs actually use (SURVEY.md §2.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.unet import UNetConfig, UNetModel, build_unet_plan, port_unet
from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, t2n, torch_manual_seed


def build_ref_unet(torch, **kwargs):
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    ref = RefUNet(**kwargs)
    ref.eval()
    # zero-init out conv hides wiring bugs; randomize
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().max() == 0:
                p.normal_(std=0.02)
    return ref


def run_parity(ref_kwargs, our_cfg, with_context=False, with_y=False, seed=30,
               size=16, atol=5e-4):
    torch = torch_manual_seed(seed)
    ref = build_ref_unet(torch, **ref_kwargs)
    B = 2
    x = torch.randn(B, our_cfg.in_channels, size, size)
    t = torch.tensor([3.0, 500.0])
    args, jargs = [x, t], []
    ctx = y = None
    if with_context:
        ctx = torch.randn(B, 7, our_cfg.context_dim)
        args.append(ctx)
    if with_y:
        y = torch.randint(0, our_cfg.num_classes, (B,))
    with torch.no_grad():
        expected = ref(x, t, ctx, y)

    model = UNetModel(config=our_cfg)
    params = port_unet(ref.state_dict(), our_cfg, prefix="")
    out = model.apply(
        {"params": params},
        nchw_to_nhwc(t2n(x)),
        jnp.asarray(t2n(t)),
        jnp.asarray(t2n(ctx)) if ctx is not None else None,
        jnp.asarray(t2n(y)) if y is not None else None,
    )
    np.testing.assert_allclose(nhwc_to_nchw(out), t2n(expected), atol=atol, rtol=1e-3)
    return model, params


SD_LIKE = dict(
    image_size=8, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=[1, 2],
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24, legacy=False,
)


def test_unet_sd_style_parity():
    """Tiny clone of the SD v1 config (spatial transformer, crossattn)."""
    cfg = UNetConfig.from_dict(SD_LIKE)
    run_parity(dict(SD_LIKE, use_checkpoint=False), cfg, with_context=True)


def test_unet_legacy_qkv_parity():
    """Tiny clone of the class-cond ImageNet config (legacy QKV attention,
    num_head_channels, resblock_updown, scale-shift norm)."""
    kwargs = dict(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_head_channels=8, use_scale_shift_norm=True, resblock_updown=True,
    )
    cfg = UNetConfig.from_dict(kwargs)
    run_parity(kwargs, cfg)


def test_unet_class_conditional_parity():
    kwargs = dict(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=4, num_classes=10,
    )
    cfg = UNetConfig.from_dict(kwargs)
    run_parity(kwargs, cfg, with_y=True)


def test_unet_new_attention_order_parity():
    kwargs = dict(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=4, use_new_attention_order=True,
    )
    cfg = UNetConfig.from_dict(kwargs)
    run_parity(kwargs, cfg)


def test_unet_legacy_true_spatial_transformer_parity():
    """SD v1 actually ships legacy=True (default) with num_heads=8."""
    kwargs = dict(SD_LIKE, legacy=True)
    cfg = UNetConfig.from_dict(kwargs)
    run_parity(kwargs, cfg, with_context=True)


def test_unet_plan_matches_sd_v1_shape():
    """The real SD v1 plan: 860M params-worth of structure."""
    cfg = UNetConfig.from_dict(dict(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=True, legacy=False,
    ))
    plan = build_unet_plan(cfg)
    assert len(plan["input_blocks"]) == 12
    assert len(plan["output_blocks"]) == 12
    # attention at ds 1, 2, 4 but not at 8 (the deepest level)
    sts = [d for blk in plan["input_blocks"] for d in blk if d["kind"] == "spatial_transformer"]
    assert len(sts) == 6
    assert {s["ch"] for s in sts} == {320, 640, 1280}
    # head dims per level: ch/8
    assert {s["dim_head"] for s in sts} == {40, 80, 160}


def test_unet_remat_gradients(rng):
    """use_checkpoint=True must produce identical outputs and valid grads."""
    cfg = UNetConfig.from_dict(dict(SD_LIKE, use_checkpoint=True))
    cfg_plain = UNetConfig.from_dict(SD_LIKE)
    model_r = UNetModel(config=cfg)
    model_p = UNetModel(config=cfg_plain)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10.0])
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 7, 24))
    params = model_r.init(rng, x, t, ctx)["params"]
    out_r = model_r.apply({"params": params}, x, t, ctx)
    out_p = model_p.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p), atol=1e-5)

    def loss(p):
        # sum (not squared mean): the zero-init out_conv makes out == 0 at
        # init, so mean(out**2) would have identically-zero gradients.
        return jnp.sum(model_r.apply({"params": p}, x, t, ctx))

    g = jax.grad(loss)(params)
    gnorm = sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(g))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_unet_codebook_head():
    """n_embed enables the codebook-id prediction head (openaimodel.py:689-694)."""
    kwargs = dict(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=4, n_embed=17,
    )
    cfg = UNetConfig.from_dict(kwargs)
    model = UNetModel(config=cfg)
    x = jnp.ones((1, 16, 16, 3))
    t = jnp.array([0.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (1, 16, 16, 17)
