"""Full-shape (860M / 512²) synthetic-weight parity vs the torch reference.

r1 validated the port only on tiny configs; shape-dependent bugs (asymmetric
pad at real resolutions, the d=40/80/160 head paths, f8 at 512²) were
unexercised. This builds a REAL SD-v1-layout state_dict with random values
(torch side, no checkpoint needed — zero egress), ports it, and compares:

1. one CFG-doubled UNet step at 64x64x4 latents against the reference
   ``UNetModel.forward`` (``openaimodel.py:710-742``);
2. a 512² kl-f8 encode mean + decode roundtrip against the reference
   ``Encoder``/``Decoder`` (``autoencoder.py:324-342``, ``model.py:368-568``).

Opt-in: ~10 min of single-core compute — set SD_TPU_FULLSHAPE=1 to run
(the driver/CI cadence runs the fast suite; this is the production-shape
gate, run before perf/parity claims).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, t2n, torch_manual_seed

pytestmark = pytest.mark.skipif(
    not os.environ.get("SD_TPU_FULLSHAPE"),
    reason="full-shape parity is opt-in (SD_TPU_FULLSHAPE=1): ~10 min on CPU",
)

SD_UNET_KW = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=320,
    attention_resolutions=[4, 2, 1], num_res_blocks=2,
    channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
    transformer_depth=1, context_dim=768, use_checkpoint=False, legacy=False,
)
KL_F8_DD = dict(
    double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
    ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
    dropout=0.0,
)


def _unzero(torch, module, std=0.02):
    with torch.no_grad():
        for _, prm in module.named_parameters():
            if prm.abs().max() == 0:
                prm.normal_(std=std)
    return module


def test_fullshape_unet_cfg_step_parity():
    torch = torch_manual_seed(90)
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    ref = _unzero(torch, RefUNet(**SD_UNET_KW).eval())
    n_params = sum(p.numel() for p in ref.parameters())
    assert n_params > 8.5e8, f"not the 860M UNet: {n_params}"

    x = torch.randn(2, 4, 64, 64)          # CFG-doubled batch
    t = torch.tensor([981.0, 981.0])
    ctx = torch.randn(2, 77, 768)
    with torch.no_grad():
        expected = ref(x, t, ctx)

    sd = {f"model.diffusion_model.{k}": v for k, v in ref.state_dict().items()}
    del ref

    from sd_tpu.models.unet import UNetConfig, UNetModel, port_unet

    cfg = UNetConfig.from_dict(SD_UNET_KW)
    unet = UNetModel(config=cfg)
    params = port_unet(sd, cfg, prefix="model.diffusion_model.")
    got = unet.apply({"params": params},
                     jnp.asarray(nchw_to_nhwc(t2n(x))),
                     jnp.asarray(t2n(t)),
                     jnp.asarray(t2n(ctx)))
    exp = t2n(expected)
    scale = np.abs(exp).std() + 1e-8
    np.testing.assert_allclose(
        nhwc_to_nchw(got), exp, rtol=5e-3, atol=5e-3 * scale)


def test_fullshape_vae_512_roundtrip_parity():
    torch = torch_manual_seed(91)
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc

    enc = _unzero(torch, RefEnc(**KL_F8_DD).eval())
    dec = _unzero(torch, RefDec(**KL_F8_DD).eval())
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)

    img = torch.randn(1, 3, 512, 512) * 0.5
    with torch.no_grad():
        moments = quant(enc(img))
        mean = moments[:, :4]
        rec = dec(post(mean))

    sd = {}
    for mod, prefix in [(enc, "encoder"), (dec, "decoder"),
                        (quant, "quant_conv"), (post, "post_quant_conv")]:
        for k, v in mod.state_dict().items():
            sd[f"first_stage_model.{prefix}.{k}"] = v
    del enc, dec

    from sd_tpu.models.vae import AutoencoderKL, port_autoencoder_kl

    vae = AutoencoderKL(ddconfig=KL_F8_DD, embed_dim=4)
    params = port_autoencoder_kl(sd, KL_F8_DD, prefix="first_stage_model.")
    x = jnp.asarray(nchw_to_nhwc(t2n(img)))
    posterior = vae.apply({"params": params}, x, method=vae.encode)
    exp_mean = t2n(mean)
    scale = np.abs(exp_mean).std() + 1e-8
    np.testing.assert_allclose(
        nhwc_to_nchw(posterior.mean), exp_mean, rtol=5e-3, atol=5e-3 * scale)

    got_rec = vae.apply({"params": params}, posterior.mean, method=vae.decode)
    exp_rec = t2n(rec)
    scale = np.abs(exp_rec).std() + 1e-8
    np.testing.assert_allclose(
        nhwc_to_nchw(got_rec), exp_rec, rtol=5e-3, atol=5e-3 * scale)
