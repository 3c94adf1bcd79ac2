"""End-to-end checkpoint port: a synthetic reference-layout LDM state_dict
(model.diffusion_model.* + first_stage_model.* + model_ema.* mangled keys)
loads through build_latent_diffusion and reproduces torch activations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.clip import CLIPTextConfig, CLIPTextModel, port_clip_text
from sd_tpu.utils.checkpoint import filter_state_dict
from sd_tpu.utils.config import build_latent_diffusion
from sd_tpu.utils.port import demangle_ema_keys
from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, t2n, torch_manual_seed

UNET_KW = dict(
    image_size=16, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24, legacy=False,
)
DD = dict(
    double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
)


def make_reference_ldm_state_dict(torch):
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    unet = RefUNet(**UNET_KW).eval()
    with torch.no_grad():
        for _, prm in unet.named_parameters():
            if prm.abs().max() == 0:
                prm.normal_(std=0.02)
    enc, dec = RefEnc(**DD).eval(), RefDec(**DD).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v
        # EMA shadow: mangled name, distinct values (x2) to detect mixups
        sd["model_ema." + f"diffusion_model.{k}".replace(".", "")] = v * 2.0
    for mod, prefix in [(enc, "encoder"), (dec, "decoder"),
                        (quant, "quant_conv"), (post, "post_quant_conv")]:
        for k, v in mod.state_dict().items():
            sd[f"first_stage_model.{prefix}.{k}"] = v
    return sd, unet, (enc, dec, quant, post)


def model_cfg():
    return {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "linear_start": 0.00085, "linear_end": 0.012, "timesteps": 1000,
            "image_size": 16, "channels": 4, "scale_factor": 0.18215,
            "conditioning_key": "crossattn", "cond_stage_key": "caption",
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": dict(UNET_KW),
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.AutoencoderKL",
                "params": {"embed_dim": 4, "ddconfig": dict(DD)},
            },
            # a cond stage keeps conditioning_key=crossattn; its params
            # are not part of the synthetic checkpoint (apply_model takes
            # pre-computed context directly)
            "cond_stage_config": {
                "target": "sd_tpu.models.encoders.TransformerEmbedder",
                "params": {"n_embed": 24, "n_layer": 1, "vocab_size": 16,
                            "max_seq_len": 8},
            },
        },
    }


def test_full_checkpoint_port_forward_parity():
    torch = torch_manual_seed(80)
    sd, ref_unet, (enc, dec, quant, post) = make_reference_ldm_state_dict(torch)

    ldm = build_latent_diffusion(model_cfg(), state_dict=sd)

    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor([7.0, 400.0])
    ctx = torch.randn(2, 5, 24)
    with torch.no_grad():
        expected_eps = ref_unet(x, t, ctx)
    got = ldm.apply_model(
        jnp.asarray(nchw_to_nhwc(t2n(x))), jnp.asarray(t2n(t)),
        jnp.asarray(t2n(ctx)),
    )
    np.testing.assert_allclose(nhwc_to_nchw(got), t2n(expected_eps),
                               atol=5e-4, rtol=1e-3)

    # first stage: encode mean parity
    img = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        moments = quant(enc(img))
        mean = moments[:, :4]
    posterior = ldm.encode_first_stage(jnp.asarray(nchw_to_nhwc(t2n(img))))
    np.testing.assert_allclose(nhwc_to_nchw(posterior.mean), t2n(mean),
                               atol=5e-4, rtol=1e-3)


def test_ema_demangling_recovers_dotted_names():
    torch = torch_manual_seed(81)
    sd, _, _ = make_reference_ldm_state_dict(torch)
    ema = demangle_ema_keys(sd, model_prefix="model.")
    assert len(ema) > 50
    for k, v in list(ema.items())[:5]:
        assert k.startswith("model.diffusion_model.")
        np.testing.assert_allclose(v, 2.0 * np.asarray(sd[k]), rtol=1e-6)


def test_ema_weights_portable_as_model_weights():
    """Release inference ckpts are EMA-only: demangled EMA weights must load
    through the same port path (use_ema:false contract, v1-inference.yaml:17)."""
    torch = torch_manual_seed(82)
    sd, ref_unet, _ = make_reference_ldm_state_dict(torch)
    ema = demangle_ema_keys(sd, model_prefix="model.")
    sd_ema = dict(sd)
    sd_ema.update(ema)  # overwrite model weights with the EMA (x2) shadows

    ldm = build_latent_diffusion(model_cfg(), state_dict=sd_ema)
    x = jnp.ones((1, 16, 16, 4))
    got = ldm.apply_model(x, jnp.asarray([0.0]), jnp.ones((1, 5, 24)))
    # doubled weights -> different output than the non-EMA port
    ldm2 = build_latent_diffusion(model_cfg(), state_dict=sd)
    got2 = ldm2.apply_model(x, jnp.asarray([0.0]), jnp.ones((1, 5, 24)))
    assert np.abs(np.asarray(got) - np.asarray(got2)).max() > 1e-4


def test_clip_port_with_checkpoint_prefix():
    """The SD checkpoint nests HF CLIP under
    cond_stage_model.transformer.text_model. (modules.py:146)."""
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(83)
    tiny = CLIPTextConfig(vocab_size=50, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          max_position_embeddings=16, eos_token_id=49)
    hf = HFModel(HFConfig(
        vocab_size=50, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu", eos_token_id=49,
    )).eval()
    sd = {f"cond_stage_model.transformer.{k}": v for k, v in hf.state_dict().items()}
    params = port_clip_text(sd, tiny,
                            prefix="cond_stage_model.transformer.text_model.")
    ids = torch.randint(0, 49, (1, 16))
    with torch.no_grad():
        expected = hf(input_ids=ids).last_hidden_state
    got = CLIPTextModel(tiny).apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got["last_hidden_state"]),
                               expected.numpy(), atol=2e-4, rtol=1e-3)


def test_filter_state_dict_ignore_keys():
    sd = {"model.a": 1, "model_ema.b": 2, "first_stage_model.c": 3}
    out = filter_state_dict(sd, ignore_keys=["model_ema."])
    assert set(out) == {"model.a", "first_stage_model.c"}
