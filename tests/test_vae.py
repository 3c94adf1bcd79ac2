"""VAE parity tests: sd_tpu.models.vae vs the reference Encoder/Decoder
(ldm/modules/diffusionmodules/model.py) with ported weights, plus
VectorQuantizer behavior checks (in-repo replacement for taming's)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.vae import (
    AutoencoderKL,
    Decoder,
    Encoder,
    IdentityFirstStage,
    VectorQuantizer,
    VQModel,
    port_autoencoder_kl,
    port_decoder,
    port_encoder,
    port_vq_model,
)
from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, run_torch, t2n, torch_manual_seed

TINY = dict(
    double_z=True,
    z_channels=4,
    resolution=16,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[8],
    dropout=0.0,
)


def ref_encoder_decoder():
    torch = torch_manual_seed(20)
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc

    enc = RefEnc(**TINY)
    dec = RefDec(**TINY)
    return torch, enc, dec


def test_encoder_parity():
    torch, enc, _ = ref_encoder_decoder()
    x = torch.randn(2, 3, 16, 16)
    expected = run_torch(enc, x)

    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    params = port_encoder(sd, TINY)
    kw = {k: v for k, v in TINY.items() if k not in ("out_ch",)}
    mod = Encoder(**kw)
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert out.shape == (2, 8, 8, 8)  # f2 (len(ch_mult)=2), 2*z_channels moments
    np.testing.assert_allclose(nhwc_to_nchw(out), t2n(expected), atol=3e-4, rtol=1e-4)


def test_decoder_parity():
    torch, _, dec = ref_encoder_decoder()
    z = torch.randn(2, 4, 8, 8)
    expected = run_torch(dec, z)

    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    params = port_decoder(sd, TINY)
    kw = {k: v for k, v in TINY.items() if k not in ("double_z", "in_channels")}
    mod = Decoder(**kw)
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(z)))
    assert out.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(nhwc_to_nchw(out), t2n(expected), atol=3e-4, rtol=1e-4)


def make_kl_state_dict():
    """Assemble a full AutoencoderKL-style state_dict from reference modules
    (the Lightning class itself needs pytorch_lightning, which is absent)."""
    torch, enc, dec = ref_encoder_decoder()
    embed_dim = 4
    quant = torch.nn.Conv2d(2 * TINY["z_channels"], 2 * embed_dim, 1)
    post = torch.nn.Conv2d(embed_dim, TINY["z_channels"], 1)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post.state_dict().items()})
    return torch, (enc, dec, quant, post), sd


def test_autoencoder_kl_roundtrip_parity():
    torch, (enc, dec, quant, post), sd = make_kl_state_dict()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        enc.eval(), dec.eval()
        moments = quant(enc(x))
        mean = moments[:, :4]
        expected = dec(post(mean))

    model = AutoencoderKL(ddconfig=TINY, embed_dim=4)
    params = port_autoencoder_kl(sd, TINY)
    posterior = model.apply({"params": params}, nchw_to_nhwc(t2n(x)), method=model.encode)
    np.testing.assert_allclose(
        nhwc_to_nchw(posterior.mean), t2n(mean), atol=3e-4, rtol=1e-4
    )
    rec = model.apply({"params": params}, posterior.mean, method=model.decode)
    np.testing.assert_allclose(nhwc_to_nchw(rec), t2n(expected), atol=1e-3, rtol=1e-4)


def test_autoencoder_kl_sample_path(rng):
    _, _, sd = make_kl_state_dict()
    model = AutoencoderKL(ddconfig=TINY, embed_dim=4)
    params = port_autoencoder_kl(sd, TINY)
    x = jax.random.normal(rng, (1, 16, 16, 3))
    rec, posterior = model.apply({"params": params}, x, rng=rng)
    assert rec.shape == (1, 16, 16, 3)
    assert posterior.mean.shape == (1, 8, 8, 4)


# ---------------------------------------------------------------- quantizer


def test_vector_quantizer_assigns_nearest(rng):
    vq = VectorQuantizer(n_embed=8, embed_dim=4, beta=0.25)
    params = vq.init(rng, jnp.zeros((1, 2, 2, 4)))["params"]
    codebook = np.asarray(params["embedding"])
    z = jnp.asarray(codebook[3]).reshape(1, 1, 1, 4) + 1e-6
    z = jnp.broadcast_to(z, (1, 2, 2, 4))
    z_q, loss, idx = vq.apply({"params": params}, z)
    assert (np.asarray(idx) == 3).all()
    np.testing.assert_allclose(np.asarray(z_q), np.broadcast_to(codebook[3], z_q.shape), atol=1e-5)
    assert float(loss) < 1e-9


def test_vector_quantizer_straight_through(rng):
    vq = VectorQuantizer(n_embed=8, embed_dim=4)
    params = vq.init(rng, jnp.zeros((1, 2, 2, 4)))["params"]

    def f(z):
        z_q, loss, _ = vq.apply({"params": params}, z)
        return jnp.sum(z_q)

    g = jax.grad(f)(jax.random.normal(rng, (1, 2, 2, 4)))
    # straight-through: d z_q / d z == identity
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_vq_model_interface_contract(rng):
    """decode(force_not_quantize) vs decode() quantizing — VQModelInterface."""
    torch = torch_manual_seed(21)
    vq_cfg = dict(TINY, double_z=False)
    model = VQModel(ddconfig=vq_cfg, n_embed=16, embed_dim=4)
    x = jax.random.normal(rng, (1, 16, 16, 3))
    variables = model.init(rng, x)

    h = model.apply(variables, x, method=model.encode_pre_quant)
    assert h.shape == (1, 8, 8, 4)
    quant, loss, idx = model.apply(variables, x, method=model.encode)
    assert idx.shape == (1, 8, 8)
    dec1 = model.apply(variables, h, method=model.decode)  # quantizes inside
    dec2 = model.apply(variables, quant, True, method=model.decode)  # already quantized
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=1e-5)


def test_vq_model_port_shapes():
    """port_vq_model maps a synthetic taming-style state_dict onto VQModel."""
    torch = torch_manual_seed(22)
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc

    vq_cfg = dict(TINY, double_z=False)
    enc = RefEnc(**vq_cfg)
    dec = RefDec(**vq_cfg)
    quant = torch.nn.Conv2d(4, 4, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    emb = torch.nn.Embedding(16, 4)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post.state_dict().items()})
    sd["quantize.embedding.weight"] = emb.weight
    params = port_vq_model(sd, vq_cfg)

    model = VQModel(ddconfig=vq_cfg, n_embed=16, embed_dim=4)
    x = jnp.ones((1, 16, 16, 3))
    dec_out, loss, idx = model.apply({"params": params}, x)
    assert dec_out.shape == (1, 16, 16, 3)
    # quantized latents come from the ported codebook
    assert set(np.asarray(idx).ravel()).issubset(set(range(16)))


def test_identity_first_stage():
    ident = IdentityFirstStage()
    x = jnp.ones((1, 4, 4, 3))
    assert ident.encode(x) is x and ident.decode(x) is x
