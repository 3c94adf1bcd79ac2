"""VAE GAN training tests: loss functions vs closed forms, VGG/LPIPS port
parity vs torchvision, discriminator shape contract, and full two-optimizer
steps for both KL and VQ modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.vae import AutoencoderKL, VQModel
from sd_tpu.models.vgg import VGG16Features, port_vgg16_features
from sd_tpu.training.discriminator import NLayerDiscriminator
from sd_tpu.training.lpips import LPIPS
from sd_tpu.training.vae_gan import (
    VAEGANTrainer,
    adopt_weight,
    hinge_d_loss,
    measure_perplexity,
    vanilla_d_loss,
)
from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, t2n, torch_manual_seed

TINY_DD = dict(
    double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
)


def test_hinge_and_vanilla_d_loss():
    real = jnp.array([2.0, 2.0])
    fake = jnp.array([-2.0, -2.0])
    # perfectly separated: hinge loss = 0
    np.testing.assert_allclose(float(hinge_d_loss(real, fake)), 0.0)
    flipped = float(hinge_d_loss(fake, real))
    assert flipped == 3.0  # relu(1-(-2)) = 3 on both sides -> 0.5*(3+3)
    v = float(vanilla_d_loss(real, fake))
    assert 0 < v < 0.3


def test_adopt_weight_gating():
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(10), threshold=10)) == 1.0


def test_measure_perplexity_uniform_vs_collapsed():
    uniform = jnp.arange(16) % 4
    p, used = measure_perplexity(uniform, 4)
    np.testing.assert_allclose(float(p), 4.0, rtol=1e-5)
    assert int(used) == 4
    collapsed = jnp.zeros(16, jnp.int32)
    p2, used2 = measure_perplexity(collapsed, 4)
    np.testing.assert_allclose(float(p2), 1.0, rtol=1e-5)
    assert int(used2) == 1


def build_torch_vgg16_features(torch):
    """torchvision vgg16(cfg D).features layer-for-layer (torchvision absent
    in this environment) — same indices/state_dict keys."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for item in cfg:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = item
    return torch.nn.Sequential(*layers)


def test_vgg16_port_parity():
    torch = torch_manual_seed(60)
    ref = build_torch_vgg16_features(torch).eval()
    x = torch.randn(1, 3, 64, 64)
    # reference taps
    taps_idx = {3: "relu1_2", 8: "relu2_2", 15: "relu3_3", 22: "relu4_3",
                29: "relu5_3"}
    acts = {}
    h = x
    with torch.no_grad():
        for i, layer in enumerate(ref):
            h = layer(h)
            if i in taps_idx:
                acts[taps_idx[i]] = h

    sd = {f"features.{k}": v for k, v in ref.state_dict().items()}
    model = VGG16Features()
    params = port_vgg16_features(sd)
    got = model.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    for name in acts:
        np.testing.assert_allclose(
            nhwc_to_nchw(got[name]), t2n(acts[name]), atol=1e-3, rtol=1e-3
        )


def test_lpips_properties(rng):
    lpips = LPIPS()
    x = jax.random.normal(rng, (2, 64, 64, 3)) * 0.5
    params = lpips.init(jax.random.PRNGKey(0), x, x)["params"]
    # force positive lin weights so the metric behaves like a distance
    params = jax.tree.map(jnp.abs, params)
    d_same = lpips.apply({"params": params}, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jax.random.normal(jax.random.fold_in(rng, 1), x.shape) * 0.5
    d_diff = lpips.apply({"params": params}, x, y)
    assert float(d_diff.mean()) > 0
    assert d_diff.shape == (2, 1, 1, 1)


def test_discriminator_patch_output(rng):
    disc = NLayerDiscriminator(n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    variables = disc.init(rng, x)
    out = disc.apply(variables, x, train=False)
    # pix2pix receptive field: 64 -> 8x8ish patch logits, 1 channel
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 16


@pytest.mark.parametrize("mode", ["kl", "vq"])
def test_vae_gan_train_step(mode, rng):
    if mode == "kl":
        model = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    else:
        model = VQModel(ddconfig=dict(TINY_DD, double_z=False), n_embed=16,
                        embed_dim=4)
    lpips = LPIPS()
    x0 = jnp.zeros((2, 32, 32, 3))
    lpips_params = lpips.init(jax.random.PRNGKey(1), x0, x0)["params"]
    trainer = VAEGANTrainer(model=model, lpips=lpips, lpips_params=lpips_params,
                            disc_start=0, learning_rate=1e-4)
    state = trainer.init_state(jax.random.PRNGKey(2), image_shape=(2, 32, 32, 3))
    batch = {"image": jax.random.normal(rng, (2, 32, 32, 3)) * 0.5}

    step = jax.jit(trainer.train_step)
    new_state, log = step(state, batch, jax.random.PRNGKey(3))
    for k in ["total_loss", "nll_loss", "g_loss", "d_weight", "disc_loss",
              "logits_real", "logits_fake"]:
        assert np.isfinite(float(log[k])), (k, log[k])
    if mode == "vq":
        assert "perplexity" in log
    else:
        assert "kl_loss" in log
    # both parameter sets moved
    moved_ae = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.ae_params,
        new_state.ae_params)))
    moved_d = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.disc_params,
        new_state.disc_params)))
    assert moved_ae > 0 and moved_d > 0
    assert int(new_state.step) == 1


def test_adaptive_weight_is_positive_and_clipped(rng):
    model = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    lpips = LPIPS()
    x0 = jnp.zeros((2, 32, 32, 3))
    lpips_params = lpips.init(jax.random.PRNGKey(1), x0, x0)["params"]
    trainer = VAEGANTrainer(model=model, lpips=lpips, lpips_params=lpips_params,
                            disc_start=0)
    state = trainer.init_state(jax.random.PRNGKey(2), image_shape=(2, 32, 32, 3))
    batch = {"image": jax.random.normal(rng, (2, 32, 32, 3))}
    _, log = trainer.generator_step(state, batch, jax.random.PRNGKey(3))
    dw = float(log["d_weight"])
    assert 0.0 <= dw <= 1e4


def test_log_images_vae_contract(rng):
    from sd_tpu.training.trainer import log_images_vae

    model = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, rng=rng)["params"]
    out = log_images_vae(model, params, {"image": np.asarray(x)}, rng)
    assert set(out) == {"inputs", "reconstructions", "samples"}
    for v in out.values():
        assert v.shape == (2, 32, 32, 3)


def test_generator_gloss_uses_batch_stats(rng):
    """The generator's adversarial loss evaluates the discriminator in train
    mode (batch statistics), matching the reference's Lightning semantics
    (contperceptual.py:71-74): corrupting the RUNNING stats must not change
    the generator-step losses."""
    model = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    lpips = LPIPS()
    x0 = jnp.zeros((2, 32, 32, 3))
    lpips_params = lpips.init(jax.random.PRNGKey(1), x0, x0)["params"]
    trainer = VAEGANTrainer(model=model, lpips=lpips, lpips_params=lpips_params,
                            disc_start=0, learning_rate=1e-4)
    state = trainer.init_state(jax.random.PRNGKey(2), image_shape=(2, 32, 32, 3))
    batch = {"image": jax.random.normal(rng, (2, 32, 32, 3)) * 0.5}
    _, log_a = trainer.generator_step(state, batch, rng)

    bad_stats = jax.tree.map(lambda s: s + 1000.0, state.disc_stats)
    _, log_b = trainer.generator_step(
        state._replace(disc_stats=bad_stats), batch, rng)
    np.testing.assert_allclose(
        float(log_a["g_loss"]), float(log_b["g_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(log_a["total_loss"]), float(log_b["total_loss"]), rtol=1e-6)
