"""End-to-end seed parity: the BASELINE correctness contract at test scale.

Given identical x_T and a weight-ported UNet, the full 50-step PLMS and DDIM
sampling loops must produce (near-)identical final latents to the reference
stack (reference PLMSSampler/DDIMSampler driving the reference torch UNet).
This is the LPIPS<0.1 seed-match requirement, checked exactly (fp32) on a
tiny SD-shaped model — the full-scale run only needs real released weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.models.unet import UNetConfig, UNetModel, port_unet
from sd_tpu.samplers import ddim_sample, plms_sample
from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, t2n, torch_manual_seed

UNET_KW = dict(
    image_size=16, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=[1, 2],
    num_heads=4, use_spatial_transformer=True, transformer_depth=1,
    context_dim=24, legacy=False,
)

SCHED = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear",
                                 linear_start=0.00085, linear_end=0.012)


@pytest.fixture(scope="module")
def stacks():
    torch = torch_manual_seed(100)
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    ref_unet = RefUNet(**UNET_KW).eval()
    with torch.no_grad():
        for _, prm in ref_unet.named_parameters():
            if prm.abs().max() == 0:
                prm.normal_(std=0.02)

    class FakeLDM:
        parameterization = "eps"

        def __init__(self):
            self.alphas_cumprod = torch.tensor(SCHED.alphas_cumprod)
            self.alphas_cumprod_prev = torch.tensor(SCHED.alphas_cumprod_prev)
            self.sqrt_one_minus_alphas_cumprod = torch.tensor(
                SCHED.sqrt_one_minus_alphas_cumprod)
            self.betas = torch.tensor(SCHED.betas)
            self.num_timesteps = 1000
            self.device = self.betas.device

        def apply_model(self, x, t, c):
            with torch.no_grad():
                return ref_unet(x, t, c)

    model = UNetModel(config=UNetConfig.from_dict(UNET_KW))
    params = port_unet(ref_unet.state_dict(), model.config, prefix="")

    def jax_eps(x, t, c):
        return model.apply({"params": params}, x, t, c)

    return FakeLDM(), jax_eps


def _ctx(torch, b=1):
    torch.manual_seed(7)
    return torch.randn(b, 5, 24)


def test_plms50_cfg_seed_parity(stacks):
    """The flagship operating point: 50-step PLMS with CFG 7.5."""
    import torch

    fake, jax_eps = stacks
    from ldm.models.diffusion.plms import PLMSSampler

    class CPUPLMS(PLMSSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    torch.manual_seed(8)
    x_T = torch.randn(1, 4, 16, 16)
    c = _ctx(torch)
    uc = torch.zeros_like(c)
    sampler = CPUPLMS(fake)
    ref, _ = sampler.sample(S=50, batch_size=1, shape=(4, 16, 16),
                            conditioning=c, eta=0.0, x_T=x_T,
                            unconditional_guidance_scale=7.5,
                            unconditional_conditioning=uc, verbose=False)

    got, _ = plms_sample(
        jax_eps, SCHED, (1, 16, 16, 4), cond=jnp.asarray(t2n(c)),
        uncond=jnp.zeros((1, 5, 24)), guidance_scale=7.5,
        rng=jax.random.PRNGKey(0), num_steps=50,
        x_T=jnp.asarray(nchw_to_nhwc(t2n(x_T))),
    )
    diff = np.abs(nhwc_to_nchw(got) - ref.numpy())
    # 50 steps of compounded fp32-vs-fp32 framework noise stays tiny —
    # far inside the LPIPS<0.1 target's tolerance
    assert diff.max() < 2e-2, diff.max()
    assert diff.mean() < 3e-3, diff.mean()


def test_ddim50_seed_parity(stacks):
    import torch

    fake, jax_eps = stacks
    from ldm.models.diffusion.ddim import DDIMSampler

    class CPUDDIM(DDIMSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    torch.manual_seed(9)
    x_T = torch.randn(1, 4, 16, 16)
    c = _ctx(torch)
    sampler = CPUDDIM(fake)
    ref, _ = sampler.sample(S=50, batch_size=1, shape=(4, 16, 16),
                            conditioning=c, eta=0.0, x_T=x_T, verbose=False)

    got, _ = ddim_sample(
        jax_eps, SCHED, (1, 16, 16, 4), cond=jnp.asarray(t2n(c)),
        rng=jax.random.PRNGKey(0), num_steps=50,
        x_T=jnp.asarray(nchw_to_nhwc(t2n(x_T))),
    )
    diff = np.abs(nhwc_to_nchw(got) - ref.numpy())
    assert diff.max() < 2e-2, diff.max()
    assert diff.mean() < 3e-3, diff.mean()
