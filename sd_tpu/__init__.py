"""sd_tpu — a TPU-native latent diffusion framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of CompVis/stable-diffusion
(reference layout documented in SURVEY.md) designed for TPU hardware:

- Functional core: models are pytrees of params + pure ``apply`` functions.
- Samplers are jitted ``lax.scan`` state machines with classifier-free
  guidance folded into a single doubled-batch UNet call.
- Parallelism is GSPMD: a ``jax.sharding.Mesh`` plus PartitionSpecs —
  never baked into modules.
- Hot attention paths lower to Pallas flash-attention kernels.

Subpackages
-----------
core       diffusion math: beta schedules, q/p distributions, DDIM tables
ops        neural building blocks (flax.linen) + Pallas TPU kernels
models     VAE / UNet / CLIP / LatentDiffusion model definitions
samplers   DDIM, PLMS, DPM-Solver++, ancestral DDPM solvers (lax.scan)
parallel   mesh + sharding specs (data/tensor axes over ICI)
pipelines  txt2img / img2img / inpaint / bulk sampling applications
training   losses, EMA, LR schedules, train step, trainer harness
data       dataset interfaces and pipelines
utils      config registry, checkpoint IO, torch-weight port layer
"""

__version__ = "0.1.0"
