from sd_tpu.core.schedules import (
    DiffusionSchedule,
    extract,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    predict_eps_from_start,
    predict_start_from_noise,
    q_posterior,
    q_sample,
    timestep_embedding,
)
from sd_tpu.core.distributions import DiagonalGaussian, normal_kl
