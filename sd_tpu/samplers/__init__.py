from sd_tpu.samplers.common import (
    build_ddim_tables,
    ddim_step_from_eps,
    make_guided_eps,
    wrap_model_output,
)
from sd_tpu.samplers.ancestral import p_sample_loop, progressive_denoising
from sd_tpu.samplers.ddim import ddim_decode, ddim_sample, ddim_stochastic_encode
from sd_tpu.samplers.dpm_solver import (
    DiscreteNoiseSchedule,
    dpm_solver_sample,
    dpm_solver_singlestep_sample,
)
from sd_tpu.samplers.plms import plms_sample
