from sd_tpu.training.diffusion_loss import (
    LDMTrainer,
    TrainState,
    create_train_state,
    make_train_step,
    p_losses,
)
from sd_tpu.training.ema import EmaState, ema_init, ema_update
from sd_tpu.training.lr_schedules import (
    lambda_linear,
    lambda_warmup_cosine,
    lambda_warmup_cosine2,
)
