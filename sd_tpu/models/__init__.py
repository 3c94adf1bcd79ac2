from sd_tpu.models.clip import CLIPTextModel, CLIPTextConfig, port_clip_text
from sd_tpu.models.ldm import LatentDiffusion
from sd_tpu.models.unet import UNetConfig, UNetModel, port_unet
from sd_tpu.models.vae import (
    AutoencoderKL,
    IdentityFirstStage,
    VectorQuantizer,
    VQModel,
    port_autoencoder_kl,
    port_vq_model,
)
