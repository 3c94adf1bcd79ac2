"""Tiny model configs for tests and smoke runs — reference-style YAML node
shapes, scaled down to run in seconds on CPU."""

from __future__ import annotations

from typing import Dict

__all__ = ["tiny_sd_model_config", "tiny_uncond_model_config",
           "tiny_class_cond_model_config"]


def tiny_sd_model_config(context_dim: int = 24, vocab_size: int = 64) -> Dict:
    """A miniature SD-shaped LatentDiffusion config: KL first stage (f2),
    crossattn text conditioning, spatial-transformer UNet."""
    return {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "linear_start": 0.00085,
            "linear_end": 0.012,
            "timesteps": 1000,
            "image_size": 16,
            "channels": 4,
            "scale_factor": 0.18215,
            "cond_stage_key": "caption",
            "conditioning_key": "crossattn",
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {
                    "image_size": 16,
                    "in_channels": 4,
                    "out_channels": 4,
                    "model_channels": 32,
                    "attention_resolutions": [2],
                    "num_res_blocks": 1,
                    "channel_mult": [1, 2],
                    "num_heads": 4,
                    "use_spatial_transformer": True,
                    "transformer_depth": 1,
                    "context_dim": context_dim,
                },
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.AutoencoderKL",
                "params": {
                    "embed_dim": 4,
                    "ddconfig": {
                        "double_z": True,
                        "z_channels": 4,
                        "resolution": 32,
                        "in_channels": 3,
                        "out_ch": 3,
                        "ch": 32,
                        "ch_mult": [1, 2],
                        "num_res_blocks": 1,
                        "attn_resolutions": [],
                        "dropout": 0.0,
                    },
                },
            },
            "cond_stage_config": {
                "target": "sd_tpu.models.encoders.TransformerEmbedder",
                "params": {
                    "n_embed": context_dim,
                    "n_layer": 1,
                    "vocab_size": vocab_size,
                    "max_seq_len": 8,
                },
            },
        },
    }


def tiny_uncond_model_config() -> Dict:
    """Unconditional pixel-ish LDM (identity-like tiny VAE, no cond stage)."""
    cfg = tiny_sd_model_config()
    cfg["params"]["cond_stage_config"] = "__is_unconditional__"
    cfg["params"].pop("conditioning_key")
    unet = cfg["params"]["unet_config"]["params"]
    unet.update(use_spatial_transformer=False, context_dim=None, num_heads=4)
    return cfg


def tiny_class_cond_model_config(n_classes: int = 17) -> Dict:
    """Class-conditional LDM shaped like the reference's cin256-v2
    (ClassEmbedder crossattn cond stage with the extra uncond embedding row,
    ``configs/latent-diffusion/cin256-v2.yaml``), scaled down."""
    cfg = tiny_sd_model_config()
    cfg["params"]["cond_stage_key"] = "class_label"
    cfg["params"]["cond_stage_config"] = {
        "target": "ldm.modules.encoders.modules.ClassEmbedder",
        "params": {"n_classes": n_classes,
                   "embed_dim": cfg["params"]["unet_config"]["params"]["context_dim"]},
    }
    return cfg
