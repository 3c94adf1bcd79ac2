"""Tests for profiling/metrics utilities."""

import json
import os

import jax.numpy as jnp
import numpy as np

from sd_tpu.models.unet import UNetConfig
from sd_tpu.utils.profiling import MetricsWriter, StepTimer, count_params, unet_flops


def test_count_params():
    params = {"a": jnp.zeros((10, 10)), "b": {"c": jnp.zeros(5)}}
    assert count_params(params, verbose=False) == 105


def test_unet_flops_sd_scale():
    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, legacy=False,
    ))
    f = unet_flops(cfg, latent_hw=64, batch=1)
    # SD v1 UNet forward is ~0.8 TFLOP-ish at 64 latents; sanity bounds
    assert 2e11 < f < 3e12, f


def test_step_timer():
    t = StepTimer(window=2)
    assert t.step() is None
    out = t.step()
    assert out is not None and out["steps_per_sec"] > 0


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": jnp.asarray(0.5), "acc": 0.9, "skip": np.zeros(3)})
    w.write(2, {"loss": 0.4}, split="val")
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[0]["loss"] == 0.5 and "skip" not in lines[0]
    assert lines[1]["split"] == "val"
