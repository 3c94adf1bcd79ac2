"""LPIPS perceptual distance — in-repo rebuild of taming's ``LPIPS``.

Pipeline (standard lpips-vgg): imagenet-stat ScalingLayer -> VGG16 taps ->
channel-unit-normalize -> squared diff -> learned 1x1 'lin' heads -> spatial
mean -> sum over the five taps. Weight port accepts the lpips ``vgg.pth``
linear-head checkpoint (keys ``lin{i}.model.1.weight``) plus a torchvision
VGG16 state_dict.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from sd_tpu.models.vgg import VGG16Features, port_vgg16_features
from sd_tpu.utils import port

__all__ = ["LPIPS", "port_lpips"]

_TAPS = ["relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"]
_CHNS = [64, 128, 256, 512, 512]

# lpips ScalingLayer constants (RGB shift/scale for [-1,1] inputs)
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance between two [-1,1] NHWC image batches -> [B,1,1,1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        vgg = VGG16Features(dtype=self.dtype, name="vgg")

        def scaled(t):
            return (t - _SHIFT.astype(t.dtype)) / _SCALE.astype(t.dtype)

        fx = vgg(scaled(x))
        fy = vgg(scaled(y))
        total = 0.0
        for i, tap in enumerate(_TAPS):
            d = (_unit_normalize(fx[tap]) - _unit_normalize(fy[tap])) ** 2
            lin = nn.Dense(1, use_bias=False, dtype=self.dtype, name=f"lin_{i}")
            val = lin(d).mean(axis=(1, 2), keepdims=True)  # spatial mean
            total = total + val
        return total  # [B, 1, 1, 1]


def port_lpips(vgg_sd, lin_sd) -> Dict[str, Any]:
    """(torchvision vgg16 sd, lpips-lin sd) -> LPIPS params.

    ``lin_sd`` keys: ``lin{i}.model.1.weight`` with shape [1, C, 1, 1].
    """
    params: Dict[str, Any] = {"vgg": port_vgg16_features(vgg_sd)}
    for i in range(5):
        w = port.to_numpy(lin_sd[f"lin{i}.model.1.weight"])
        params[f"lin_{i}"] = {"kernel": w[:, :, 0, 0].T}
    return params
