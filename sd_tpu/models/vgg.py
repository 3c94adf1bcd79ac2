"""VGG16 feature extractor — backbone of the LPIPS perceptual loss.

The reference imports LPIPS from taming-transformers, which wraps
torchvision's VGG16 (SURVEY.md §2.9 requires owning it in-repo). Only the
conv feature trunk is needed, sliced after relu1_2 / relu2_2 / relu3_3 /
relu4_3 / relu5_3 — the five LPIPS taps.

``port_vgg16_features`` maps a torchvision ``vgg16().features`` state_dict
(keys ``features.N.{weight,bias}``) onto this module.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sd_tpu.utils import port

__all__ = ["VGG16Features", "port_vgg16_features"]

# (out_channels per conv, 'M' = maxpool) — torchvision vgg16 cfg 'D'
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512]
# taps AFTER the relu of these conv indices (0-based over convs only)
_TAP_AFTER_CONV = {1: "relu1_2", 3: "relu2_2", 6: "relu3_3", 9: "relu4_3",
                   12: "relu5_3"}


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        """x: [B, H, W, 3] (any scaling — LPIPS normalizes upstream).
        Returns the five tap activations."""
        taps = {}
        conv_i = 0
        for item in _CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{conv_i}")(x)
            x = jax.nn.relu(x)
            if conv_i in _TAP_AFTER_CONV:
                taps[_TAP_AFTER_CONV[conv_i]] = x
            conv_i += 1
        return taps


def port_vgg16_features(sd, prefix: str = "features.") -> Dict:
    """torchvision vgg16 ``features`` state_dict -> VGG16Features params."""
    params = {}
    conv_i = 0
    layer_i = 0
    for item in _CFG:
        if item == "M":
            layer_i += 1
            continue
        params[f"conv_{conv_i}"] = port.conv(sd, f"{prefix}{layer_i}")
        conv_i += 1
        layer_i += 2  # conv + relu
    return params
