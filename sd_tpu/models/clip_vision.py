"""CLIP vision tower (ViT) — image embeddings for RDM retrieval and the
safety checker.

The reference uses openai-clip's image encoder via kornia-preprocessed 224²
crops (``FrozenClipImageEmbedder``, ``ldm/modules/encoders/modules.py:
197-228``) and HF's safety checker's vision model (``scripts/txt2img.py:
22-29``). SURVEY.md §2.9: own it in-repo. Standard CLIP ViT: patchify conv,
class token, pre-LN encoder (non-causal), pre/post LayerNorms, linear
projection to the shared embedding space.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.clip import CLIPEncoderLayer, CLIPTextConfig
from sd_tpu.utils import port

__all__ = [
    "CLIPVisionConfig",
    "CLIPVisionModel",
    "clip_image_preprocess",
    "port_clip_vision",
    "CLIP_VIT_L_14_VISION",
]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    projection_dim: int = 768


CLIP_VIT_L_14_VISION = CLIPVisionConfig()

# CLIP's image normalization constants
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_image_preprocess(x, antialias: bool = True):
    """[-1,1] NHWC images (any size) -> 224² CLIP-normalized.

    The reference's kornia bicubic resize + normalize
    (``modules.py:216-224``), on-device via jax.image.
    """
    x = (x + 1.0) / 2.0
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 224, 224, c), method="bicubic", antialias=antialias)
    return (x - _MEAN) / _STD


class CLIPVisionModel(nn.Module):
    """Returns pooled (pre-projection) embedding and optionally the full
    token sequence. ``project=True`` applies the visual projection —
    the openai ``model.encode_image`` contract."""

    cfg: CLIPVisionConfig = CLIP_VIT_L_14_VISION
    project: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        b = pixel_values.shape[0]
        n_patches = (c.image_size // c.patch_size) ** 2

        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(pixel_values)
        x = x.reshape(b, n_patches, c.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)).astype(x.dtype), x], axis=1
        )
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_patches + 1, c.hidden_size))
        x = x + pos[None].astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layrnorm")(x)
        # reuse the text encoder layer (non-causal: mask=None)
        text_like = CLIPTextConfig(
            hidden_size=c.hidden_size, intermediate_size=c.intermediate_size,
            num_attention_heads=c.num_attention_heads,
        )
        for i in range(c.num_hidden_layers):
            x = CLIPEncoderLayer(text_like, dtype=self.dtype, name=f"layers_{i}")(
                x, None
            )
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="post_layernorm")(x[:, 0])
        out = {"last_hidden_state": x, "pooler_output": pooled}
        if self.project:
            proj = self.param("visual_projection", nn.initializers.normal(0.02),
                              (c.hidden_size, c.projection_dim))
            out["image_embeds"] = pooled @ proj.astype(pooled.dtype)
        return out

    def encode_image(self, pixel_values):
        return self(pixel_values)["image_embeds"]


def port_clip_vision(sd, cfg: CLIPVisionConfig = CLIP_VIT_L_14_VISION,
                     prefix: str = "vision_model.",
                     projection_key: Optional[str] = "visual_projection.weight"
                     ) -> Dict[str, Any]:
    """Map an HF CLIPVisionModel(WithProjection) state_dict onto
    :class:`CLIPVisionModel`."""
    p = lambda s: f"{prefix}{s}" if prefix else s
    params: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": port.conv_kernel(sd[p("embeddings.patch_embedding.weight")])
        },
        "class_embedding": port.to_numpy(sd[p("embeddings.class_embedding")]),
        "position_embedding": port.to_numpy(
            sd[p("embeddings.position_embedding.weight")]
        ),
        "pre_layrnorm": port.norm(sd, p("pre_layrnorm")),
        "post_layernorm": port.norm(sd, p("post_layernorm")),
    }
    for i in range(cfg.num_hidden_layers):
        lp = p(f"encoder.layers.{i}")
        params[f"layers_{i}"] = {
            "layer_norm1": port.norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": port.norm(sd, f"{lp}.layer_norm2"),
            "self_attn": {
                "q_proj": port.dense(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": port.dense(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": port.dense(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": port.dense(sd, f"{lp}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": port.dense(sd, f"{lp}.mlp.fc1"),
                "fc2": port.dense(sd, f"{lp}.mlp.fc2"),
            },
        }
    if projection_key and projection_key in sd:
        params["visual_projection"] = port.linear_kernel(sd[projection_key])
    return params
