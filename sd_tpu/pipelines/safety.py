"""NSFW safety checker — rebuild of the HF StableDiffusionSafetyChecker used
by the reference's flagship path (``scripts/txt2img.py:22-29,88-95``).

Mechanism (same as the HF checker): CLIP-ViT image embedding -> cosine
similarity against fixed "concept" embeddings (17 NSFW concepts with
per-concept thresholds, 3 special-care concepts that tighten the margin).
Flagged images are replaced with a placeholder, preserving the reference's
replace-with-image contract (it pastes ``assets/rick.jpeg``; we default to a
neutral gray notice image).

Weights (concept embeddings + thresholds + vision tower) port from the HF
checker's state_dict via :func:`port_safety_checker`; without them the
checker runs with random concepts — structurally exercisable, not meaningful.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.clip_vision import (
    CLIP_VIT_L_14_VISION,
    CLIPVisionConfig,
    CLIPVisionModel,
    clip_image_preprocess,
    port_clip_vision,
)
from sd_tpu.utils import port

__all__ = ["SafetyChecker", "port_safety_checker", "placeholder_image"]


def placeholder_image(h: int, w: int) -> np.ndarray:
    """Neutral replacement image with a stripe pattern (stands in for the
    reference's assets/rick.jpeg paste, txt2img.py:76-86)."""
    img = np.full((h, w, 3), 64, np.uint8)
    stripe = (np.arange(h) // 16) % 2 == 0
    img[stripe] = 96
    return img


def _cosine(a, b):
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    return a @ b.T


@dataclasses.dataclass
class SafetyChecker:
    vision_params: Any
    concept_embeds: jnp.ndarray            # [17, D]
    concept_thresholds: jnp.ndarray        # [17]
    special_care_embeds: jnp.ndarray       # [3, D]
    special_care_thresholds: jnp.ndarray   # [3]
    config: CLIPVisionConfig = CLIP_VIT_L_14_VISION
    adjustment: float = 0.0  # >0 loosens, <0 tightens (HF uses 0.01 special)

    def __post_init__(self):
        self.model = CLIPVisionModel(self.config, project=True)

    @classmethod
    def random_init(cls, rng, config: Optional[CLIPVisionConfig] = None
                    ) -> "SafetyChecker":
        config = config or CLIPVisionConfig(
            image_size=224, patch_size=32, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            projection_dim=16,
        )
        model = CLIPVisionModel(config, project=True)
        x = jnp.zeros((1, 224, 224, 3))
        params = model.init(rng, x)["params"]
        d = config.projection_dim
        k1, k2 = jax.random.split(rng)
        return cls(
            vision_params=params,
            concept_embeds=jax.random.normal(k1, (17, d)),
            concept_thresholds=jnp.full((17,), 0.99),
            special_care_embeds=jax.random.normal(k2, (3, d)),
            special_care_thresholds=jnp.full((3,), 0.99),
            config=config,
        )

    @classmethod
    def untrained(cls, rng, config: Optional[CLIPVisionConfig] = None
                  ) -> "SafetyChecker":
        """Checker with unreachable thresholds (cosine <= 1 < 2): the full
        scoring path runs but nothing is ever flagged. Used by the txt2img
        CLI when no ported HF checker weights are available (zero-egress
        environments) so the reference's always-apply contract
        (``txt2img.py:88-95``) is preserved mechanically without randomly
        censoring outputs on garbage concept embeddings."""
        c = cls.random_init(rng, config)
        c.concept_thresholds = jnp.full((17,), 2.0)
        c.special_care_thresholds = jnp.full((3,), 2.0)
        return c

    def nsfw_scores(self, images) -> jnp.ndarray:
        """[B,H,W,3] images (float in [0,1], or uint8) -> NSFW flags [B].

        One compiled program (cached on the instance, retraces per image
        shape/dtype — the u8 normalization happens IN-program, no eager
        device ops); the vision tower + concept tables ride as jit
        ARGUMENTS — closing a ViT-L over jit would embed 300M constants
        (see LatentDiffusion.runtime_params rationale), and eager dispatch
        pays the ~50 ms RPC floor per op through the TPU tunnel."""
        from sd_tpu.pipelines._jit import cached_jit

        def build():
            def run(p, images):
                x = images.astype(jnp.float32)
                if images.dtype == jnp.uint8:  # trace-time constant
                    x = x / 255.0
                x = clip_image_preprocess(x * 2.0 - 1.0)
                emb = self.model.apply(
                    {"params": p["vision"]}, x)["image_embeds"]
                special = _cosine(emb, p["special_embeds"]) - p["special_thr"]
                has_special = jnp.any(special > 0, axis=1)
                adj = (jnp.where(has_special, 0.01, 0.0)[:, None]
                       + self.adjustment)
                concept = _cosine(emb, p["concept_embeds"]) - p["concept_thr"] + adj
                return jnp.any(concept > 0, axis=1)

            return jax.jit(run)

        p = {"vision": self.vision_params,
             "concept_embeds": self.concept_embeds,
             "concept_thr": self.concept_thresholds,
             "special_embeds": self.special_care_embeds,
             "special_thr": self.special_care_thresholds}
        return cached_jit(self, "nsfw_scores", build)(p, images)

    def __call__(self, images_u8) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 [B,H,W,3] (host numpy OR device array) -> (checked images,
        has_nsfw flags). Flagged entries are replaced (txt2img.py:88-95).

        Device arrays are scored IN PLACE on device — the image tensor is
        fetched exactly once (as uint8), never round-tripped host->device."""
        imgs = jnp.asarray(images_u8)  # no-op for device arrays
        scores = self.nsfw_scores(imgs)
        # one async-friendly fetch each: tiny flags + u8 images
        flags = np.asarray(jax.device_get(scores))
        out = np.asarray(jax.device_get(imgs)).copy()
        for i, bad in enumerate(flags):
            if bad:
                out[i] = placeholder_image(*out.shape[1:3])
        return out, flags


def port_safety_checker(sd) -> SafetyChecker:
    """Map an HF StableDiffusionSafetyChecker state_dict."""
    vision = port_clip_vision(sd, prefix="vision_model.vision_model.",
                              projection_key="visual_projection.weight")
    return SafetyChecker(
        vision_params=vision,
        concept_embeds=jnp.asarray(port.to_numpy(sd["concept_embeds"])),
        concept_thresholds=jnp.asarray(
            port.to_numpy(sd["concept_embeds_weights"])),
        special_care_embeds=jnp.asarray(
            port.to_numpy(sd["special_care_embeds"])),
        special_care_thresholds=jnp.asarray(
            port.to_numpy(sd["special_care_embeds_weights"])),
    )
