"""CLIP text tower — SD's conditioning encoder, reimplemented in JAX.

The reference outsources this to HF transformers
(``ldm/modules/encoders/modules.py:137-162``, ``FrozenCLIPEmbedder`` wrapping
``openai/clip-vit-large-patch14``); SURVEY.md §2.9 requires the rebuild to own
it. This is the standard CLIP text transformer: token+position embeddings,
pre-LN blocks with causal self-attention and quick-GELU MLP, final LayerNorm.

Two output contracts, matching the reference's two wrappers:
- ``FrozenCLIPEmbedder``: non-pooled ``last_hidden_state`` [B, 77, 768]
  (the SD UNet crossattn context).
- ``FrozenCLIPTextEmbedder`` (``modules.py:165-194``): EOT-pooled embedding
  through ``text_projection``, L2-normalized (the RDM retrieval query).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.ops.attention import dot_product_attention
from sd_tpu.utils import port

__all__ = ["CLIPTextConfig", "CLIPTextModel", "port_clip_text", "CLIP_VIT_L_14_TEXT"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    projection_dim: int = 768
    eos_token_id: int = 49407


# openai/clip-vit-large-patch14 text tower (123M params, README.md:19)
CLIP_VIT_L_14_TEXT = CLIPTextConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        d = c.hidden_size // c.num_attention_heads
        b, n, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, n, c.num_attention_heads, d)
        k = k.reshape(b, n, c.num_attention_heads, d)
        v = v.reshape(b, n, c.num_attention_heads, d)
        out = dot_product_attention(q, k, v, scale=d**-0.5, mask=mask)
        out = out.reshape(b, n, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, dtype=self.dtype, name="self_attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        x = x + CLIPMLP(self.cfg, dtype=self.dtype, name="mlp")(y)
        return x


class CLIPTextModel(nn.Module):
    """Returns a dict with ``last_hidden_state`` [B, N, D] and
    ``pooler_output`` [B, D] (hidden state at the EOT position, i.e. the
    argmax token id — openai CLIP semantics, matching HF for SD prompts)."""

    cfg: CLIPTextConfig = CLIP_VIT_L_14_TEXT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        b, n = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, :n].astype(tok.dtype)

        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]  # [1,1,N,N]
        for i in range(c.num_hidden_layers):
            x = CLIPEncoderLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)

        eot_pos = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot_pos]
        return {"last_hidden_state": x, "pooler_output": pooled}

    def encode(self, input_ids):
        """FrozenCLIPEmbedder contract: the non-pooled 77x768 context."""
        return self(input_ids)["last_hidden_state"]


class CLIPTextModelWithProjection(nn.Module):
    """Pooled text embedding through text_projection, optionally normalized —
    the FrozenCLIPTextEmbedder contract (``modules.py:165-194``)."""

    cfg: CLIPTextConfig = CLIP_VIT_L_14_TEXT
    normalize: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        out = CLIPTextModel(self.cfg, dtype=self.dtype, name="text_model")(input_ids)
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (self.cfg.hidden_size, self.cfg.projection_dim),
        )
        z = out["pooler_output"] @ proj.astype(out["pooler_output"].dtype)
        if self.normalize:
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return z


def port_clip_text(sd, cfg: CLIPTextConfig = CLIP_VIT_L_14_TEXT,
                   prefix: str = "text_model.") -> Dict[str, Any]:
    """Map an HF ``CLIPTextModel`` state_dict onto :class:`CLIPTextModel`.

    ``prefix``: "text_model." for a bare HF model,
    "cond_stage_model.transformer.text_model." inside an SD checkpoint
    (``FrozenCLIPEmbedder`` holds the HF model as ``self.transformer``,
    ``modules.py:146``).
    """
    p = lambda s: f"{prefix}{s}" if prefix else s
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": port.to_numpy(sd[p("embeddings.token_embedding.weight")])
        },
        "position_embedding": port.to_numpy(
            sd[p("embeddings.position_embedding.weight")]
        ),
        "final_layer_norm": port.norm(sd, p("final_layer_norm")),
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
    return params
