"""Weight-port layer: torch checkpoints -> sd_tpu flax param pytrees.

The reference ships Lightning ``.ckpt`` files whose ``state_dict`` uses torch
conventions (SURVEY.md §5.4): NCHW convs with OIHW kernels, ``weight``/
``bias`` naming, EMA shadow buffers under name-mangled keys
(``ldm/modules/ema.py:16-21``). This module owns every convention flip:

- conv kernels OIHW -> HWIO (NHWC layout on TPU),
- 1x1 convs -> Dense kernels [I, O] (we implement 1x1 convs as Dense),
- linear [O, I] -> [I, O],
- norm weight/bias -> scale/bias,
- EMA key demangling ("model_ema.diffusion_modelinput_blocks00weight" style).

Higher-level per-model porters (UNet / VAE / CLIP) live alongside the model
definitions and call into these primitives.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np

__all__ = [
    "to_numpy",
    "conv_kernel",
    "conv1x1_to_dense",
    "linear_kernel",
    "norm",
    "conv",
    "dense",
    "dense_from_conv1x1",
    "load_torch_state_dict",
    "demangle_ema_keys",
]


def to_numpy(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float numpy array (no torch import needed
    unless given a tensor)."""
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy()


def conv_kernel(w) -> np.ndarray:
    """OIHW -> HWIO."""
    w = to_numpy(w)
    assert w.ndim == 4, f"conv kernel expected 4D, got {w.shape}"
    return np.transpose(w, (2, 3, 1, 0))


def conv1x1_to_dense(w) -> np.ndarray:
    """[O, I, 1, 1] conv kernel -> [I, O] Dense kernel."""
    w = to_numpy(w)
    assert w.ndim == 4 and w.shape[2] == w.shape[3] == 1, w.shape
    return np.transpose(w[:, :, 0, 0], (1, 0))


def linear_kernel(w) -> np.ndarray:
    """[O, I] -> [I, O]."""
    w = to_numpy(w)
    assert w.ndim == 2, w.shape
    return np.transpose(w, (1, 0))


def norm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """GroupNorm/LayerNorm params at ``prefix`` -> flax {scale, bias}."""
    return {
        "scale": to_numpy(sd[f"{prefix}.weight"]),
        "bias": to_numpy(sd[f"{prefix}.bias"]),
    }


def conv(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv2d params -> flax nn.Conv {kernel, bias}."""
    out = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = to_numpy(sd[f"{prefix}.bias"])
    return out


def dense(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear params -> flax nn.Dense {kernel, bias}."""
    out = {"kernel": linear_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = to_numpy(sd[f"{prefix}.bias"])
    return out


def dense_from_conv1x1(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch 1x1 Conv2d params -> flax nn.Dense {kernel, bias}.

    Used wherever the reference's 1x1 convs (SpatialTransformer proj_in/out,
    VAE attention q/k/v/proj_out) become Dense layers on NHWC.
    """
    out = {"kernel": conv1x1_to_dense(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = to_numpy(sd[f"{prefix}.bias"])
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a Lightning/torch ``.ckpt``/``.pt`` and return the flat
    state_dict as numpy. Ref loader behavior: ``ddpm.py:186-202`` /
    ``scripts/txt2img.py:49-66`` (``torch.load(map_location="cpu")``, use
    the ``state_dict`` key when present)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: to_numpy(v) for k, v in obj.items()}


def demangle_ema_keys(sd: Mapping, model_prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Recover EMA weights stored under mangled buffer names.

    ``LitEma`` registers one buffer per parameter with '.' stripped from the
    name (``ema.py:16-21``): ``model.diffusion_model.input_blocks.0.0.weight``
    -> ``model_ema.diffusion_modelinput_blocks00weight``. Reconstruct the
    dotted names by matching against the model keys present in ``sd``;
    returns a dict keyed by the FULL original key (``model.<dotted>``) so it
    can directly overwrite the state_dict for EMA-weight inference.
    """
    model_keys = [k for k in sd if k.startswith(model_prefix)]
    mangled_to_dotted = {
        k[len(model_prefix):].replace(".", ""): k for k in model_keys
    }
    out = {}
    for k, v in sd.items():
        if not k.startswith("model_ema."):
            continue
        mangled = k[len("model_ema."):]
        if mangled in ("decay", "num_updates"):
            continue
        dotted = mangled_to_dotted.get(mangled)
        if dotted is not None:
            out[dotted] = to_numpy(v)
    return out
