"""Tracing / profiling / metrics (SURVEY.md §5.1, §5.5).

Reference equivalents: Lightning profiler summary (``main.py:741``),
CUDACallback epoch wall/memory stats (``main.py:395-415``), thop attention
FLOP counter (``openaimodel.py:327-344``), ``count_params``
(``ldm/util.py:71-75``), TestTube/wandb scalar logging (``main.py:541-565``).

TPU-native: ``jax.profiler`` trace server + xprof-compatible annotations, an
analytic FLOP model for the UNet (no hooks needed — the plan is static), and
a host-side JSONL metrics writer (TensorBoard-compatible via external
conversion; no TB dependency baked in).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "count_params",
    "unet_flops",
    "trace",
    "annotate",
    "StepTimer",
    "MetricsWriter",
    "WandbWriter",
    "start_profiler_server",
]


def count_params(params, verbose: bool = True, name: str = "model") -> int:
    """Ref: ``ldm/util.py:71-75`` (printed at model build, ``ddpm.py:87``)."""
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if verbose:
        print(f"{name} has {n * 1e-6:.2f} M params.")
    return n


def unet_flops(cfg, latent_hw: int, batch: int = 1) -> int:
    """Analytic forward-FLOP estimate from the static block plan — replaces
    the reference's thop hook counter (``openaimodel.py:327-344``)."""
    from sd_tpu.models.unet import build_unet_plan

    plan = build_unet_plan(cfg)
    total = 0
    hw = latent_hw

    def conv_flops(h, cin, cout, k=3):
        return 2 * h * h * cin * cout * k * k

    def res_flops(h, ci, co):
        f = conv_flops(h, ci, co) + conv_flops(h, co, co)
        if ci != co:
            f += conv_flops(h, ci, co, k=1)
        return f

    def attn_flops(h, ch, heads, dhead, ctx_len=None):
        n = h * h
        m = n if ctx_len is None else ctx_len
        d = heads * dhead
        f = 2 * n * ch * d * 3 + 2 * n * ch * d  # qkv + out proj
        f += 2 * 2 * n * m * d                    # scores + weighted sum
        return f

    def walk(blocks, h):
        nonlocal total
        for block in blocks:
            for desc in block if isinstance(block, list) else [block]:
                k = desc["kind"]
                if k == "conv_in":
                    total += conv_flops(h, cfg.in_channels, desc["ch"])
                elif k == "res":
                    total += res_flops(h, desc["ch"], desc["out_ch"])
                    if desc.get("down"):
                        h //= 2
                    if desc.get("up"):
                        h *= 2
                elif k == "attention":
                    total += attn_flops(h, desc["ch"], desc["heads"], desc["dim_head"])
                elif k == "spatial_transformer":
                    total += attn_flops(h, desc["ch"], desc["heads"], desc["dim_head"])
                    total += attn_flops(h, desc["ch"], desc["heads"], desc["dim_head"],
                                        ctx_len=77)
                    total += 2 * (h * h) * desc["ch"] * desc["ch"] * 8  # GEGLU FF
                elif k == "downsample":
                    total += conv_flops(h // 2, desc["ch"], desc["ch"])
                    h //= 2
                elif k == "upsample":
                    h *= 2
                    total += conv_flops(h, desc["ch"], desc["ch"])
        return h

    h = walk(plan["input_blocks"], hw)
    h = walk([plan["middle_block"]], h)
    walk(plan["output_blocks"], h)
    return total * batch


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope — view with xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """xprof-visible named scope for the hot regions (UNet step etc.)."""
    return jax.profiler.TraceAnnotation(name)


def start_profiler_server(port: int = 9999):
    jax.profiler.start_server(port)
    print(f"jax profiler server on :{port}")


class StepTimer:
    """Wall-time + rate reporting per window — the CUDACallback analog
    (peak-memory introspection is TPU-runtime-dependent; wall/rate are
    universal)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = time.perf_counter()
        self._count = 0

    def step(self) -> Optional[Dict[str, float]]:
        self._count += 1
        if self._count % self.window:
            return None
        dt = time.perf_counter() - self._t0
        self._t0 = time.perf_counter()
        return {"steps_per_sec": self.window / dt, "sec_per_step": dt / self.window}


class MetricsWriter:
    """Append-only JSONL scalar log (one line per step), teed to a
    TensorBoard event file (the reference's default logger is TensorBoard
    via TestTube, ``main.py:541-565``)."""

    def __init__(self, logdir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from sd_tpu.utils.tb_events import TensorBoardWriter

            self._tb = TensorBoardWriter(os.path.join(logdir, "tb"))

    def write(self, step: int, metrics: Dict[str, Any], split: str = "train"):
        row = {"step": int(step), "split": split, "time": time.time()}
        scalars = {}
        for k, v in metrics.items():
            if np.ndim(v) == 0:
                row[k] = scalars[k] = float(np.asarray(v))
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None and scalars:
            self._tb.write(step, scalars)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class WandbWriter:
    """Optional Weights & Biases sink (the reference offers a wandb logger
    alongside TestTube, ``main.py:548-556``). Thin adapter over the wandb
    package — raises at construction when wandb isn't installed (this image
    doesn't ship it; TensorBoard + JSONL are the in-repo sinks)."""

    def __init__(self, project: str = "sd_tpu", run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None):
        import wandb  # noqa: F401 — hard dependency of this sink only

        self._run = wandb.init(project=project, name=run_name, config=config)

    def write(self, step: int, metrics: Dict[str, Any], split: str = "train"):
        self._run.log({k: float(np.asarray(v)) for k, v in metrics.items()
                       if np.ndim(v) == 0}, step=int(step))

    def close(self):
        self._run.finish()
