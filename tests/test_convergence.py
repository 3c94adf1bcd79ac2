"""Training-convergence + exact-resume tests — the short replay of
``tools/convergence_run.py`` (VERDICT r3 #5; the reference's whole L4
purpose, ``main.py:418-741``).

- loss actually DECREASES on a learnable class-conditional distribution
  (ColoredShapes) when trained through Trainer.fit + DataModuleFromConfig
  + MetricsWriter — not just "loss is finite";
- a run checkpointed mid-training and resumed reproduces the uninterrupted
  run's final params/EMA bit-for-bit (step-indexed fold_in train keys +
  epoch-deterministic loader fast-forward in ``Trainer.fit``).
"""

import json
import os

import numpy as np
import pytest

import jax
import optax

from sd_tpu.data.synthetic import ColoredShapes
from sd_tpu.training import LDMTrainer
from sd_tpu.training.trainer import DataModuleFromConfig, Trainer
from sd_tpu.utils.config import build_latent_diffusion
from sd_tpu.utils.profiling import MetricsWriter


def pixel_space_config(size=16, ch=32, n_classes=8):
    """Tiny pixel-space class-conditional diffusion (IdentityFirstStage +
    ClassEmbedder crossattn — the convergence-shapes.yaml shape, scaled)."""
    return {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "linear_start": 0.0015,
            "linear_end": 0.0195,
            "timesteps": 1000,
            "image_size": size,
            "channels": 3,
            "scale_factor": 1.0,
            "cond_stage_key": "class_label",
            "conditioning_key": "crossattn",
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {
                    "image_size": size,
                    "in_channels": 3,
                    "out_channels": 3,
                    "model_channels": ch,
                    "attention_resolutions": [2],
                    "num_res_blocks": 1,
                    "channel_mult": [1, 2],
                    "num_heads": 4,
                    "use_spatial_transformer": True,
                    "transformer_depth": 1,
                    "context_dim": ch,
                },
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.IdentityFirstStage"},
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.ClassEmbedder",
                "params": {"n_classes": n_classes, "embed_dim": ch},
            },
        },
    }


def shapes_data(batch_size=8, length=64, size=16):
    return DataModuleFromConfig(
        batch_size=batch_size,
        train={"target": "sd_tpu.data.synthetic.ColoredShapes",
               "params": {"size": size, "length": length, "n_classes": 8,
                          "radius": 4, "jitter": 2}},
    )


def tree_max_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(np.max(np.abs(np.asarray(x, np.float64)
                                         - np.asarray(y, np.float64))))
        if np.asarray(x).size else 0.0, a, b)
    return max(jax.tree.leaves(diffs))


# ----------------------------------------------------------- dataset sanity


def test_colored_shapes_deterministic_and_learnable():
    ds = ColoredShapes(size=16, length=32, n_classes=8, radius=4, jitter=2)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["class_label"] == 3
    # same class, different index -> same shape/color up to position: the
    # sets of foreground colors match, backgrounds match
    c = ds[3 + 8]
    fg_a = set(map(tuple, a["image"][a["image"][..., 0] != -0.95].reshape(-1, 3)))
    fg_c = set(map(tuple, c["image"][c["image"][..., 0] != -0.95].reshape(-1, 3)))
    assert fg_a == fg_c and len(fg_a) == 1
    # all 8 classes distinct as (shape-mask-kind, color) pairs
    imgs = [ds[i]["image"] for i in range(8)]
    assert len({im.tobytes() for im in imgs}) == 8


# -------------------------------------------------------- loss convergence


def test_loss_decreases_on_colored_shapes(tmp_path):
    ldm = build_latent_diffusion(pixel_space_config(), rng=jax.random.PRNGKey(5))
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), use_ema=False)
    harness = Trainer(trainer_obj=tr, ldm=tr.ldm, logdir=str(tmp_path),
                      max_steps=150, log_every=5, ckpt_every=10**6,
                      metrics_writer=MetricsWriter(str(tmp_path)))
    harness.fit(tr.init_state(), shapes_data())

    rows = [json.loads(l) for l in open(os.path.join(str(tmp_path),
                                                     "metrics.jsonl"))]
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert len(losses) == 30
    head = float(np.mean(losses[:6]))
    tail = float(np.mean(losses[-6:]))
    assert np.isfinite(losses).all()
    assert tail < 0.75 * head, (
        f"loss did not decrease: head {head:.4f} -> tail {tail:.4f}")


# ------------------------------------------------------- exact resume


def test_resume_reproduces_uninterrupted_run(tmp_path):
    cfg = pixel_space_config()

    def fresh(logdir, max_steps):
        ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(5))
        tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3))
        return tr, Trainer(trainer_obj=tr, ldm=tr.ldm, logdir=logdir,
                           max_steps=max_steps, log_every=10**6,
                           ckpt_every=10**6)

    # run A: uninterrupted 24 steps
    tr_a, h_a = fresh(str(tmp_path / "a"), 24)
    state_a = h_a.fit(tr_a.init_state(), shapes_data())

    # run B: 12 steps, checkpoint, then a FRESH process-equivalent resume
    tr_b, h_b = fresh(str(tmp_path / "b"), 12)
    h_b.fit(tr_b.init_state(), shapes_data())
    tr_b2, h_b2 = fresh(str(tmp_path / "b"), 24)
    state_b = h_b2.fit(tr_b2.init_state(), shapes_data(), resume=True)

    assert int(state_a.step) == int(state_b.step) == 24
    assert tree_max_diff(state_a.params, state_b.params) == 0.0
    assert tree_max_diff(state_a.ema.shadow, state_b.ema.shadow) == 0.0
    assert tree_max_diff(state_a.opt_state, state_b.opt_state) == 0.0


def test_resume_fast_forwards_data_epoch(tmp_path):
    """The loader fast-forward lands on the exact (epoch, position): with
    64 samples / batch 8 -> 8 steps per epoch, a 12-step restore must skip
    4 batches of epoch 1."""
    data = shapes_data()
    loader = data.train_dataloader()
    # simulate what fit() does for step=12
    n = len(loader)
    assert n == 8
    loader.epoch = 12 // n
    skip = 12 % n
    assert (loader.epoch, skip) == (1, 4)
    # batch sequence of epoch 1 positions 4.. equals an uninterrupted
    # iteration's epoch-1 tail
    seq = [b["class_label"] for b in loader][skip:]
    data2 = shapes_data()
    loader2 = data2.train_dataloader()
    _ = [None for _ in loader2]          # epoch 0
    seq2 = [b["class_label"] for b in loader2][skip:]
    for x, y in zip(seq, seq2):
        np.testing.assert_array_equal(x, y)
