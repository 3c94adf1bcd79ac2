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


def _read_tfrecords(path):
    """Minimal TFRecord reader (validates masked CRCs) for the TB writer test."""
    import struct
    from sd_tpu.utils.tb_events import _masked_crc

    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data)
            records.append(data)
    return records


def test_tensorboard_event_file(tmp_path):
    """MetricsWriter tees scalars into a TensorBoard event file whose TFRecord
    framing, CRCs, and Event protos are well-formed (ref main.py:541-565)."""
    w = MetricsWriter(str(tmp_path))
    w.write(7, {"train/loss": 0.25})
    w.close()
    tbdir = tmp_path / "tb"
    files = list(tbdir.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_tfrecords(files[0])
    assert len(records) == 2  # file_version event + one scalar event
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    # simple_value 0.25 little-endian float is embedded in the Value message
    import struct as _s
    assert _s.pack("<f", 0.25) in records[1]
    # step=7 varint after field key 0x10
    assert b"\x10\x07" in records[1]


def test_wandb_writer_adapter(monkeypatch):
    """WandbWriter adapts the wandb package when present (main.py:548-556);
    exercised against a stub module (wandb is not in this image)."""
    import sys
    import types

    from sd_tpu.utils.profiling import WandbWriter

    logged = []

    class FakeRun:
        def log(self, metrics, step=None):
            logged.append((step, metrics))

        def finish(self):
            logged.append("finished")

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: FakeRun()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    w = WandbWriter(project="t")
    w.write(3, {"loss": jnp.asarray(0.5), "skip": np.zeros(2)})
    w.close()
    assert logged[0] == (3, {"loss": 0.5})
    assert logged[-1] == "finished"
