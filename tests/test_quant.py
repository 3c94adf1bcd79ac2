"""W8A8 int8 conv path (sd_tpu/ops/quant.py) — VERDICT r3 #6 stage B.

The dispatch is opt-in (SD_TPU_INT8) and TPU-only; these tests cover the
quantized math on CPU and the dispatch gate's parsing/shape logic.
"""

import jax
import jax.numpy as jnp
import pytest

import sd_tpu.ops.conv as conv_mod
from sd_tpu.ops.conv import Conv3x3
from sd_tpu.ops.quant import int8_conv3x3, int8_enabled


def _ref_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def test_int8_conv_matches_fp32_within_quant_noise():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 64),
                          jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (64,), jnp.float32) * 0.1
    ref = _ref_conv(x, w, b)
    out = int8_conv3x3(x, w, b, jnp.float32)
    assert out.dtype == jnp.float32
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_conv_zero_input_no_nan():
    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    w = jnp.zeros((3, 3, 16, 16), jnp.float32)
    b = jnp.ones((16,), jnp.float32)
    out = int8_conv3x3(x, w, b, jnp.float32)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.allclose(out, 1.0))


def test_int8_enabled_gate(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    shape = (2, 64, 64, 320)
    monkeypatch.delenv("SD_TPU_INT8", raising=False)
    assert not int8_enabled(shape, jnp.bfloat16)
    monkeypatch.setenv("SD_TPU_INT8", "0")
    assert not int8_enabled(shape, jnp.bfloat16)
    monkeypatch.setenv("SD_TPU_INT8", "1")
    assert int8_enabled(shape, jnp.bfloat16)
    assert not int8_enabled(shape, jnp.float32)  # bf16-only
    monkeypatch.setenv("SD_TPU_INT8", "4096")
    assert int8_enabled((2, 64, 64, 320), jnp.bfloat16)
    assert not int8_enabled((2, 32, 32, 640), jnp.bfloat16)
    # r5: unknown tokens now FAIL LOUDLY instead of silently running bf16
    # (the label/measurement mismatch class from ADVICE r4 #3)
    monkeypatch.setenv("SD_TPU_INT8", "garbage")
    with pytest.raises(ValueError):
        int8_enabled(shape, jnp.bfloat16)
    # CPU backend never dispatches
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("SD_TPU_INT8", "1")
    assert not int8_enabled(shape, jnp.bfloat16)


def test_int8_bucket_grammar(monkeypatch):
    from sd_tpu.ops.quant import (int8_bucket_enabled, int8_buckets,
                                  int8_mode_label)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SD_TPU_INT8", "all")
    assert int8_buckets() == frozenset(("conv", "ff", "attn"))
    assert "attn_pv" not in int8_buckets()  # explicit-only until gated
    monkeypatch.setenv("SD_TPU_INT8", "ff,attn")
    assert int8_bucket_enabled("ff", jnp.bfloat16)
    assert int8_bucket_enabled("attn", jnp.bfloat16)
    assert not int8_bucket_enabled("conv", jnp.bfloat16)
    assert not int8_bucket_enabled("ff", jnp.float32)  # bf16-only
    assert int8_mode_label() == "bf16+int8[attn,ff]"
    monkeypatch.setenv("SD_TPU_INT8", "4096")
    assert int8_buckets() == frozenset(("conv",))
    assert int8_mode_label() == "bf16+int8[conv>=4096]"
    monkeypatch.setenv("SD_TPU_INT8", "0")
    assert int8_mode_label() == "bf16"
    # the label derives from the SAME predicate as dispatch: with the env
    # set but the backend not TPU, the label must say bf16 (ADVICE r4 #3)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("SD_TPU_INT8", "all")
    assert int8_mode_label() == "bf16"


def test_int8_training_guard(monkeypatch):
    """ADVICE r4 #2: training with SD_TPU_INT8 set must ERROR, not silently
    zero the gradients through round()."""
    import optax

    from sd_tpu.training.diffusion_loss import LDMTrainer
    from sd_tpu.utils.config import build_latent_diffusion
    from sd_tpu.utils.testing import tiny_uncond_model_config

    ldm = build_latent_diffusion(tiny_uncond_model_config(),
                                 rng=jax.random.PRNGKey(0))
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), use_ema=False)
    state = tr.init_state()
    batch = {"image": jnp.zeros((2, 32, 32, 3))}
    monkeypatch.setenv("SD_TPU_INT8", "all")
    with pytest.raises(RuntimeError, match="inference-only"):
        tr.train_step(state, batch, jax.random.PRNGKey(1))


def test_conv3x3_int8_dispatch_param_tree_unchanged(monkeypatch):
    """Enabling the int8 path must not change the param tree, and the CPU
    (interpret-equivalent) output must stay within quantization noise."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16), jnp.bfloat16)
    mod = Conv3x3(24, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(4), x)
    ref = mod.apply(params, x)

    monkeypatch.setattr(conv_mod, "int8_enabled", lambda *a: True)
    out = mod.apply(params, x)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    rel = float(jnp.linalg.norm((out - ref).astype(jnp.float32))
                / jnp.linalg.norm(ref.astype(jnp.float32)))
    assert rel < 0.05, rel
