"""Pallas flash-attention kernel correctness (interpret mode on CPU) vs the
XLA reference path, across SD's attention shapes — forward AND backward
(the kernel carries a custom_vjp; training differentiates through it exactly
as the reference's autograd differentiates ldm/modules/attention.py:180-192).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.ops.attention import _xla_attention
from sd_tpu.ops.pallas.flash_attention import flash_attention, flash_supported


@pytest.mark.parametrize("shape", [
    (1, 256, 2, 40),    # ds=1 level head dim (tiny N for test speed)
    (2, 256, 2, 80),    # ds=2 level head dim
    (1, 256, 4, 160),   # ds=4 level head dim
    (1, 512, 1, 64),    # aligned head dim, per-head kernel path
])
def test_flash_matches_xla(shape):
    b, n, h, d = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128)
    ref = _xla_attention(q, k, v, d**-0.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("nk", [128, 77])
def test_flash_cross_attention_shapes(nk):
    """Nq != Nk (cross-attention); nk=77 exercises in-kernel pad masking."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 256, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, nk, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, nk, 2, 64)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128)
    ref = _xla_attention(q, k, v, 64**-0.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("qshape,kshape", [
    ((1, 512, 2, 64), (1, 512, 2, 64)),   # pallas bwd kernel (nk > small-KV)
    ((1, 256, 2, 40), (1, 256, 2, 40)),   # einsum bwd (small KV)
    ((1, 256, 2, 64), (1, 77, 2, 64)),    # einsum bwd with padded keys
])
def test_flash_grads_match_xla(qshape, kshape):
    """jax.grad flows through the kernel and matches the XLA attention grads
    for q, k and v (VERDICT r1 item 2: TPU training must not crash)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal(qshape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(kshape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(kshape), jnp.float32)
    d = qshape[-1]
    # a non-trivial scalar loss with distinct per-element weights
    w = jnp.asarray(rng.standard_normal((qshape[0], qshape[1], qshape[2], d)),
                    jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(w * flash_attention(q, k, v, interpret=True, block_q=128))

    def loss_xla(q, k, v):
        return jnp.sum(w * _xla_attention(q, k, v, d**-0.5, None))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=3e-5, rtol=1e-3,
            err_msg=f"grad mismatch for {name}")


def test_flash_supported_dispatch_rules():
    q = jnp.zeros((1, 4096, 8, 40))
    k = v = jnp.zeros((1, 4096, 8, 40))
    # CPU backend in tests -> never supported
    assert not flash_supported(q, k, v)
    # masked attention -> never
    assert not flash_supported(q, k, v, mask=jnp.ones((1, 1, 1, 4096), bool))


def test_flash_numerical_stability_large_logits():
    """Exact softmax in VMEM must survive large score magnitudes."""
    q = jnp.full((1, 128, 1, 128), 10.0, jnp.float32)
    k = jnp.full((1, 128, 1, 128), 10.0, jnp.float32)
    v = jnp.ones((1, 128, 1, 128), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_flash_chunked_online_softmax_matches_xla():
    """kv_chunk engages the online-softmax kernel (running m/l/acc merge)."""
    rng = np.random.default_rng(3)
    shape = (1, 512, 2, 64)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128, kv_chunk=128)
    ref = _xla_attention(q, k, v, 64**-0.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_int8_qk_matches_xla_within_quant_noise():
    """W8A8 QK^T kernel (r5, VERDICT next-round #1b): int8 per-row Q /
    per-key K quantization of the logits — sample-level agreement with the
    bf16 path is gated on TPU by tools/int8_quality.py; here we pin the
    math in interpret mode."""
    b, n, h, d = 1, 1024, 2, 40
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    want = _xla_attention(q, k, v, d**-0.5, None)
    got = flash_attention(q, k, v, interpret=True, int8="qk")
    rel = (np.linalg.norm(np.asarray(got) - np.asarray(want))
           / np.linalg.norm(np.asarray(want)))
    assert rel < 0.02, rel
    # the pv variant trades more noise for the second int8 matmul
    got_pv = flash_attention(q, k, v, interpret=True, int8="qkpv")
    rel_pv = (np.linalg.norm(np.asarray(got_pv) - np.asarray(want))
              / np.linalg.norm(np.asarray(want)))
    assert rel_pv < 0.04, rel_pv


def test_flash_int8_gating_rules():
    """int8 only engages on full-row self-attention with Nk >= 1024 — cross
    (masked-pad) and small-N sites stay bf16-exact."""
    from sd_tpu.ops.pallas.flash_attention import _resolve_int8

    assert _resolve_int8("qk", jnp.bfloat16, 4096, 4096) == "qk"
    assert _resolve_int8("qk", jnp.bfloat16, 77, 128) == "off"    # cross pad
    # N=1024 measured SLOWER at int8 (bench_attn int8attn r5) -> bf16
    assert _resolve_int8("qk", jnp.bfloat16, 1024, 1024) == "off"
    assert _resolve_int8("qk", jnp.bfloat16, 256, 256) == "off"   # small N
    assert _resolve_int8("off", jnp.bfloat16, 4096, 4096) == "off"
    # small-N sites keep bit-identical outputs whatever the int8 ask
    b, n, h, d = 1, 256, 2, 64
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    a = flash_attention(q, k, v, interpret=True, block_q=128)
    bq = flash_attention(q, k, v, interpret=True, block_q=128, int8="qk")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bq))
