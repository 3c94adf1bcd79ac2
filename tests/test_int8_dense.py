"""W8A8 dense projection kernel (ops/pallas/int8_dense.py) — parity in
interpret mode + the CrossAttention 'proj' bucket dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.ops.pallas.int8_dense import int8_dense


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


@pytest.mark.parametrize("c,f,bias", [(64, 192, False), (128, 128, True)])
def test_int8_dense_parity(c, f, bias):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = (0.5 * jax.random.normal(k1, (256, c))).astype(jnp.bfloat16)
    w = 0.05 * jax.random.normal(k2, (c, f), jnp.float32)
    b = 0.1 * jax.random.normal(k3, (f,), jnp.float32) if bias else None
    got = int8_dense(x, w, b, interpret=True, block_m=128)
    want = jnp.dot(x.astype(jnp.float32), w)
    if b is not None:
        want = want + b
    assert got.shape == want.shape and got.dtype == x.dtype
    assert _rel(got, want) < 0.02


def test_int8_dense_row_fallback():
    """A row count with no valid block divisor falls back to the XLA dot
    (never silently drops rows)."""
    x = jnp.ones((7, 64), jnp.bfloat16)
    w = jnp.full((64, 32), 0.01, jnp.float32)
    got = int8_dense(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(jnp.dot(x, w.astype(x.dtype)),
                                          np.float32), rtol=2e-2)


def test_proj_bucket_dispatch(monkeypatch):
    """SD_TPU_INT8=proj routes CrossAttention projections through
    int8_dense (fused QKV on self-attention) with an unchanged param tree,
    and stays off otherwise."""
    import sd_tpu.ops.pallas.int8_dense as mod
    from sd_tpu.ops.attention import CrossAttention

    x = (0.5 * jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64))
         ).astype(jnp.bfloat16)
    attn = CrossAttention(query_dim=64, heads=4, dim_head=16,
                          dtype=jnp.bfloat16)
    params_off = attn.init(jax.random.PRNGKey(1), x)

    calls = {"n": 0}
    real = mod.int8_dense

    def spy(*a, **k):
        calls["n"] += 1
        k["interpret"] = True  # CPU test host
        return real(*a, **k)

    monkeypatch.setattr(mod, "int8_dense", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SD_TPU_INT8", "proj")
    params_on = attn.init(jax.random.PRNGKey(1), x)
    # identical param tree -> checkpoints port to either dispatch
    assert jax.tree.structure(params_off) == jax.tree.structure(params_on)
    calls["n"] = 0  # init traced the module too
    out = attn.apply(params_on, x)
    assert calls["n"] == 2  # fused QKV + to_out
    assert out.shape == x.shape
    # numerics stay near the bf16 path
    monkeypatch.delenv("SD_TPU_INT8")
    ref = attn.apply(params_on, x)
    assert _rel(out, ref) < 0.05
