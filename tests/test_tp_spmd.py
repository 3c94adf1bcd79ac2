"""Multi-chip proofs for the flash-attention SPMD rule and the megatron TP
layout (VERDICT r4 weak #1: both landed in the r4 snapshot untested).

Flash `custom_partitioning` (ops/pallas/flash_attention.py): a Pallas call is
an opaque custom-call to GSPMD — without the rule every sharded program
containing it all-gathers the operands to replicated. The rule declares the
kernel embarrassingly parallel over (batch, head). Proven here on the virtual
8-device CPU mesh in interpret mode, under jit (the only place the rule
engages — `_spmd_partition_wanted` needs a tracer + multi-device runtime):

- batch-sharded and head-sharded forward == the XLA einsum reference;
- gradients under sharding == unsharded gradients (the backward kernel is
  wrapped separately — custom_partitioning is not differentiable);
- the compiled HLO contains ZERO collectives: no all-gather of the token dim
  (the stated point of the rule), no all-reduce, nothing.

TP layout (parallel/tp.py): sharded UNet forward == replicated forward on a
('data','model') mesh, the all-reduce count matches the megatron layout
claim (one per row-parallel boundary: ResBlock out_conv, attention to_out,
FF proj_out), and the emb_ok / divisibility / 32%n fallbacks hold.
"""

import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sd_tpu.ops.pallas.flash_attention import flash_attention
from sd_tpu.parallel.mesh import make_mesh
from sd_tpu.parallel.tp import _leaf_spec, unet_tp_specs

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh")


def einsum_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


def make_qkv(b=8, n=512, h=4, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    return mk(), mk(), mk()


def flash_jit():
    return jax.jit(lambda q, k, v: flash_attention(
        q, k, v, interpret=True, block_q=256))


# ------------------------------------------------------------- flash SPMD


@pytest.mark.parametrize("spec", [
    P("data", None, None, None),            # batch-sharded (DP serving)
    P(None, None, "model", None),           # head-sharded (megatron TP)
    P("data", None, "model", None),         # both
])
def test_flash_spmd_forward_matches_einsum(spec):
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = make_qkv()
    ref = einsum_attention(q, k, v)
    sh = NamedSharding(mesh, spec)
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = flash_jit()(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # the output keeps the (batch, head) sharding — nothing was gathered
    out_spec = out.sharding.spec
    assert tuple(out_spec)[:1] == tuple(spec)[:1]


def test_flash_spmd_no_collectives_in_hlo():
    """The stated point of the rule (flash_attention.py SPMD comment): the
    kernel partitions with zero collectives — in particular no all-gather of
    the token dim that an unruled custom-call would force."""
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = make_qkv()
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    hlo = flash_jit().lower(qs, ks, vs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all",
                 "collective-permute"):
        assert coll not in hlo, f"unexpected {coll} around the flash kernel"


def test_flash_spmd_grads_match_unsharded():
    """fwd+bwd under batch/head sharding == the unsharded kernel's grads
    (N=512 > _SMALL_KV and divisible by _BLOCK_Q_BWD -> hits _bwd_spmd)."""
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = make_qkv()

    def loss(q, k, v):
        o = flash_attention(q, k, v, interpret=True, block_q=256)
        return jnp.sum(o * o)

    grads_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=3e-4, rtol=3e-4)


def test_flash_spmd_env_off_keeps_parity(monkeypatch):
    """SD_TPU_FLASH_SPMD=0 falls back to the unruled call — same numbers
    (GSPMD gathers, runs whole, re-shards), just slower. Pins the knob."""
    monkeypatch.setenv("SD_TPU_FLASH_SPMD", "0")
    mesh = make_mesh(n_data=8, n_model=1)
    q, k, v = make_qkv(b=8, n=256, h=2, d=64)
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = flash_jit()(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(einsum_attention(q, k, v)),
                               atol=2e-5, rtol=2e-5)


# --------------------------------------------------------------- TP layout


def tp_unet(seed=0):
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], num_heads=4,
        use_spatial_transformer=True, transformer_depth=1, context_dim=32,
        image_size=16)
    model = UNetModel(config=cfg)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 32))
    params = model.init(jax.random.PRNGKey(seed), x, t, ctx)["params"]
    return model, params, cfg


def test_tp_forward_matches_replicated():
    mesh = make_mesh(n_data=2, n_model=4)
    model, params, _ = tp_unet()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([3, 500], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)

    ref = model.apply({"params": params}, x, t, ctx)

    specs = unet_tp_specs(mesh, params, num_heads=4)
    sharded_params = jax.device_put(params, specs)
    # params really are distributed, not silently replicated
    n_sharded = sum(
        1 for s in jax.tree.leaves(specs,
                                   is_leaf=lambda l: isinstance(l, NamedSharding))
        if any(ax is not None for ax in s.spec))
    assert n_sharded >= 10, f"only {n_sharded} leaves sharded"

    fwd = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
    out = fwd(sharded_params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_tp_allreduce_count_matches_megatron_claim():
    """One all-reduce per row-parallel boundary (tp.py docstring): ResBlock
    out_conv, attention to_out, FF proj_out — and NOTHING else (no score
    all-reduces: heads % n == 0 keeps whole heads per shard; no stat
    reductions: 32 % n == 0 keeps GroupNorm shard-local; the top-level
    final conv stays replicated). Counted in the lowered HLO."""
    mesh = make_mesh(n_data=2, n_model=4)
    model, params, _ = tp_unet()
    specs = unet_tp_specs(mesh, params, num_heads=4)
    flat, _ = jax.tree_util.tree_flatten_with_path(specs)
    paths = {"/".join(str(k.key) for k in kp): s.spec for kp, s in flat}
    row_parallel = [p for p, s in paths.items()
                    if any(ax is not None for ax in s)
                    and re.search(r"(out_conv|to_out|proj_out)/kernel$", p)]
    assert row_parallel, "no row-parallel leaves — TP layout inert"
    # the UNet-level zero-init final conv must NOT be in the layout
    assert "out_conv/kernel" not in [p for p in row_parallel
                                     if "/" not in p.replace("/kernel", "")]
    assert all(p.count("/") > 1 for p in row_parallel)

    sharded_params = jax.device_put(params, specs)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 32))
    hlo = jax.jit(
        lambda p, x, t, c: model.apply({"params": p}, x, t, c)
    ).lower(sharded_params, x, t, ctx).compile().as_text()
    n_ar = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
    assert n_ar == len(row_parallel), (
        f"{n_ar} all-reduces vs {len(row_parallel)} row-parallel boundaries:"
        f" {row_parallel}")


def test_tp_attn_rules_need_head_divisibility():
    """Without num_heads (or when heads % n != 0) the attention projections
    stay replicated — sharding within heads would force GSPMD to all-reduce
    every [B,H,N,N] score matrix (the r5 fix this test pins)."""
    mesh = make_mesh(n_data=1, n_model=8)
    _, params, _ = tp_unet()
    for kwargs in ({}, {"num_heads": 4}):  # default, and 4 % 8 != 0
        flat, _ = jax.tree_util.tree_flatten_with_path(
            unet_tp_specs(mesh, params, **kwargs))
        paths = {"/".join(str(k.key) for k in kp): s.spec for kp, s in flat}
        attn = {p: s for p, s in paths.items()
                if re.search(r"to_(q|k|v|out)/kernel$", p)}
        assert attn and all(all(ax is None for ax in s)
                            for s in attn.values()), kwargs


def test_tp_emb_proj_fallback_scale_shift():
    """use_scale_shift_norm doubles emb_proj's output (scale|shift halves
    would split across shards) -> emb_proj must stay replicated while the
    paired in_conv still shards."""
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[], channel_mult=[1], num_heads=4,
        use_scale_shift_norm=True, image_size=16)
    model = UNetModel(config=cfg)
    x = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((1,), jnp.int32), None)["params"]
    mesh = make_mesh(n_data=2, n_model=4)
    flat, _ = jax.tree_util.tree_flatten_with_path(unet_tp_specs(mesh, params))
    paths = {"/".join(str(k.key) for k in kp): s.spec for kp, s in flat}
    embs = {p: s for p, s in paths.items() if "emb_proj/kernel" in p}
    convs = {p: s for p, s in paths.items() if p.endswith("in_conv/kernel")}
    assert embs and all(all(ax is None for ax in s) for s in embs.values())
    assert any(any(ax is not None for ax in s) for s in convs.values())


def test_tp_resblock_rules_gated_on_groupnorm_alignment():
    """ADVICE r4 #5: for axis sizes that do not divide 32, GroupNorm(32)
    stats would cross shards — the ResBlock pair must fall back to
    replicated (attention/FF rules stay active)."""
    # 32 % 6 != 0 -> resblock rules off
    spec = _leaf_spec("down_0/res_0/out_conv/kernel", (3, 3, 36, 36), 6,
                      "model", resblock_ok=False)
    assert all(ax is None for ax in spec)
    spec = _leaf_spec("blk/attn1/to_out/kernel", (36, 36), 6, "model",
                      resblock_ok=False)
    assert spec == P("model", None)
    # aligned case keeps the pair
    spec = _leaf_spec("down_0/res_0/out_conv/kernel", (3, 3, 32, 32), 4,
                      "model", resblock_ok=True)
    assert spec == P(None, None, "model", None)


def test_tp_divisibility_fallback():
    """Leaves whose sharded dim does not divide the axis stay replicated."""
    spec = _leaf_spec("blk/attn1/to_q/kernel", (32, 30), 4, "model")
    assert all(ax is None for ax in spec)


def test_tp_sets_fused_ff_off(monkeypatch):
    """unet_tp_specs disables the (partition-rule-less) fused FF kernel
    unless the operator explicitly chose (tp.py docstring automation)."""
    monkeypatch.delenv("SD_TPU_FUSED_FF", raising=False)
    mesh = make_mesh(n_data=2, n_model=4)
    _, params, _ = tp_unet()
    unet_tp_specs(mesh, params)
    assert os.environ.get("SD_TPU_FUSED_FF") == "0"
