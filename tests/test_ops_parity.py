"""Module-level activation parity: sd_tpu.ops vs the torch reference.

Each test builds the reference torch module with random weights, ports those
weights through sd_tpu.utils.port primitives into the flax module, and
compares outputs (fp32, tolerance 1e-4..1e-5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.ops import (
    BasicTransformerBlock,
    CrossAttention,
    Downsample,
    FeedForward,
    GroupNorm32,
    LinearAttention,
    QKVAttentionBlock,
    ResBlock,
    SpatialTransformer,
    Upsample,
    VAEAttnBlock,
    VAEResnetBlock,
    dot_product_attention,
)
from sd_tpu.utils import port

from tests.torch_ref import nchw_to_nhwc, nhwc_to_nchw, run_torch, t2n, torch_manual_seed


def assert_close(a, b, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


# ---------------------------------------------------------------- GroupNorm


def test_groupnorm32_matches_torch():
    torch = torch_manual_seed(0)
    gn = torch.nn.GroupNorm(32, 64, eps=1e-5)
    torch.nn.init.normal_(gn.weight)
    torch.nn.init.normal_(gn.bias)
    x = torch.randn(2, 64, 8, 8)
    ref = run_torch(gn, x)

    params = {"GroupNorm_0": {"scale": t2n(gn.weight), "bias": t2n(gn.bias)}}
    out = GroupNorm32().apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(ref), atol=1e-4)


def test_groupnorm32_constant_input_finite():
    """Regression (r3 on-chip NaN): the single-pass E[x^2]-E[x]^2 variance
    can round NEGATIVE past eps on constant inputs (fp32 cancellation,
    |err| ~ ulp*mean^2), so rsqrt NaN'd — e.g. a constant 3.7 fill on CPU,
    and the all-0.01-params UNet grad test on TPU. Flax's use_fast_variance
    clamps var at 0; GroupNorm32 must too."""
    gn = GroupNorm32()
    for c in [0.5, 3.7, 10.0, 37.3, 100.0, 113.7, 317.0, 1000.1, 5000.5]:
        x = jnp.full((1, 8, 8, 320), c, jnp.bfloat16)
        p = gn.init(jax.random.PRNGKey(0), x)
        out = np.asarray(gn.apply(p, x), np.float32)
        assert np.all(np.isfinite(out)), f"NaN at constant fill {c}"
        # constant input => normalized term ~0 => output ~bias (zeros here)
        assert np.max(np.abs(out)) < 1.0, f"blowup at constant fill {c}"


# ---------------------------------------------------------------- attention core


def test_dot_product_attention_reference_math():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 5, 3, 4), dtype=np.float32)
    k = rng.standard_normal((2, 7, 3, 4), dtype=np.float32)
    v = rng.standard_normal((2, 7, 3, 4), dtype=np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    # numpy reference
    scale = 4**-0.5
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bkhd->bqhd", w, v)
    assert_close(out, expected, atol=1e-5)


def _port_cross_attention(ref):
    sd = ref.state_dict()
    return {
        "to_q": port.dense(sd, "to_q"),
        "to_k": port.dense(sd, "to_k"),
        "to_v": port.dense(sd, "to_v"),
        "to_out": port.dense(sd, "to_out.0"),
    }


def test_cross_attention_self_parity():
    torch = torch_manual_seed(1)
    from ldm.modules.attention import CrossAttention as RefCA

    ref = RefCA(query_dim=64, heads=4, dim_head=16)
    x = torch.randn(2, 10, 64)
    expected = run_torch(ref, x)

    mod = CrossAttention(query_dim=64, heads=4, dim_head=16)
    out = mod.apply({"params": _port_cross_attention(ref)}, jnp.asarray(t2n(x)))
    assert_close(out, t2n(expected), atol=1e-4)


def test_cross_attention_context_parity():
    torch = torch_manual_seed(2)
    from ldm.modules.attention import CrossAttention as RefCA

    ref = RefCA(query_dim=32, context_dim=48, heads=8, dim_head=8)
    x = torch.randn(2, 9, 32)
    ctx = torch.randn(2, 77, 48)
    expected = run_torch(ref, x, ctx)

    mod = CrossAttention(query_dim=32, context_dim=48, heads=8, dim_head=8)
    out = mod.apply(
        {"params": _port_cross_attention(ref)},
        jnp.asarray(t2n(x)),
        jnp.asarray(t2n(ctx)),
    )
    assert_close(out, t2n(expected), atol=1e-4)


def test_cross_attention_mask_parity():
    torch = torch_manual_seed(3)
    from ldm.modules.attention import CrossAttention as RefCA

    ref = RefCA(query_dim=16, context_dim=16, heads=2, dim_head=8)
    x = torch.randn(1, 4, 16)
    ctx = torch.randn(1, 6, 16)
    mask = torch.tensor([[True, True, False, True, False, True]])
    ref.eval()
    with torch.no_grad():
        expected = ref(x, ctx, mask=mask)

    mod = CrossAttention(query_dim=16, context_dim=16, heads=2, dim_head=8)
    out = mod.apply(
        {"params": _port_cross_attention(ref)},
        jnp.asarray(t2n(x)),
        jnp.asarray(t2n(ctx)),
        jnp.asarray(t2n(mask)),
    )
    assert_close(out, t2n(expected), atol=1e-4)


# ---------------------------------------------------------------- feedforward


def test_feedforward_geglu_parity():
    torch = torch_manual_seed(4)
    from ldm.modules.attention import FeedForward as RefFF

    ref = RefFF(dim=32, glu=True)
    x = torch.randn(2, 5, 32)
    expected = run_torch(ref, x)

    sd = ref.state_dict()
    params = {
        "proj_in": {"proj": port.dense(sd, "net.0.proj")},
        "proj_out": port.dense(sd, "net.2"),
    }
    out = FeedForward(dim=32, glu=True).apply({"params": params}, jnp.asarray(t2n(x)))
    assert_close(out, t2n(expected), atol=1e-4)


# ---------------------------------------------------------------- transformer block / spatial transformer


def port_basic_block(sd, prefix=""):
    p = lambda s: f"{prefix}{s}" if prefix else s
    return {
        "attn1": {
            "to_q": port.dense(sd, p("attn1.to_q")),
            "to_k": port.dense(sd, p("attn1.to_k")),
            "to_v": port.dense(sd, p("attn1.to_v")),
            "to_out": port.dense(sd, p("attn1.to_out.0")),
        },
        "attn2": {
            "to_q": port.dense(sd, p("attn2.to_q")),
            "to_k": port.dense(sd, p("attn2.to_k")),
            "to_v": port.dense(sd, p("attn2.to_v")),
            "to_out": port.dense(sd, p("attn2.to_out.0")),
        },
        "ff": {
            "proj_in": {"proj": port.dense(sd, p("ff.net.0.proj"))},
            "proj_out": port.dense(sd, p("ff.net.2")),
        },
        "norm1": {"LayerNorm_0": port.norm(sd, p("norm1"))},
        "norm2": {"LayerNorm_0": port.norm(sd, p("norm2"))},
        "norm3": {"LayerNorm_0": port.norm(sd, p("norm3"))},
    }


def test_basic_transformer_block_parity():
    torch = torch_manual_seed(5)
    from ldm.modules.attention import BasicTransformerBlock as RefBTB

    ref = RefBTB(dim=32, n_heads=4, d_head=8, context_dim=24, checkpoint=False)
    x = torch.randn(2, 6, 32)
    ctx = torch.randn(2, 7, 24)
    expected = run_torch(ref, x, ctx)

    mod = BasicTransformerBlock(dim=32, n_heads=4, d_head=8, context_dim=24)
    out = mod.apply(
        {"params": port_basic_block(ref.state_dict())},
        jnp.asarray(t2n(x)),
        jnp.asarray(t2n(ctx)),
    )
    assert_close(out, t2n(expected), atol=1e-4)


def test_spatial_transformer_parity():
    torch = torch_manual_seed(6)
    from ldm.modules.attention import SpatialTransformer as RefST

    ref = RefST(in_channels=32, n_heads=4, d_head=8, depth=2, context_dim=24)
    # zero-init proj_out would hide bugs; randomize it for the test
    torch.nn.init.normal_(ref.proj_out.weight, std=0.02)
    x = torch.randn(2, 32, 8, 8)
    ctx = torch.randn(2, 7, 24)
    expected = run_torch(ref, x, ctx)

    sd = ref.state_dict()
    params = {
        "norm": {"GroupNorm_0": port.norm(sd, "norm")},
        "proj_in": port.dense_from_conv1x1(sd, "proj_in"),
        "proj_out": port.dense_from_conv1x1(sd, "proj_out"),
        "blocks_0": port_basic_block(sd, "transformer_blocks.0."),
        "blocks_1": port_basic_block(sd, "transformer_blocks.1."),
    }
    mod = SpatialTransformer(in_channels=32, n_heads=4, d_head=8, depth=2, context_dim=24)
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)), jnp.asarray(t2n(ctx)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


# ---------------------------------------------------------------- UNet ResBlock


def port_resblock(sd, prefix="", has_skip=False, skip_name="skip"):
    p = lambda s: f"{prefix}{s}" if prefix else s
    params = {
        "in_norm": {"GroupNorm_0": port.norm(sd, p("in_layers.0"))},
        "in_conv": port.conv(sd, p("in_layers.2")),
        "emb_proj": port.dense(sd, p("emb_layers.1")),
        "out_norm": {"GroupNorm_0": port.norm(sd, p("out_layers.0"))},
        "out_conv": port.conv(sd, p("out_layers.3")),
    }
    if has_skip:
        key = p("skip_connection")
        w = sd[f"{key}.weight"]
        if w.shape[-1] == 1:
            params[skip_name] = {
                "kernel": port.conv_kernel(sd[f"{key}.weight"]),
                "bias": port.to_numpy(sd[f"{key}.bias"]),
            }
        else:
            params[skip_name] = port.conv(sd, key)
    return params


@pytest.mark.parametrize("scale_shift", [False, True])
def test_unet_resblock_parity(scale_shift):
    torch = torch_manual_seed(7)
    from ldm.modules.diffusionmodules.openaimodel import ResBlock as RefRB

    ref = RefRB(channels=32, emb_channels=16, dropout=0.0, out_channels=64,
                use_scale_shift_norm=scale_shift)
    torch.nn.init.normal_(ref.out_layers[3].weight, std=0.02)  # un-zero
    x = torch.randn(2, 32, 8, 8)
    emb = torch.randn(2, 16)
    expected = run_torch(ref, x, emb)

    mod = ResBlock(channels=32, emb_channels=16, out_channels=64,
                   use_scale_shift_norm=scale_shift)
    params = port_resblock(ref.state_dict(), has_skip=True)
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)), jnp.asarray(t2n(emb)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


@pytest.mark.parametrize("updown", ["up", "down"])
def test_unet_resblock_updown_parity(updown):
    torch = torch_manual_seed(8)
    from ldm.modules.diffusionmodules.openaimodel import ResBlock as RefRB

    ref = RefRB(channels=32, emb_channels=16, dropout=0.0,
                up=updown == "up", down=updown == "down")
    torch.nn.init.normal_(ref.out_layers[3].weight, std=0.02)
    x = torch.randn(2, 32, 8, 8)
    emb = torch.randn(2, 16)
    expected = run_torch(ref, x, emb)

    mod = ResBlock(channels=32, emb_channels=16,
                   up=updown == "up", down=updown == "down")
    params = port_resblock(ref.state_dict())
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)), jnp.asarray(t2n(emb)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


# ---------------------------------------------------------------- VAE blocks


def port_vae_resblock(sd, prefix=""):
    p = lambda s: f"{prefix}{s}" if prefix else s
    params = {
        "norm1": {"GroupNorm_0": port.norm(sd, p("norm1"))},
        "conv1": port.conv(sd, p("conv1")),
        "norm2": {"GroupNorm_0": port.norm(sd, p("norm2"))},
        "conv2": port.conv(sd, p("conv2")),
    }
    if f"{p('nin_shortcut')}.weight" in sd:
        params["nin_shortcut"] = port.conv(sd, p("nin_shortcut"))
    if f"{p('conv_shortcut')}.weight" in sd:
        params["conv_shortcut"] = port.conv(sd, p("conv_shortcut"))
    if f"{p('temb_proj')}.weight" in sd:
        params["temb_proj"] = port.dense(sd, p("temb_proj"))
    return params


def test_vae_resnet_block_parity():
    torch = torch_manual_seed(9)
    from ldm.modules.diffusionmodules.model import ResnetBlock as RefRB

    ref = RefRB(in_channels=32, out_channels=64, dropout=0.0, temb_channels=0)
    x = torch.randn(2, 32, 8, 8)
    ref.eval()
    with torch.no_grad():
        expected = ref(x, None)

    mod = VAEResnetBlock(in_channels=32, out_channels=64)
    out = mod.apply({"params": port_vae_resblock(ref.state_dict())}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


def port_vae_attn(sd, prefix=""):
    p = lambda s: f"{prefix}{s}" if prefix else s
    return {
        "norm": {"GroupNorm_0": port.norm(sd, p("norm"))},
        "q": port.dense_from_conv1x1(sd, p("q")),
        "k": port.dense_from_conv1x1(sd, p("k")),
        "v": port.dense_from_conv1x1(sd, p("v")),
        "proj_out": port.dense_from_conv1x1(sd, p("proj_out")),
    }


def test_vae_attn_block_parity():
    torch = torch_manual_seed(10)
    from ldm.modules.diffusionmodules.model import AttnBlock as RefAttn

    ref = RefAttn(32)
    x = torch.randn(2, 32, 8, 8)
    expected = run_torch(ref, x)

    mod = VAEAttnBlock(in_channels=32)
    out = mod.apply({"params": port_vae_attn(ref.state_dict())}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


def test_vae_downsample_asymmetric_pad_parity():
    torch = torch_manual_seed(11)
    from ldm.modules.diffusionmodules.model import Downsample as RefDown

    ref = RefDown(16, with_conv=True)
    x = torch.randn(2, 16, 8, 8)
    expected = run_torch(ref, x)

    mod = Downsample(channels=16, use_conv=True, asymmetric_pad=True)
    params = {"conv": port.conv(ref.state_dict(), "conv")}
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert out.shape == (2, 4, 4, 16)
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=1e-4)


def test_unet_upsample_parity():
    torch = torch_manual_seed(12)
    from ldm.modules.diffusionmodules.openaimodel import Upsample as RefUp

    ref = RefUp(16, use_conv=True)
    x = torch.randn(2, 16, 4, 4)
    expected = run_torch(ref, x)

    mod = Upsample(channels=16, use_conv=True)
    params = {"conv": port.conv(ref.state_dict(), "conv")}
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=1e-4)


def test_unet_downsample_symmetric_parity():
    torch = torch_manual_seed(13)
    from ldm.modules.diffusionmodules.openaimodel import Downsample as RefDown

    ref = RefDown(16, use_conv=True)
    x = torch.randn(2, 16, 8, 8)
    expected = run_torch(ref, x)

    mod = Downsample(channels=16, use_conv=True, asymmetric_pad=False)
    params = {"conv": port.conv(ref.state_dict(), "op")}
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=1e-4)


# ---------------------------------------------------------------- legacy QKV attention


@pytest.mark.parametrize("new_order", [False, True])
def test_qkv_attention_block_parity(new_order):
    torch = torch_manual_seed(14)
    from ldm.modules.diffusionmodules.openaimodel import AttentionBlock as RefAB

    ref = RefAB(channels=32, num_heads=4, use_new_attention_order=new_order)
    torch.nn.init.normal_(ref.proj_out.weight, std=0.02)  # un-zero
    x = torch.randn(2, 32, 8, 8)
    expected = run_torch(ref, x)

    sd = ref.state_dict()
    params = {
        "norm": {"GroupNorm_0": port.norm(sd, "norm")},
        "qkv": {
            # torch conv1d kernel [O, I, 1] -> dense [I, O]
            "kernel": np.transpose(port.to_numpy(sd["qkv.weight"])[:, :, 0], (1, 0)),
            "bias": port.to_numpy(sd["qkv.bias"]),
        },
        "proj_out": {
            "kernel": np.transpose(port.to_numpy(sd["proj_out.weight"])[:, :, 0], (1, 0)),
            "bias": port.to_numpy(sd["proj_out.bias"]),
        },
    }
    mod = QKVAttentionBlock(channels=32, num_heads=4, use_new_attention_order=new_order)
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


# ---------------------------------------------------------------- linear attention


def test_linear_attention_parity():
    torch = torch_manual_seed(15)
    from ldm.modules.attention import LinearAttention as RefLA

    ref = RefLA(dim=32, heads=4, dim_head=8)
    x = torch.randn(2, 32, 8, 8)
    expected = run_torch(ref, x)

    sd = ref.state_dict()
    params = {
        "to_qkv": {"kernel": port.conv1x1_to_dense(sd["to_qkv.weight"])},
        "to_out": port.dense_from_conv1x1(sd, "to_out"),
    }
    mod = LinearAttention(dim=32, heads=4, dim_head=8)
    out = mod.apply({"params": params}, nchw_to_nhwc(t2n(x)))
    assert_close(nhwc_to_nchw(out), t2n(expected), atol=2e-4)


def test_attention_perf_flags_are_exact(monkeypatch):
    """SD_TPU_PROJ_BARRIER / SD_TPU_CROSS_BMM change only HOW XLA lowers the
    projections/AV einsum (barriers + explicit transposes), never the math:
    outputs must be bit-identical for the barrier and allclose for the bmm
    re-association."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sd_tpu.ops.attention import CrossAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 13, 32)).astype(np.float32))
    attn = CrossAttention(query_dim=96, heads=4, dim_head=24, attn_impl="xla")
    params = attn.init(jax.random.PRNGKey(0), x)
    base_self = attn.apply(params, x)
    attn_c = CrossAttention(query_dim=96, context_dim=32, heads=4,
                            dim_head=24, attn_impl="xla")
    params_c = attn_c.init(jax.random.PRNGKey(0), x, ctx)
    base_cross = attn_c.apply(params_c, x, ctx)

    monkeypatch.setenv("SD_TPU_PROJ_BARRIER", "1")
    monkeypatch.setenv("SD_TPU_CROSS_BMM", "1")
    got_self = attn.apply(params, x)
    got_cross = attn_c.apply(params_c, x, ctx)
    np.testing.assert_allclose(np.asarray(got_self), np.asarray(base_self),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cross), np.asarray(base_cross),
                               atol=1e-6, rtol=1e-6)
