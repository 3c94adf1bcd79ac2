"""Fused GN+SiLU+conv3x3 Pallas kernel (ops/pallas/fused_conv.py).

Interpret-mode on CPU: kernel vs the XLA reference composite, the fused
resblock paths vs the standard module paths (same params), and gradient
flow through the custom_vjp. Reference semantics:
ldm/modules/diffusionmodules/openaimodel.py:163-275 (ResBlock),
model.py:82-141 (VAE ResnetBlock).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.ops.pallas.fused_conv import (
    _Cfg, _reference, fold_gn_affine, fused_conv3x3, fused_conv_supported)
from sd_tpu.ops.resblock import ResBlock, VAEResnetBlock


def _rand(key, shape, scale=1.0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype) * scale


class TestKernel:
    def test_full_feature_parity(self):
        b, h, w, c, n = 2, 16, 32, 128, 256
        x = _rand(0, (b, h, w, c))
        wk = _rand(1, (3, 3, c, n), 0.05)
        a = _rand(2, (b, c), 0.2) + 1.0
        d = _rand(3, (b, c), 0.1)
        bias = _rand(4, (n,), 0.1)
        skip = _rand(5, (b, h, w, n))
        y, m1, m2 = fused_conv3x3(x, wk, a=a, d=d, bias=bias, skip=skip,
                                  emit_moments=True, interpret=True)
        cfg = _Cfg(True, True, True, True, 8, 128, False)
        yr, m1r, m2r = _reference(cfg, x, wk.reshape(9, c, n), a, d, bias,
                                  skip)
        np.testing.assert_allclose(y, yr, atol=2e-5)
        np.testing.assert_allclose(m1, m1r, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(m2, m2r, rtol=1e-4, atol=1e-3)

    def test_plain_conv_matches_lax(self):
        b, h, w, c, n = 1, 16, 16, 128, 128
        x = _rand(0, (b, h, w, c))
        wk = _rand(1, (3, 3, c, n), 0.05)
        y = fused_conv3x3(x, wk, interpret=True)
        ref = jax.lax.conv_general_dilated(
            x, wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(y, ref, atol=2e-5)

    def test_multi_tile_grid(self):
        # several row tiles and cout tiles at once (kt > 1 exercises the
        # single-buffered weight DMA refetch)
        b, h, w, c, n = 2, 32, 16, 256, 256
        x = _rand(0, (b, h, w, c))
        wk = _rand(1, (3, 3, c, n), 0.05)
        y = fused_conv3x3(x, wk, tk=128, interpret=True)
        ref = jax.lax.conv_general_dilated(
            x, wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(y, ref, atol=2e-5)

    def test_supported_gate(self):
        assert fused_conv_supported((2, 32, 32, 640), (3, 3, 640, 640),
                                    jnp.bfloat16)
        assert fused_conv_supported((2, 16, 16, 2560), (3, 3, 2560, 1280),
                                    jnp.bfloat16)
        # C=320 (l0): Mosaic sliced-DMA lane rule — stays on XLA
        assert not fused_conv_supported((2, 64, 64, 320), (3, 3, 320, 320),
                                        jnp.bfloat16)
        # l3 8x8: W % 16 != 0
        assert not fused_conv_supported((2, 8, 8, 1280), (3, 3, 1280, 1280),
                                        jnp.bfloat16)
        # tiny channels (input/output convs) stay on XLA
        assert not fused_conv_supported((2, 64, 64, 4), (3, 3, 4, 320),
                                        jnp.bfloat16)
        assert not fused_conv_supported((2, 64, 64, 320), (3, 3, 320, 4),
                                        jnp.bfloat16)

    def test_bad_shape_raises(self):
        x = _rand(0, (1, 8, 8, 128))
        wk = _rand(1, (3, 3, 128, 128), 0.05)
        with pytest.raises(ValueError):
            fused_conv3x3(x, wk, interpret=True)

    def test_grads_match_reference(self):
        b, h, w, c, n = 1, 16, 16, 128, 128
        x = _rand(0, (b, h, w, c))
        wk = _rand(1, (3, 3, c, n), 0.05)
        a = _rand(2, (b, c), 0.2) + 1.0
        d = _rand(3, (b, c), 0.1)

        def f_fused(x, wk, a, d):
            return jnp.sum(fused_conv3x3(x, wk, a=a, d=d,
                                         interpret=True) ** 2)

        cfg = _Cfg(True, False, False, False, 8, 128, False)

        def f_ref(x, wk, a, d):
            return jnp.sum(_reference(cfg, x, wk.reshape(9, c, n), a, d,
                                      None, None) ** 2)

        gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, wk, a, d)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, wk, a, d)
        for gfi, gri in zip(gf, gr):
            np.testing.assert_allclose(gfi, gri, rtol=1e-3, atol=1e-3)


class TestFoldAffine:
    def test_matches_groupnorm(self):
        b, c, g = 2, 64, 32
        x = _rand(0, (b, 12, 16, c))
        scale = _rand(1, (c,), 0.3) + 1.0
        bias = _rand(2, (c,), 0.2)
        eps = 1e-5
        xg = x.reshape(b, -1, g, c // g)
        mean = xg.mean(axis=(1, 3))
        meansq = (xg ** 2).mean(axis=(1, 3))
        a, dd = fold_gn_affine(mean, meansq, scale, bias, eps)
        got = x * a[:, None, None, :] + dd[:, None, None, :]
        var = meansq - mean ** 2
        rstd = 1.0 / np.sqrt(var + eps)
        mean_c = np.repeat(mean, c // g, -1)[:, None, None, :]
        rstd_c = np.repeat(rstd, c // g, -1)[:, None, None, :]
        ref = (x - mean_c) * rstd_c * scale + bias
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestFusedResBlock:
    @pytest.mark.parametrize("use_ss", [False, True])
    @pytest.mark.parametrize("out_ch", [128, 256])
    def test_matches_standard_path(self, use_ss, out_ch):
        key = jax.random.PRNGKey(0)
        x = _rand(0, (2, 16, 16, 128))
        emb = _rand(1, (2, 256))
        std = ResBlock(channels=128, emb_channels=256, out_channels=out_ch,
                       use_scale_shift_norm=use_ss, conv_impl="off")
        fused = ResBlock(channels=128, emb_channels=256, out_channels=out_ch,
                         use_scale_shift_norm=use_ss, conv_impl="force",
                         interpret=True)
        p = std.init(key, x, emb)
        y0 = std.apply(p, x, emb)
        y1 = fused.apply(p, x, emb)
        np.testing.assert_allclose(y0, y1, atol=5e-5)

    def test_param_tree_identical(self):
        key = jax.random.PRNGKey(0)
        x = _rand(0, (1, 16, 16, 128))
        emb = _rand(1, (1, 256))
        std = ResBlock(channels=128, emb_channels=256, out_channels=256,
                       conv_impl="off")
        fused = ResBlock(channels=128, emb_channels=256, out_channels=256,
                         conv_impl="force", interpret=True)
        t0 = jax.tree.structure(std.init(key, x, emb))
        t1 = jax.tree.structure(fused.init(key, x, emb))
        assert t0 == t1

    def test_grads_flow(self):
        key = jax.random.PRNGKey(0)
        x = _rand(0, (1, 16, 16, 128))
        emb = _rand(1, (1, 256))
        fused = ResBlock(channels=128, emb_channels=256,
                         conv_impl="force", interpret=True)
        p = fused.init(key, x, emb)
        g = jax.grad(lambda p: jnp.sum(fused.apply(p, x, emb) ** 2))(p)
        leaves = jax.tree.leaves(g)
        assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        # zero-init out_conv kernel still gets a nonzero gradient
        gk = g["params"]["out_conv"]["kernel"]
        assert float(jnp.max(jnp.abs(gk))) > 0

    def test_vae_block_matches(self):
        key = jax.random.PRNGKey(0)
        x = _rand(0, (2, 16, 16, 128))
        std = VAEResnetBlock(in_channels=128, out_channels=256,
                             conv_impl="off")
        fused = VAEResnetBlock(in_channels=128, out_channels=256,
                               conv_impl="force", interpret=True)
        p = std.init(key, x)
        np.testing.assert_allclose(std.apply(p, x), fused.apply(p, x),
                                   atol=5e-5)

    def test_vae_block_temb_matches(self):
        key = jax.random.PRNGKey(0)
        x = _rand(0, (2, 16, 16, 128))
        temb = _rand(1, (2, 256))
        std = VAEResnetBlock(in_channels=128, temb_channels=256,
                             conv_impl="off")
        fused = VAEResnetBlock(in_channels=128, temb_channels=256,
                               conv_impl="force", interpret=True)
        p = std.init(key, x, temb)
        np.testing.assert_allclose(std.apply(p, x, temb),
                                   fused.apply(p, x, temb), atol=5e-5)
