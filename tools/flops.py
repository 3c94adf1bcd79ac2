"""Exact FLOP counts for the bench UNet variants (XLA HLO cost analysis).

Runs on CPU (no TPU compile): traces the same programs tools/bench_attn.py
times on hardware and prints FLOPs + the v5e-1 roofline bound
(197 TFLOP/s bf16) so measured ms can be read as % of peak.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SD_TPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

B = 16
V5E_TFLOPS = 197.0


def count(fn, *args) -> float:
    lowered = jax.jit(fn).lower(*args)
    # pre-optimization HLO flop count — matmul/conv dominated so this is
    # within a few % of the optimized program (and avoids a full CPU compile
    # of the 860M-param program)
    try:
        analysis = lowered.cost_analysis()
    except Exception:
        analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis["flops"])


def build(attn_res, use_st):
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=attn_res, num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8,
        use_spatial_transformer=use_st, transformer_depth=1,
        context_dim=768 if use_st else None, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((B,), jnp.float32)
    c0 = jnp.zeros((B, 77, 768), jnp.bfloat16)
    args = (x0, t0, c0) if use_st else (x0, t0)
    shapes = jax.eval_shape(lambda k: unet.init(k, *args), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]

    def make_step():
        # fresh function object per variant: jax's jit/lowering cache is
        # keyed on fn identity, so a reused closure would return the trace
        # from BEFORE the monkeypatch
        return lambda *a: unet.apply({"params": params}, *a)

    return make_step, args


def main():
    import sd_tpu.ops.attention as attn_mod

    real = attn_mod.dot_product_attention

    make_step, args = build([4, 2, 1], True)
    full = count(make_step(), *args)

    attn_mod.dot_product_attention = lambda q, k, v, scale=None, mask=None, impl="auto": q
    stub_all = count(make_step(), *args)

    attn_mod.dot_product_attention = real

    real_ff = attn_mod.FeedForward.__call__
    attn_mod.FeedForward.__call__ = lambda self, x, deterministic=True: x
    noff = count(make_step(), *args)
    attn_mod.FeedForward.__call__ = real_ff

    make_stepc, argsc = build([], False)
    noattn = count(make_stepc(), *argsc)

    def row(name, f):
        print(f"{name:10s} {f/1e12:7.2f} TF   bound {f/V5E_TFLOPS/1e9:6.1f} ms")

    row("full", full)
    row("stub_all", stub_all)
    row("noff", noff)
    row("noattn", noattn)
    print(f"attn cores       {(full-stub_all)/1e12:7.2f} TF   "
          f"bound {(full-stub_all)/V5E_TFLOPS/1e9:6.1f} ms (unpadded)")
    print(f"FF (GEGLU)       {(full-noff)/1e12:7.2f} TF   "
          f"bound {(full-noff)/V5E_TFLOPS/1e9:6.1f} ms")
    print(f"transformer glue {(stub_all-noattn)/1e12:7.2f} TF   "
          f"bound {(stub_all-noattn)/V5E_TFLOPS/1e9:6.1f} ms (incl FF)")


if __name__ == "__main__":
    main()
