"""Inventory every conv in the bench UNet and compute padded-lane bounds.

Records each `lax.conv_general_dilated` call's shapes (CPU trace, no TPU),
then prints per-shape FLOPs, the unpadded bound, and the MXU lane-padded
bound (channels rounded up to 128 on the contraction and output dims) at
197 TFLOP/s bf16. This separates "XLA is wasteful" from "the hardware pads
320->384" in the conv-path gap (measured 42.2 ms vs 32.3 unpadded bound).
"""

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SD_TPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

B = 16
V5E_TFLOPS = 197.0

records = Counter()

real_conv = jax.lax.conv_general_dilated


def spy_conv(lhs, rhs, *args, **kwargs):
    out = real_conv(lhs, rhs, *args, **kwargs)
    # NHWC/HWIO assumed (repo convention)
    records[(tuple(lhs.shape), tuple(rhs.shape), tuple(out.shape))] += 1
    return out


def main():
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8,
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((B,), jnp.float32)
    c0 = jnp.zeros((B, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x0, t0, c0), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]

    jax.lax.conv_general_dilated = spy_conv
    try:
        jax.eval_shape(lambda: unet.apply({"params": params}, x0, t0, c0))
    finally:
        jax.lax.conv_general_dilated = real_conv

    def pad128(c):
        return 128 * math.ceil(c / 128)

    tot = tot_pad = 0.0
    rows = []
    for (lsh, rsh, osh), n in sorted(records.items(), key=lambda kv: -kv[1]):
        kh, kw, cin, cout = rsh
        _, oh, ow, _ = osh
        flops = 2 * B * oh * ow * kh * kw * cin * cout * n
        # implicit-GEMM contraction K = kh*kw*cin -> lane pad on cin only
        # matters via K; N dim = cout pads to 128
        k_eff = kh * kw * cin
        fpad = 2 * B * oh * ow * pad128(k_eff) * pad128(cout) * n
        tot += flops
        tot_pad += fpad
        rows.append((flops, f"{n:2d}x in{lsh[1]}x{lsh[2]}x{cin:4d} k{kh}{kw} "
                     f"-> {cout:4d}  {flops/1e9:8.1f} GF  pad x{fpad/flops:.2f}"))
    for _, r in sorted(rows, reverse=True):
        print(r)
    print(f"\ntotal conv FLOPs {tot/1e12:6.2f} TF  bound {tot/V5E_TFLOPS/1e9:6.1f} ms")
    print(f"lane-padded       {tot_pad/1e12:6.2f} TF  bound {tot_pad/V5E_TFLOPS/1e9:6.1f} ms")


if __name__ == "__main__":
    main()
