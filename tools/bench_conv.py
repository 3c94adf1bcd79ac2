"""Conv-path microbenches for the SD UNet resblock stack on v5e.

The r2 ablation (tools/bench_attn.py noattn) puts the pure conv path at
42.2 ms per CFG step against a 32.3 ms unpadded FLOP bound (77%). This tool
splits that gap: bare 3x3 convs per level vs the GN+SiLU+conv composite vs a
full ResBlock, so we can see whether the waste is in XLA's conv itself or in
the normalization interludes between convs.

Timing: async chains + one terminal sync (see CLAUDE.md / bench_attn.py);
every number carries the same ~1 ms per-call dispatch bias, so read
DIFFERENCES and same-shape comparisons, not absolutes.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16

# (name, H, W, C) — the four UNet levels at 512px
LEVELS = [
    ("l0_64x64x320", 64, 64, 320),
    ("l1_32x32x640", 32, 32, 640),
    ("l2_16x16x1280", 16, 16, 1280),
    ("l3_8x8x1280", 8, 8, 1280),
]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_chain(step, x0, iters=30, reps=2):
    x = step(x0)
    sync(x)
    best = float("inf")
    for _ in range(reps):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        sync(x)
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    return best * 1000.0


def main():
    from sd_tpu.ops.norms import GroupNorm32
    from sd_tpu.ops.resblock import ResBlock

    out = {}
    for name, h, w, c in LEVELS:
        key = jax.random.PRNGKey(hash(name) % 2**31)
        x0 = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
        kern = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
        flops = 2 * B * h * w * 9 * c * c
        bound_ms = flops / 197e12 * 1e3

        @jax.jit
        def conv_step(x, _k=kern):
            return jax.lax.conv_general_dilated(
                x, _k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms = time_chain(conv_step, x0)
        out[f"{name}/conv"] = round(ms, 3)
        print(f"{name:16s} conv      {ms:7.3f} ms  (bound {bound_ms:5.2f}, "
              f"{bound_ms/ms*100:4.0f}%)", flush=True)

        gn = GroupNorm32()
        gparams = gn.init(key, x0)

        @jax.jit
        def gnconv_step(x, _k=kern, _p=gparams):
            y = gn.apply(_p, x)
            y = jax.nn.silu(y)
            return jax.lax.conv_general_dilated(
                y, _k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms2 = time_chain(gnconv_step, x0)
        out[f"{name}/gnconv"] = round(ms2, 3)
        print(f"{name:16s} gn+si+conv{ms2:7.3f} ms  (+{ms2-ms:5.3f} for GN)",
              flush=True)

        # full ResBlock (2 convs + 2 GN + emb inject)
        rb = ResBlock(channels=c, emb_channels=1280, out_channels=c,
                      dtype=jnp.bfloat16)
        emb = jax.random.normal(key, (B, 1280), jnp.bfloat16)
        rparams = rb.init(key, x0, emb)

        @jax.jit
        def res_step(x, _p=rparams, _e=emb):
            return rb.apply(_p, x, _e)

        ms3 = time_chain(res_step, x0)
        out[f"{name}/resblock"] = round(ms3, 3)
        print(f"{name:16s} resblock  {ms3:7.3f} ms  (2x bound "
              f"{2*bound_ms:5.2f}, {2*bound_ms/ms3*100:4.0f}%)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
