"""Run one Winograd conv shape on the TPU and print OK/fail.

Usage: python tools/wino_shape_check.py H W C K [B]
Run each suspicious shape in its own process: a kernel fault kills the TPU
worker, so in-process loops can't bisect.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sd_tpu.ops.pallas.winograd_conv import winograd_conv3x3


def main():
    h, w, c, k = map(int, sys.argv[1:5])
    b = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    wgt = jax.random.normal(key, (3, 3, c, k), jnp.float32) * 0.02
    y = jax.jit(lambda x: winograd_conv3x3(x, wgt))(x)
    ref = jax.lax.conv_general_dilated(
        x, wgt.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    d = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"OK {b}x{h}x{w}x{c}->{k} maxdiff {d:.4f}", flush=True)


if __name__ == "__main__":
    main()
