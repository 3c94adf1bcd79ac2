"""Capture a device trace of a jitted step and print per-op durations.

Usage: python tools/profile_op.py {wino|direct|unet} [level]

Parses the xplane protos with jax.profiler.ProfileData (no TensorBoard
needed) and prints the TPU-side op timeline aggregated by op name — the
ground truth for where a Pallas kernel's time actually goes (XLA prep,
kernel body, re-interleave, ...). Works through the axon tunnel iff the
backend exposes profiling; falls back with a clear error if not.
"""

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def parse_trace(logdir):
    from jax.profiler import ProfileData

    # find the .xplane.pb file
    path = None
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                path = os.path.join(root, f)
    if path is None:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    data = ProfileData.from_serialized_xspace(open(path, "rb").read())
    rows = defaultdict(float)
    counts = defaultdict(int)
    for plane in data.planes:
        pname = plane.name
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = (ev.end_ns - ev.start_ns) / 1e6
                rows[(pname, line.name, ev.name)] += dur
                counts[(pname, line.name, ev.name)] += 1
    return rows, counts


def report(logdir, iters):
    rows, counts = parse_trace(logdir)
    tot = defaultdict(float)
    n = defaultdict(int)
    for (pname, lname, ev), ms in rows.items():
        if "Steps" in lname or "step" == lname:
            continue
        tot[ev] += ms
        n[ev] += counts[(pname, lname, ev)]
    for ev, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms/iters:9.4f} ms/iter  x{n[ev]:4d}  {ev[:110]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "wino"
    level = sys.argv[2] if len(sys.argv) > 2 else "l0"
    shapes = {"l0": (64, 64, 320, 320), "l1": (32, 32, 640, 640),
              "l2": (16, 16, 1280, 1280)}
    h, wd, c, cout = shapes[level]
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, h, wd, c), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, c, cout), jnp.float32) * 0.02

    if mode == "wino":
        from sd_tpu.ops.pallas.winograd_conv import winograd_conv3x3

        @jax.jit
        def step(x):
            return winograd_conv3x3(x, w)
    elif mode == "unet":
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
        shapes = jax.eval_shape(lambda kk: unet.init(kk, x0, t0, c0),
                                jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda s: jnp.zeros(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            shapes)["params"]

        # in/out shapes match ([B,64,64,4]) so the step chains on itself,
        # serializing iterations without any sync in between
        @jax.jit
        def step(x):
            return unet.apply(
                {"params": params}, x, t0, c0).astype(jnp.bfloat16)

        x = x0
        sync(step(x))
        logdir = tempfile.mkdtemp(prefix="prof_unet_")
        jax.profiler.start_trace(logdir)
        for _ in range(4):
            x = step(x)
        sync(x)
        jax.profiler.stop_trace()
        report(logdir, iters=4)
        return
    else:
        @jax.jit
        def step(x):
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

    sync(step(x0))  # compile
    logdir = tempfile.mkdtemp(prefix=f"prof_{mode}_")
    x = x0
    jax.profiler.start_trace(logdir)
    for _ in range(10):
        x = step(x)
    sync(x)
    jax.profiler.stop_trace()
    report(logdir, iters=10)


if __name__ == "__main__":
    main()
