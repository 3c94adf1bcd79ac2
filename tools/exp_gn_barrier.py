"""In-context ablation: GroupNorm stats barrier ON vs OFF on the CFG step.

r3 finding (tools/trace_summary.py): XLA fuses GN statistics reduces into
producer fusions containing convolutions, dropping those convs to 40-60% of
their padded bound (~13 ms/step of slack) while identical convs without the
stats epilogue run at ~100%. The barrier (sd_tpu/ops/norms.py::group_stats)
forces the stats into a standalone bandwidth-bound read instead.

Env toggle SD_TPU_GN_BARRIER is read at TRACE time, so one process can
measure both variants by re-jitting. Timing: async chains + one terminal
sync (CLAUDE.md); trust the DIFFERENCE, not the absolutes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_chain(step, x0, iters=15, reps=2):
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
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8,
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.full((B,), 500.0, jnp.float32)
    c0 = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x0, t0, c0),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes)["params"]

    results = {}
    for tag, env in (("barrier", "1"), ("fused-stats", "0")):
        os.environ["SD_TPU_GN_BARRIER"] = env

        @jax.jit
        def step(x):
            return unet.apply({"params": params}, x, t0, c0).astype(
                jnp.bfloat16)

        ms = time_chain(step, x0)
        results[tag] = ms
        print(f"unet/{tag:12s} {ms:8.2f} ms per CFG step", flush=True)
    d = results.get("fused-stats", 0) - results.get("barrier", 0)
    print(f"barrier saves {d:+.2f} ms/step")


if __name__ == "__main__":
    main()
