"""In-context ablation: fused GN+SiLU+conv Pallas kernel vs XLA on the CFG step.

Variants (all re-jitted; env read at trace time):
  fused      SD_TPU_FUSED_CONV=1 (+ barrier default)
  xla+bar    SD_TPU_FUSED_CONV=0, SD_TPU_GN_BARRIER=1
  xla        SD_TPU_FUSED_CONV=0, SD_TPU_GN_BARRIER=0   (r2 baseline)

Timing: async chains + one terminal sync; trust differences.
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

    variants = [
        ("fused", {"SD_TPU_FUSED_CONV": "1", "SD_TPU_GN_BARRIER": "0",
                   "SD_TPU_CONV_IN_BARRIER": "0"}),
        ("inbar", {"SD_TPU_FUSED_CONV": "0", "SD_TPU_GN_BARRIER": "0",
                   "SD_TPU_CONV_IN_BARRIER": "1"}),
        ("fused+inbar", {"SD_TPU_FUSED_CONV": "1", "SD_TPU_GN_BARRIER": "0",
                         "SD_TPU_CONV_IN_BARRIER": "1"}),
        ("xla", {"SD_TPU_FUSED_CONV": "0", "SD_TPU_GN_BARRIER": "0",
                 "SD_TPU_CONV_IN_BARRIER": "0"}),
    ]
    only = sys.argv[1:] or None
    for tag, env in variants:
        if only and tag not in only:
            continue
        os.environ.update(env)

        @jax.jit
        def step(x):
            return unet.apply({"params": params}, x, t0, c0).astype(
                jnp.bfloat16)

        try:
            ms = time_chain(step, x0)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"unet/{tag}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"unet/{tag:8s} {ms:8.2f} ms per CFG step", flush=True)


if __name__ == "__main__":
    main()
