"""Training-path benches on the real TPU.

Two modes:

  python tools/bench_train.py flagship   # 860M UNet train step (fwd+bwd+AdamW)
  python tools/bench_train.py trainer    # Trainer.fit it/s on the tiny model

``flagship`` is the VERDICT-r1 item-2 proof: jax.grad flows through
``UNetModel(attn_impl="auto")`` ON the chip — the Pallas flash backward runs
at the N=4096/1024 self-attention sites (einsum backward at N=256) — and
reports the 512²-latent training-step time. Memory: bf16 params 1.7 GB +
fp32 AdamW moments 6.9 GB + remat activations fits v5e-1's 16 GB at batch 4.

``trainer`` drives the REAL ``Trainer.fit`` loop (host-tracked step counter,
log-cadence-only scalar fetch) over a synthetic dataset and prints it/s —
the VERDICT-r1 item-3 proof that training is dispatch-bound, not RPC-bound.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# SD_TPU_PLATFORM=cpu forces the CPU backend (the axon sitecustomize pins
# JAX_PLATFORMS to the tunnel, so the env var alone is not enough)
if os.environ.get("SD_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SD_TPU_PLATFORM"])

import jax.numpy as jnp
import numpy as np

def flagship():
    import optax

    from sd_tpu.models.unet import UNetConfig, UNetModel

    # env read at call time (not import) so embedding callers — bench_suite's
    # train stage — can set the knobs after importing this module
    BATCH = int(os.environ.get("TRAIN_BENCH_BATCH", "4"))
    # Harness-validation shrink knobs (bench_suite --tiny): smaller trunk /
    # latent so the CPU backend can compile+run the program in seconds.
    CH = int(os.environ.get("TRAIN_BENCH_CH", "320"))
    RES = int(os.environ.get("TRAIN_BENCH_RES", "64"))

    cfg = UNetConfig.from_dict(dict(
        image_size=RES, in_channels=4, out_channels=4, model_channels=CH,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, legacy=False,
        use_checkpoint=True,  # remat: trade FLOPs for HBM
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    b = BATCH
    x = jnp.zeros((b, RES, RES, 4), jnp.bfloat16)
    tt = jnp.zeros((b,), jnp.float32)
    ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x, tt, ctx), jax.random.PRNGKey(0))

    # One flat normal + static slices: per-leaf fold_in/normal unrolls ~400
    # independent threefry chains, which the CPU XLA backend compiles for
    # minutes even at tiny shapes; a single RNG op + slices compiles fast.
    leaves, treedef = jax.tree.flatten(shapes["params"])
    sizes = [int(np.prod(s.shape)) for s in leaves]
    total = int(sum(sizes))

    @jax.jit
    def make_params(key):
        flat = jax.random.normal(key, (total,), jnp.float32) * 0.02
        out, off = [], 0
        for s, n in zip(leaves, sizes):
            dt = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            out.append(jax.lax.slice(flat, (off,), (off + n,))
                       .reshape(s.shape).astype(dt))
            off += n
        return jax.tree.unflatten(treedef, out)

    params = make_params(jax.random.PRNGKey(1))
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    # donate params + moments: the loop rebinds both every iteration, so XLA
    # updates them in place instead of holding two generations in HBM
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, t, ctx, target):
        def loss_fn(p):
            eps = unet.apply({"params": p}, x, t, ctx)
            return jnp.mean(jnp.square(eps.astype(jnp.float32) - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    target = jnp.zeros((b, RES, RES, 4), jnp.float32)
    t0 = time.perf_counter()
    params, opt_state, loss = train_step(params, opt_state, x, tt, ctx, target)
    _ = float(loss)  # sync -> compile + first step done
    compile_s = time.perf_counter() - t0

    iters = int(os.environ.get("TRAIN_BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = train_step(params, opt_state, x, tt, ctx, target)
    lf = float(loss)  # terminal sync
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": (f"flagship train step (860M UNet, 64x64 latents, remat, AdamW)"
                   if (CH, RES) == (320, 64) else
                   f"train step (shrunk ch={CH} res={RES}, remat, AdamW)"),
        "batch": b, "ms_per_step": round(dt * 1000, 2),
        "images_per_sec_train": round(b / dt, 3),
        "loss_finite": bool(np.isfinite(lf)),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


def trainer_loop():
    import optax

    from sd_tpu.training.diffusion_loss import LDMTrainer
    from sd_tpu.training.trainer import DataModuleFromConfig, Trainer
    from sd_tpu.utils.config import build_latent_diffusion
    from sd_tpu.utils.testing import tiny_sd_model_config

    ldm = build_latent_diffusion(tiny_sd_model_config(), rng=jax.random.PRNGKey(0))
    trainer_obj = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-4), use_ema=True)
    data = DataModuleFromConfig(
        batch_size=8,
        train={"target": "sd_tpu.data.synthetic.SyntheticImages",
               "params": {"size": 32, "length": 512, "caption_tokens": 8}},
    )
    steps = int(os.environ.get("TRAIN_BENCH_STEPS", "200"))
    tr = Trainer(trainer_obj=trainer_obj, ldm=None, logdir="/tmp/bench_trainer",
                 max_steps=steps, ckpt_every=10**9, log_every=50)
    state = trainer_obj.init_state()
    t0 = time.perf_counter()
    tr.fit(state, data)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "Trainer.fit it/s (tiny model, real device, incl. compile)",
        "steps": steps, "it_per_sec": round(steps / dt, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    print(f"device: {jax.devices()[0]}", flush=True)
    if mode == "flagship":
        flagship()
    else:
        trainer_loop()
