"""Benchmark: images/sec/chip for 512² 50-step PLMS txt2img (SD v1.4 shapes).

Runs the flagship compute graph — 50 PLMS steps of the CFG-doubled 860M UNet
followed by the kl-f8 VAE decode — with RANDOM bf16 params (no released
checkpoint ships in this environment; param VALUES don't affect MXU timing,
but param STRUCTURE does: with all-zero params closed over as constants,
XLA's CSE merges the structurally identical to_q/to_k/to_v projections into
one conv and deletes ~2-3 ms/step of real work — verified in the r3 HLO dump
where the flash kernel's q and v operands aliased the same instruction).
Prints ONE JSON line.

Implementation notes for THIS environment's remote-compile TPU tunnel (each
XLA compile costs minutes of RPC regardless of program size):
- the production sampler is a single ``lax.scan`` program
  (sd_tpu/samplers/plms.py); this bench drives the SAME per-step computation
  through a python loop of one jitted step with async dispatch and a single
  terminal sync — identical math and steady-state throughput, a fraction of
  the compile time;
- the once-per-prompt CLIP text encode (77 tokens, ~1-2 ms/image amortized,
  <1% of 50-step e2e time) is excluded from the timed program because its
  compile alone costs 3-6 min here; the timed path is noise -> 50 PLMS
  CFG-doubled UNet steps -> kl-f8 VAE decode -> [0,1] images.

vs_baseline: the reference publishes no throughput number (SURVEY.md §6);
BASELINE.json's target is >=4x an A100 chip. We use 0.45 img/s as the A100
figure for 512² PLMS-50 batch-1 fp16 (the commonly reproduced torch number
for scripts/txt2img.py on A100-40GB): vs_baseline = value / 0.45.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_IMAGES_PER_SEC = 0.45
BATCH = int(os.environ.get("BENCH_BATCH", "8"))       # images per batch
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
ITERS = int(os.environ.get("BENCH_ITERS", "2"))
# "plms" (the 50-step headline) or "dpm" = DPM-Solver++ 2M, the reference's
# fast-path sampler (dpm_solver/sampler.py; quality-equivalent at ~20 steps)
SAMPLER = os.environ.get("BENCH_SAMPLER", "plms").lower()
# "loop" (default): python loop of one jitted step — compile-cheap through
# the remote-compile tunnel, the driver-facing mode. "scan": the PRODUCTION
# sampler program (sd_tpu/samplers one-lax.scan + the int8 qw weight
# overlay when active) — measured 1.5-3 ms/CFG-step faster than the loop
# (tools/exp_wq_hoist.py: LICM/weight-traffic effects only exist inside the
# scan; per-call dispatch overhead only exists outside it), at the cost of
# a many-minute scan compile through this environment's tunnel.
MODE = os.environ.get("BENCH_MODE", "loop").lower()


def dpm2m_plan(schedule, steps):
    """Per-step ``(sr, aphi, inv_r0, mt, si, ai)`` rows for the DPM-Solver++
    2M python-loop bench, plus the final-update coefficients — the SAME
    tables as ``sd_tpu/samplers/dpm_solver.py::dpm_solver_sample`` (order=2,
    lower_order_final), against which tests/test_bench_dpm.py checks this
    plan's trajectory exactly. Step semantics: update x with the row's
    coefficients (row 0 is the identity: the bootstrap model eval), then
    evaluate the x0-model at ``mt``; after the last row apply the final
    update (no model eval)."""
    from sd_tpu.samplers.dpm_solver import DiscreteNoiseSchedule

    ns = DiscreteNoiseSchedule.from_schedule(schedule)
    ts = np.linspace(1.0, 1.0 / ns.total_N, steps + 1)
    lam = ns.lam(ts)
    alpha = np.exp(ns.log_alpha(ts))
    sigma = ns.sigma(ts)
    h = lam[1:] - lam[:-1]
    mt = ns.model_time(ts).astype(np.float32)
    rows = [
        (1.0, 0.0, 0.0, mt[0], sigma[0], alpha[0]),       # bootstrap eval
        (sigma[1] / sigma[0], alpha[1] * np.expm1(-h[0]), 0.0, mt[1],
         sigma[1], alpha[1]),                              # order-1 step
    ]
    for i in range(2, steps):                              # order-2 middles
        rows.append((sigma[i] / sigma[i - 1],
                     alpha[i] * np.expm1(-h[i - 1]),
                     (h[i - 2] / h[i - 1]) ** -1.0, mt[i], sigma[i],
                     alpha[i]))
    i = steps
    fo = 1 if steps < 15 else 2
    final = (sigma[i] / sigma[i - 1], alpha[i] * np.expm1(-h[i - 1]),
             0.0 if fo == 1 else (h[i - 2] / h[i - 1]) ** -1.0)
    to32 = lambda r: tuple(np.float32(v) for v in r)
    return [to32(r) for r in rows], to32(final)


def random_params(model, *args, seed=0):
    """Random bf16 params — NOT zeros: all-zero constants let XLA CSE away
    structurally identical branches (q/k/v projections), understating time."""
    shapes = jax.eval_shape(lambda k: model.init(k, *args), jax.random.PRNGKey(0))
    leaves, treedef = jax.tree.flatten(shapes["params"])
    key = jax.random.PRNGKey(seed)
    out = []
    for i, s in enumerate(leaves):
        dt = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        out.append(0.02 * jax.random.normal(jax.random.fold_in(key, i),
                                            s.shape, dt))
    return jax.tree.unflatten(treedef, out)


def main():
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.unet import UNetConfig, UNetModel
    from sd_tpu.models.vae import Decoder
    from sd_tpu.samplers.common import build_ddim_tables, ddim_step_from_eps

    b = BATCH
    schedule = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
    tables = build_ddim_tables(schedule, STEPS, eta=0.0)

    unet_cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=unet_cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2 * b, 64, 64, 4), jnp.bfloat16)
    t0_ = jnp.zeros((2 * b,), jnp.float32)
    c0 = jnp.zeros((2 * b, 77, 768), jnp.bfloat16)
    unet_params = random_params(unet, x0, t0_, c0)

    decoder = Decoder(ch=128, out_ch=3, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
                      attn_resolutions=[], resolution=512, z_channels=4,
                      dtype=jnp.bfloat16)
    dec_params = random_params(decoder, jnp.zeros((b, 64, 64, 4), jnp.bfloat16),
                               seed=1)

    idx = np.arange(STEPS)[::-1]
    t_seq = tables.timesteps[idx].astype(np.float32)
    a_seq = tables.alphas[idx]
    ap_seq = tables.alphas_prev[idx]
    s1m_seq = tables.sqrt_one_minus_alphas[idx]

    @jax.jit
    def plms_step(up, x, ctx2, t_scalar, a, ap, s1m, old_eps, order):
        """One PLMS step: CFG-doubled UNet + Adams-Bashforth update.
        Same math as sd_tpu/samplers/plms.py; order is traced (0..3).
        Params are a jit ARGUMENT (not a closure constant) so XLA cannot
        CSE structurally identical projections — matches production, where
        checkpoints are runtime params."""
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t_scalar)
        e = unet.apply({"params": up}, x2.astype(jnp.bfloat16), t2,
                       ctx2).astype(jnp.float32)
        e_u, e_c = jnp.split(e, 2, axis=0)
        e_t = e_u + 7.5 * (e_c - e_u)
        e_prime = jax.lax.switch(order, [
            lambda: e_t,
            lambda: (3 * e_t - old_eps[0]) / 2,
            lambda: (23 * e_t - 16 * old_eps[0] + 5 * old_eps[1]) / 12,
            lambda: (55 * e_t - 59 * old_eps[0] + 37 * old_eps[1] - 9 * old_eps[2]) / 24,
        ])
        x_prev, _ = ddim_step_from_eps(x, e_prime, a, ap, s1m, 0.0,
                                       jnp.zeros_like(x))
        new_old = jnp.stack([e_t, old_eps[0], old_eps[1]])
        return x_prev, new_old

    @jax.jit
    def decode(dp, z):
        img = decoder.apply({"params": dp}, (z / 0.18215).astype(jnp.bfloat16))
        return jnp.clip((img.astype(jnp.float32) + 1) / 2, 0, 1)

    def run_plms(rng, ctx2):
        x = jax.random.normal(rng, (b, 64, 64, 4))
        old = jnp.zeros((3, b, 64, 64, 4))
        for i in range(STEPS):
            order = min(i, 3)
            x, old = plms_step(unet_params, x, ctx2, t_seq[i], a_seq[i],
                               ap_seq[i], s1m_seq[i], old, order)
        return decode(dec_params, x)

    # --- DPM-Solver++ 2M (the reference's fast path) -------------------------
    # Coefficients come from dpm2m_plan — the SAME tables as
    # sd_tpu/samplers/dpm_solver.py::dpm_solver_sample (order=2,
    # lower_order_final; trajectory-checked exactly by
    # tests/test_bench_dpm.py) — expressed as ONE jitted update+eval step:
    # with sr=1/aphi=0/inv_r0=0 the update is the identity, which makes the
    # bootstrap model eval an instance of the same program. Model evals:
    # exactly STEPS (the final order-guarded update is a separate tiny jit
    # with no UNet call).
    dpm_rows, dpm_fin = dpm2m_plan(schedule, STEPS)

    @jax.jit
    def dpm_step(up, x, m0, m1, ctx2, sr, aphi, inv_r0, mt, si, ai):
        """x' = sr*x - aphi*m0 - aphi/2 * inv_r0*(m0-m1); m_new = x0(x', mt)."""
        x = sr * x - aphi * m0 - 0.5 * aphi * inv_r0 * (m0 - m1)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), mt)
        e = unet.apply({"params": up}, x2.astype(jnp.bfloat16), t2,
                       ctx2).astype(jnp.float32)
        e_u, e_c = jnp.split(e, 2, axis=0)
        e_t = e_u + 7.5 * (e_c - e_u)
        m_new = (x - si * e_t) / ai
        return x, m_new, m0

    @jax.jit
    def dpm_final(x, m0, m1, sr, aphi, inv_r0):
        return sr * x - aphi * m0 - 0.5 * aphi * inv_r0 * (m0 - m1)

    def run_dpm(rng, ctx2):
        x = jax.random.normal(rng, (b, 64, 64, 4))
        m0 = m1 = jnp.zeros((b, 64, 64, 4))
        for row in dpm_rows:  # row 0 = identity update (bootstrap eval)
            x, m0, m1 = dpm_step(unet_params, x, m0, m1, ctx2, *row)
        x = dpm_final(x, m0, m1, *dpm_fin)
        return decode(dec_params, x)

    run = run_dpm if SAMPLER == "dpm" else run_plms

    if MODE == "scan":
        from sd_tpu.ops.quant import prequantize_weights, wq_hoist_wanted
        from sd_tpu.samplers.dpm_solver import dpm_solver_sample
        from sd_tpu.samplers.plms import plms_sample

        qw = prequantize_weights(unet_params) if wq_hoist_wanted() else None
        cond1 = jnp.zeros((b, 77, 768), jnp.bfloat16)
        sampler_fn = dpm_solver_sample if SAMPLER == "dpm" else plms_sample

        def sample(up, qw_, cond, uncond, rng):
            variables = {"params": up}
            if qw_ is not None:
                variables["qw"] = qw_

            def model_fn(x, t, c):
                return unet.apply(variables, x.astype(jnp.bfloat16), t,
                                  c.astype(jnp.bfloat16)).astype(jnp.float32)

            out = sampler_fn(model_fn, schedule, (b, 64, 64, 4), cond, rng,
                             num_steps=STEPS, uncond=uncond,
                             guidance_scale=7.5)
            return out[0] if isinstance(out, tuple) else out

        jsample = jax.jit(sample)

        def run_scan(rng, _ctx2):
            return decode(dec_params, jsample(unet_params, qw, cond1, cond1,
                                              rng))

        run = run_scan

    ctx2 = jnp.zeros((2 * b, 77, 768), jnp.bfloat16)  # CLIP output shape

    # warmup / compile
    out = run(jax.random.PRNGKey(0), ctx2)
    _ = float(jnp.sum(out))  # terminal sync through the tunnel

    t_start = time.perf_counter()
    for i in range(ITERS):
        out = run(jax.random.PRNGKey(i + 1), ctx2)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t_start) / ITERS

    images_per_sec = b / dt
    from sd_tpu.ops.quant import int8_mode_label

    samp = "DPM-Solver++2M" if SAMPLER == "dpm" else "PLMS"
    if MODE == "scan":
        samp += " scan-program"
    # The 0.45 A100 figure is for 50 steps; per-step cost is one CFG-doubled
    # UNet eval in BOTH samplers, so at other step counts compare against the
    # step-scaled baseline (decode amortization ~3% favors the baseline).
    a100 = A100_IMAGES_PER_SEC * (50.0 / STEPS)
    result = {
        "metric": f"images/sec/chip @512px {STEPS}-step {samp} CFG7.5 "
                  "(SD v1.4 shapes, " + int8_mode_label() + ")",
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / a100, 3),
        "detail": {
            "batch": b,
            "steps": STEPS,
            "sec_per_batch": round(dt, 3),
            "ms_per_unet_step": round(dt / STEPS * 1000.0, 2),
            "device": str(jax.devices()[0]),
            "a100_baseline_images_per_sec": round(a100, 4),
            "a100_baseline_note": "0.45 img/s @50 steps, step-scaled"
                                  if STEPS != 50 else "0.45 img/s @50 steps",
            "methodology": (
                f"timed: noise -> {STEPS} CFG-doubled UNet steps ({samp}) "
                "-> kl-f8 decode; excludes CLIP encode (<1% amortized); "
                + ("the PRODUCTION one-lax.scan sampler program "
                   "(sd_tpu/samplers)"
                   + (" incl. its PLMS bootstrap eval" if SAMPLER != "dpm"
                      else "")
                   + ", with the int8 qw weight overlay when active"
                   if MODE == "scan" else
                   "excludes (PLMS only) the bootstrap's extra UNet call "
                   "(~2%); DPM path runs exactly STEPS model evals — "
                   "python loop of one jitted step with async dispatch + "
                   "one terminal sync (within 1.5-3 ms/step of the "
                   "production lax.scan, which BENCH_MODE=scan measures; "
                   "see module docstring for this environment's "
                   "compile/RPC constraints)")
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
