"""Decompose the production-pipeline e2e time into stages, on chip.

bench_pipeline.py measured 7.42 s/batch sequential (7.12 pipelined) vs an
expected ~6.0 s from bench.py's step measurements. This tool builds the
SAME flagship pipeline and times each stage in isolation with forced syncs:

  encode      CLIP cond+uncond encode programs
  sample      the cached 50-step PLMS scan program (device, synced)
  decode      kl-f8 decode + u8 cast program (device, synced)
  fetch       device_get of the uint8 image batch through the tunnel
  safety      nsfw_scores program + flags fetch
  watermark   host vectorized DWT/DCT embed

and separately times a python loop of 50 individual CFG steps through
ldm.apply_model (bench.py methodology, params as args) to expose any
scan-vs-loop steady-state delta (VERDICT r2 weak #2).

Usage: python tools/exp_pipeline_decomp.py [batch] [steps] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync():
    # block_until_ready lies through the tunnel; a scalar fetch does not
    pass


def fsync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from sd_tpu.pipelines.build import build_txt2img_pipeline

    pipe, _ = build_txt2img_pipeline(
        config="configs/stable-diffusion/v1-inference.yaml", min_hw=512)
    prompts = ["a photograph of an astronaut riding a horse"] * batch
    out = {}

    def best_of(fn, n=iters):
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    # ---- warm everything once via the full call
    t0 = time.perf_counter()
    pipe(prompts, jax.random.PRNGKey(0), height=512, width=512, steps=steps,
         guidance_scale=7.5, sampler="plms")
    out["warm_call_s"] = round(time.perf_counter() - t0, 3)

    # ---- encode
    cond = pipe.encode_prompts(prompts)
    uncond = pipe.encode_prompts([""] * batch)
    fsync(cond)

    def do_encode():
        c = pipe.encode_prompts(prompts)
        u = pipe.encode_prompts([""] * batch)
        fsync(c), fsync(u)

    out["encode_s"] = round(best_of(do_encode), 3)

    # ---- sample (cached scan program)
    skey = ("sample", "plms", 512, 512, steps, 7.5, 0.0, True, False)
    sample = pipe._jit_cache[skey]

    def do_sample():
        z = sample(pipe._sample_params(), cond, uncond,
                   jax.random.PRNGKey(1), None)
        fsync(z)
        return z

    t0 = time.perf_counter()
    z = do_sample()
    out["sample_scan_s"] = round(time.perf_counter() - t0, 3)
    out["sample_scan_best_s"] = round(best_of(do_sample), 3)

    # ---- decode + fetch + safety + watermark
    decode = pipe._jit_cache["decode"]
    fp = pipe.ldm.runtime_params("first_stage_params")

    def do_decode():
        img = decode(fp, z)
        fsync(img)
        return img

    img_dev = do_decode()
    out["decode_s"] = round(best_of(do_decode), 3)
    out["fetch_u8_s"] = round(
        best_of(lambda: np.asarray(jax.device_get(img_dev))), 3)
    if pipe.safety_checker is not None:
        def do_safety():
            np.asarray(jax.device_get(
                pipe.safety_checker.nsfw_scores(img_dev)))

        do_safety()
        out["safety_s"] = round(best_of(do_safety), 3)
    img_u8 = np.asarray(jax.device_get(img_dev))
    if pipe.watermarker is not None:
        out["watermark_s"] = round(
            best_of(lambda: pipe.watermarker(img_u8)), 3)

    # ---- python loop of individual CFG steps (bench.py methodology)
    import dataclasses

    ldm = pipe.ldm
    up = ldm.runtime_params("unet_params")

    def cfg_step(p, x, t, cond, uncond):
        m = ldm.bind_params(p)
        xx = jnp.concatenate([x, x], 0)
        tt = jnp.concatenate([t, t], 0)
        cc = jnp.concatenate([uncond, cond], 0)
        e = m.apply_model(xx, tt, {"c_crossattn": cc})
        e_u, e_c = jnp.split(e, 2, 0)
        eps = e_u + 7.5 * (e_c - e_u)
        return x - 0.01 * eps

    step = jax.jit(cfg_step)
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, 64, 64, 4),
                          jnp.bfloat16)
    t = jnp.full((batch,), 500.0, jnp.float32)
    x1 = step(up, x, t, cond, uncond)
    fsync(x1)  # compile

    def do_loop():
        y = x
        for _ in range(steps):
            y = step(up, y, t, cond, uncond)
        fsync(y)

    t0 = time.perf_counter()
    do_loop()
    out["loop_50step_s"] = round(time.perf_counter() - t0, 3)
    out["loop_50step_best_s"] = round(best_of(do_loop), 3)
    out["scan_minus_loop_s"] = round(
        out["sample_scan_best_s"] - out["loop_50step_best_s"], 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
