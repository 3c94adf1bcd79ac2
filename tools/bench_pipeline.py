"""Production-pipeline benchmark: the REAL Txt2ImgPipeline at flagship scale.

bench.py times a python loop of one jitted CFG step + decode (compile-cheap
through the remote-compile tunnel). This tool times what production runs:
``Txt2ImgPipeline.__call__`` end-to-end — host tokenize, CLIP encode, PLMS
bootstrap, the cached 50-step ``lax.scan`` program, kl-f8 decode, safety
checker and watermark host cost — at the bench operating point (512², 50
steps, CFG 7.5, batch 8, random flagship weights). Prints one JSON line with
the e2e number next to bench.py's step-loop methodology for the honesty
check (VERDICT r2 weak #2): if the scan steady-state diverged from the
step-loop bench, it would show here.

Usage: python tools/bench_pipeline.py [batch] [steps] [iters]
(first call pays one scan-program compile through the tunnel: many minutes)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from sd_tpu.pipelines.build import build_txt2img_pipeline

    pipe, _ = build_txt2img_pipeline(
        config="configs/stable-diffusion/v1-inference.yaml", min_hw=512)
    prompts = ["a photograph of an astronaut riding a horse"] * batch

    def run(seed):
        return pipe(prompts, jax.random.PRNGKey(seed), height=512, width=512,
                    steps=steps, guidance_scale=7.5, sampler="plms")

    t0 = time.perf_counter()
    imgs = run(0)  # compile + first batch
    compile_s = time.perf_counter() - t0
    assert len(imgs) == batch

    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        run(i + 1)
        best = min(best, time.perf_counter() - t0)

    # pipelined serving throughput: depth-2 map_batches overlaps host
    # postprocess (fetch/safety/watermark) with the next batch's device work
    n_piped = max(iters, 3)
    reqs = [dict(prompts=prompts, rng=jax.random.PRNGKey(100 + i),
                 height=512, width=512, steps=steps, guidance_scale=7.5,
                 sampler="plms") for i in range(n_piped)]
    t0 = time.perf_counter()
    for out in pipe.map_batches(iter(reqs), depth=2):
        assert out.shape[0] == batch
    piped_sec = (time.perf_counter() - t0) / n_piped

    ips = batch / best
    ips_piped = batch / piped_sec
    print(json.dumps({
        "metric": "images/sec/chip e2e production pipeline @512px "
                  f"{steps}-step PLMS CFG7.5",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / 0.45, 3),
        "detail": {
            "batch": batch,
            "steps": steps,
            "sec_per_batch_e2e": round(best, 3),
            "pipelined_images_per_sec": round(ips_piped, 4),
            "pipelined_sec_per_batch": round(piped_sec, 3),
            "pipelined_vs_baseline": round(ips_piped / 0.45, 3),
            "first_call_s_incl_compile": round(compile_s, 1),
            "includes": "tokenize + CLIP encode + PLMS bootstrap + "
                        f"{steps}-step cached lax.scan + kl-f8 decode + "
                        "safety + watermark (full request path); pipelined_* "
                        "= depth-2 map_batches serving throughput",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
