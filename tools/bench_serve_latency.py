"""Warm batch-1 serving latency through the real scripts/serve.py daemon.

Starts the stdio daemon at a pinned serving configuration (default: the
fast-path operating point — 512², DPM-Solver++ 2M, 20 steps, CFG 7.5,
batch 1), lets the startup warmup pay the compile, then times N sequential
requests end-to-end as a client sees them (JSONL in -> response line out,
PNG written). Prints one JSON line with the min/median warm latency.

The r2 serving lesson lives here: before pipelines cached their jitted
programs, every warm request recompiled (15.2 s); the daemon + program
cache brought the PLMS-50 bf16 point to 0.38 s... for the tiny model.
This tool records the FLAGSHIP number. Usage:

    SD_TPU_INT8=all python tools/bench_serve_latency.py [n_requests]

Env knobs: SERVE_STEPS (20), SERVE_SAMPLER (dpm), SERVE_HW (512),
SERVE_OUTDIR (/tmp/serve_latency_out), SERVE_TINY (CPU smoke path).
"""

import json
import os
import statistics
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(_HERE)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    steps = int(os.environ.get("SERVE_STEPS", "20"))
    sampler = os.environ.get("SERVE_SAMPLER", "dpm")
    hw = int(os.environ.get("SERVE_HW", "512"))
    outdir = os.environ.get("SERVE_OUTDIR", "/tmp/serve_latency_out")

    cmd = [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
           "--stdio", "--H", str(hw), "--W", str(hw), "--steps", str(steps),
           "--sampler", sampler, "--max-batch", "1",
           "--outdir", outdir, "--no-safety",
           "--no-watermark"]
    if os.environ.get("SERVE_TINY"):  # CPU smoke path for tests/dev
        cmd.append("--tiny")
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, text=True, cwd=ROOT)
    try:
        # the daemon prints one JSON line per response; warmup happens
        # before it reads stdin, so the first request's response time
        # includes any residual compile — treat request 0 as warmup too.
        lat = []
        for i in range(n + 1):
            req = {"prompt": f"a photograph of an astronaut riding a horse",
                   "seed": 100 + i, "n": 1}
            t = time.perf_counter()
            proc.stdin.write(json.dumps(req) + "\n")
            proc.stdin.flush()
            line = proc.stdout.readline()
            if not line:
                raise RuntimeError("daemon exited early")
            resp = json.loads(line)
            assert resp.get("images") or resp.get("paths") or \
                "error" not in resp, resp
            dt = time.perf_counter() - t
            if i == 0:
                warm0 = dt
                startup = time.perf_counter() - t0
            else:
                lat.append(dt)
            print(f"request {i}: {dt:.3f} s"
                  + (" (first incl. residual compile)" if i == 0 else ""),
                  file=sys.stderr, flush=True)
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)

    result = {
        "metric": f"warm batch-1 serving latency @{hw}px {steps}-step "
                  f"{sampler} CFG7.5 (scripts/serve.py stdio, "
                  "SD_TPU_INT8=" + os.environ.get("SD_TPU_INT8", "0") + ")",
        "value": round(min(lat), 4),
        "unit": "s/image",
        "detail": {
            "median_s": round(statistics.median(lat), 4),
            "all_s": [round(x, 3) for x in lat],
            "first_request_s": round(warm0, 3),
            "startup_incl_compile_s": round(startup, 1),
            "requests": n,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
