"""Perf-regression pins for the round gate (VERDICT r3 #7 + r4 #4).

Runs the benches on the real chip and compares against the pinned values in
``tools/perf_pin.json`` — the bf16 headline, the int8 opt-in serving mode,
and the production-pipeline e2e numbers (sequential + depth-2 pipelined,
both parsed from ONE tools/bench_pipeline.py run). A pin FAILs if
throughput drifts more than ``tol_pct`` below its value — session-to-session
absolutes drift 1-3% (PARITY.md caveat), so tolerances are 3-4%. An
improvement never fails; it prints a reminder to raise the pin.

Prints exactly one stdout line for the PARITY.md round log, e.g.::

    bench[bf16]=1.3991(+0.0%) bench[int8]=1.6664(+0.0%) ... pass

Usage: python tools/check_perf_pin.py [pin-name ...]
(no args = all pins; honors BENCH_* env knobs for the bench kind)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_json(cmd, env_extra):
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          env=env)
    sys.stderr.write(proc.stderr[-2000:])
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stdout[-2000:])
        return None
    return json.loads(lines[-1])


def _field(result, dotted):
    cur = result
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def main():
    with open(os.path.join(REPO, "tools", "perf_pin.json")) as f:
        cfg = json.load(f)
    pins = cfg["pins"]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        pins = [p for p in pins if p["name"] in want]

    results = {}  # (kind, env-key) -> parsed JSON (pipeline runs ONCE)
    parts, ok = [], True
    for pin in pins:
        env = pin.get("env", {})
        key = (pin["kind"], tuple(sorted(env.items())))
        if key not in results:
            if pin["kind"] == "bench":
                cmd = [sys.executable, os.path.join(REPO, "bench.py")]
            else:
                cmd = [sys.executable,
                       os.path.join(REPO, "tools", "bench_pipeline.py")]
            results[key] = _run_json(cmd, env)
        result = results[key]
        if result is None:
            parts.append(f"{pin['name']}=ERROR")
            ok = False
            continue
        val = float(_field(result, pin.get("field", "value")))
        ref, tol = pin["img_per_sec"], pin["tol_pct"]
        delta_pct = (val / ref - 1.0) * 100.0
        pin_ok = delta_pct >= -tol
        ok = ok and pin_ok
        mark = "" if pin_ok else " FAIL"
        if delta_pct > tol:
            mark = " (beats pin)"
        parts.append(f"{pin['name']}={val:.4f}({delta_pct:+.1f}%){mark}")
    print("bench " + " ".join(parts) + (" pass" if ok else " FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
