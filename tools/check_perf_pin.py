"""Perf-regression pin for the round gate (VERDICT r3 #7).

Runs ``bench.py`` on the real chip, parses its one JSON line, and compares
against the pinned value in ``tools/perf_pin.json``. Exit 1 (and say FAIL)
if throughput drifts more than ``tol_pct`` BELOW the pin — session-to-session
absolutes drift 1-3% (PARITY.md caveat), so the tolerance is 3% by default.
An improvement never fails; it prints a reminder to raise the pin.

Prints exactly one stdout line for the PARITY.md round log, e.g.::

    bench=1.3991 img/s (pin 1.3991, +0.0%) pass

Usage: python tools/check_perf_pin.py  (honors BENCH_* env knobs)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    with open(os.path.join(REPO, "tools", "perf_pin.json")) as f:
        pin = json.load(f)

    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, cwd=REPO)
    sys.stderr.write(proc.stderr[-2000:])
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stdout[-2000:])
        print("bench=ERROR (bench.py failed) FAIL")
        return 1
    result = json.loads(lines[-1])
    val, ref, tol = result["value"], pin["img_per_sec"], pin["tol_pct"]
    delta_pct = (val / ref - 1.0) * 100.0
    ok = delta_pct >= -tol
    verdict = "pass" if ok else "FAIL"
    if delta_pct > tol:
        verdict += " (beats pin — raise tools/perf_pin.json)"
    print(f"bench={val:.4f} img/s (pin {ref:.4f}, {delta_pct:+.1f}%) {verdict}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
