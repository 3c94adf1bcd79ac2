#!/usr/bin/env bash
# Flagship-scale round gate: full-shape parity on CPU + on-chip regressions,
# results appended to PARITY.md (## Round verification log). Run once per
# round (`make verify`); ~15 min CPU + one TPU session.
set -u
cd "$(dirname "$0")/.."

stamp=$(date -u +"%Y-%m-%dT%H:%MZ")
round="${ROUND:-?}"

run() {  # run <tag> <cmd...> -> "tag=pass|FAIL(code)"
  local tag=$1; shift
  # Callers capture our stdout with $(...): route the test run's own output
  # to stderr so only the one-line verdict lands in the PARITY.md log entry.
  if "$@" 1>&2; then echo "$tag=pass"; else echo "$tag=FAIL($?)"; fi
}

r1=$(run fullshape env SD_TPU_FULLSHAPE=1 \
     python -m pytest tests/test_fullshape_parity.py -q)
r2=$(run tpu_only env SD_TPU_RUN_TPU_TESTS=1 \
     python -m pytest tests/test_tpu_only.py -q)
# perf-regression pin (VERDICT r3 #7): bench.py on chip vs tools/perf_pin.json;
# >3% below the pin fails the gate. Prints its own one-line verdict.
r3=$(python tools/check_perf_pin.py || true)

line="- ${stamp} round=${round}: ${r1}, ${r2}, ${r3}"
if ! grep -q "^## Round verification log" PARITY.md; then
  printf "\n## Round verification log\n\n" >> PARITY.md
fi
printf "%s\n" "$line" >> PARITY.md
echo "$line"
case "$r1$r2$r3" in *FAIL*) exit 1;; esac
