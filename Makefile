# sd_tpu round gate. See CLAUDE.md for environment quirks (ONE cpu core:
# never run two targets concurrently).

.PHONY: test verify verify-cpu verify-tpu native

test:
	python -m pytest tests/ -q

# Flagship-scale round gate (VERDICT r2 weak #3): the checks that guard the
# 860M/512² claims, recorded to PARITY.md per round.
verify:
	bash tools/round_verify.sh

verify-cpu:
	SD_TPU_FULLSHAPE=1 python -m pytest tests/test_fullshape_parity.py -q

verify-tpu:
	SD_TPU_RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_only.py -q

native:
	$(MAKE) -C native
