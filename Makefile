.PHONY: test test-fast bench dryrun smoke check check-full

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_model_parity.py

# Crash-isolated suite (compile-heavy files in per-file subprocesses so an
# XLA segfault fails one shard, not the session). `check` = mandatory gate
# before any end-of-round snapshot; `check-full` adds the torch-parity half.
check:
	python scripts/run_suite.py --fast

check-full:
	python scripts/run_suite.py

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

smoke:
	python bench.py  # E3DIFF_BENCH_SMOKE=1 with JAX_PLATFORMS=cpu for CPU
