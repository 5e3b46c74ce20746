.PHONY: test test-fast bench dryrun smoke

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_model_parity.py

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

smoke:
	python bench.py  # E3DIFF_BENCH_SMOKE=1 with JAX_PLATFORMS=cpu for CPU
