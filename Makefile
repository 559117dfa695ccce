# Parity with the reference's Makefile (test/release targets) adapted to
# this engine's surfaces.

.PHONY: test bench plans correctness clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

plans:
	python tools/dump_plans.py

correctness:
	python -m pytest tests/test_correctness.py -q

clean:
	rm -rf .pytest_cache spark-warehouse */__pycache__ __pycache__
