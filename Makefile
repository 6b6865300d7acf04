# Convenience targets.
.PHONY: test test-tpu bench native clean

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-tpu:
	python -m pytest tpu_tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
