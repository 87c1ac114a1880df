# Developer workflow targets (tooling parity: reference Makefile 1-36)

.PHONY: test style format install clean bench

test:
	python -m pytest tests/ -x -q

style:
	python -m flake8 contractn_tpu tests

format:
	python -m black contractn_tpu tests

install:
	pip install -e .

bench:
	python bench.py

clean:
	rm -rf build dist *.egg-info
	find . -name __pycache__ -type d -exec rm -rf {} +
