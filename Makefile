.PHONY: tests tests_all bench

tests:
	python -m pytest tests/ -x -q -m "not slow"

tests_all:
	python -m pytest tests/ -x -q

bench:
	python bench.py
