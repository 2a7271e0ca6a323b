# Top-level targets mirroring the reference's Makefile (reference:
# Makefile:1-15 — pyinstall / cppinstall).

.PHONY: pyinstall cppinstall test test-slow bench check

pyinstall:
	pip install --no-build-isolation -e .

cppinstall:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

test-slow:
	python -m pytest tests/ -x -q -m slow

bench:
	python bench.py

check: pyinstall cppinstall test
