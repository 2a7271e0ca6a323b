# Top-level targets mirroring the reference's Makefile (reference:
# Makefile:1-15 — pyinstall / cppinstall).

.PHONY: pyinstall pyinstall_with_demo cppinstall test test-slow bench check

pyinstall:
	pip install --no-build-isolation -e .

# Reference Makefile's pyinstall_with_demo analog (Open3D visualization).
pyinstall_with_demo:
	pip install --no-build-isolation -e .[demo]

cppinstall:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

test-slow:
	python -m pytest tests/ -x -q -m slow

bench:
	python bench.py

check: pyinstall cppinstall test
