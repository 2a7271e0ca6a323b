"""Console entry points (installed as ``ppk-*`` scripts, see pyproject.toml).

The reference ships its user-facing surface as demo executables plus a PyPI
package (reference: python/pyproject.toml:1-8, Makefile:1-15,
python/examples/demo_*.py). Here the equivalents are real console scripts on
the installed package; the thin files under ``examples/`` call into these.

- :mod:`demo_visualize` — single-scan demo (``ppk-demo-visualize``)
- :mod:`demo_sequential` — multi-scan adapted-state demo (``ppk-demo-sequential``)
- :mod:`eval_semantickitti` — accuracy/latency eval harness (``ppk-eval``)
- :mod:`stream_bench` — native-loader streaming throughput (``ppk-stream-bench``)
- :mod:`bench` — the driver benchmark, one JSON line (``ppk-bench``)
"""
