"""Single-scan demo shim (reference: python/examples/demo_visualize.py).

The implementation lives in :mod:`patchworkpp_tpu.cli.demo_visualize` so it
is importable from the installed package (`pip install -e .`) and available
as the ``ppk-demo-visualize`` console script.
"""

from patchworkpp_tpu.cli.demo_visualize import main

if __name__ == "__main__":
    main()
