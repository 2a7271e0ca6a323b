"""Sequential multi-scan demo shim (reference: python/examples/demo_sequential.py).

The implementation lives in :mod:`patchworkpp_tpu.cli.demo_sequential` so it
is importable from the installed package (`pip install -e .`) and available
as the ``ppk-demo-sequential`` console script.
"""

from patchworkpp_tpu.cli.demo_sequential import main

if __name__ == "__main__":
    main()
