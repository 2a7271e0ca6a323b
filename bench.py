"""Driver benchmark shim: prints ONE JSON line (see patchworkpp_tpu/cli/bench.py).

Kept at the repo root because the round driver invokes ``python bench.py``;
the implementation lives in the package (``ppk-bench`` console script).
"""

from patchworkpp_tpu.cli.bench import main

if __name__ == "__main__":
    main()
