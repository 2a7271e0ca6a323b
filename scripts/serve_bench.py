#!/usr/bin/env python
"""Shim: the serving-latency bench lives at
patchworkpp_tpu/cli/serve_bench.py (console script ``ppk-serve-bench``);
this path keeps ``python scripts/serve_bench.py`` working from a bare
checkout. See the module docstring there for the measurement protocol."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patchworkpp_tpu.cli.serve_bench import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
