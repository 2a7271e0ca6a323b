#!/usr/bin/env python
"""Shim: the soak lives at patchworkpp_tpu/cli/soak.py (console script
``ppk-soak``); this path keeps ``python scripts/soak.py`` working from a
bare checkout. See the module docstring there for what it asserts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patchworkpp_tpu.cli.soak import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
