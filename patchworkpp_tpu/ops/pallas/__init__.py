"""Pallas TPU kernels: the fused per-patch fit loop.

The product kernel is ``fit_kernel_grid.fused_fit_grid`` (pass program as the
Pallas grid, patch-level state, one-hot MXU movement from ``movement.py``;
compiles on TPU in ~110 s, ~0.27 ms/frame). ``fit_kernel`` (fully unrolled,
in-kernel one-hot movement) is its interpret-mode-exact ancestor, kept as an
oracle for the grid variant's semantics; its whole-kernel Mosaic compile
exceeds 40 min on this toolchain, so it is never the default.
"""

from patchworkpp_tpu.ops.pallas.fit_kernel import fused_fit
from patchworkpp_tpu.ops.pallas.fit_kernel_grid import fused_fit_grid

__all__ = ["fused_fit", "fused_fit_grid"]
