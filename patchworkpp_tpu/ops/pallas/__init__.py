"""Pallas TPU kernels: the fused per-patch fit loop.

The product kernel is ``fit_kernel_grid.fused_fit_grid`` (pass program as the
Pallas grid; compiles on TPU in ~70 s, ~1.4 ms/frame). ``fit_kernel`` (fully
unrolled, one-hot movement) and ``fit_kernel_scan`` (unrolled, segment-matrix
movement) are its interpret-mode-exact ancestors, kept as oracles for the
grid variant's semantics; their whole-kernel Mosaic compiles exceed 40 min on
this toolchain, so they are never the default.
"""

from patchworkpp_tpu.ops.pallas.fit_kernel import fused_fit
from patchworkpp_tpu.ops.pallas.fit_kernel_scan import fused_fit_scan
from patchworkpp_tpu.ops.pallas.fit_kernel_grid import fused_fit_grid

__all__ = ["fused_fit", "fused_fit_scan", "fused_fit_grid"]
