"""TPU-native tensor ops for the ground-segmentation pipeline.

Every op here is fixed-shape, mask-based, and batched over the full static
patch space — no per-patch dynamic control flow. The pure-jnp implementations
are the reference path; Pallas kernels (ops/pallas/) accelerate the hot spots
and are tested for equivalence against these.
"""

from patchworkpp_tpu.ops.binning import bin_points, PointBins
from patchworkpp_tpu.ops.segments import sort_by_patch, segment_rank, patch_starts
from patchworkpp_tpu.ops.moments import masked_patch_moments
from patchworkpp_tpu.ops.eigen3 import eigh3x3_descending

__all__ = [
    "bin_points",
    "PointBins",
    "sort_by_patch",
    "segment_rank",
    "patch_starts",
    "masked_patch_moments",
    "eigh3x3_descending",
]
