"""TPU-native tensor ops for the ground-segmentation pipeline.

Every op here is fixed-shape, mask-based, and batched over the full static
patch space — no per-patch dynamic control flow, and (perf-critical) no
P-sized gathers or scatter-adds: patch<->point data movement is one-hot MXU
matmuls (ops/onehot.py).
"""

from patchworkpp_tpu.ops.binning import bin_points, PointBins
from patchworkpp_tpu.ops.segments import sort_by_patch, segment_rank, patch_counts
from patchworkpp_tpu.ops.onehot import SPAD, patch_lookup, patch_reduce
from patchworkpp_tpu.ops.moments import masked_patch_moments, moment_features
from patchworkpp_tpu.ops.eigen3 import eigh3x3_descending

__all__ = [
    "bin_points",
    "PointBins",
    "sort_by_patch",
    "segment_rank",
    "patch_counts",
    "SPAD",
    "patch_lookup",
    "patch_reduce",
    "masked_patch_moments",
    "moment_features",
    "eigh3x3_descending",
]
