"""Data layer: KITTI/SemanticKITTI readers, padding, and evaluation."""

from patchworkpp_tpu.io.kitti import (
    read_bin,
    read_labels,
    pad_cloud,
    ScanDataset,
    GROUND_LABELS,
    ground_truth_mask,
    evaluate_masks,
)

__all__ = [
    "read_bin",
    "read_labels",
    "pad_cloud",
    "ScanDataset",
    "GROUND_LABELS",
    "ground_truth_mask",
    "evaluate_masks",
]
