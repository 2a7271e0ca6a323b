"""Model layer: user-facing segmentation engines built on the frame pipeline."""

from patchworkpp_tpu.models.patchworkpp import PatchworkPP, SegmentationResult
from patchworkpp_tpu.models.presets import patchwork_params, ros_launch_params

__all__ = [
    "PatchworkPP",
    "SegmentationResult",
    "patchwork_params",
    "ros_launch_params",
]
