"""Serving layer: streaming ground segmentation for live point-cloud feeds."""

from patchworkpp_tpu.serve.server import GroundSegmentationServer, CloudMsg, ServerConfig
from patchworkpp_tpu.serve.multi_stream import MultiStreamSegmenter

__all__ = [
    "GroundSegmentationServer",
    "CloudMsg",
    "ServerConfig",
    "MultiStreamSegmenter",
]
