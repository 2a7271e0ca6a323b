"""Serving layer: streaming ground segmentation for live point-cloud feeds."""

from patchworkpp_tpu.serve.server import GroundSegmentationServer, CloudMsg, ServerConfig

__all__ = ["GroundSegmentationServer", "CloudMsg", "ServerConfig"]
