"""Compatibility facades for downstream users of the reference APIs."""

from patchworkpp_tpu.compat import pypatchworkpp

__all__ = ["pypatchworkpp"]
