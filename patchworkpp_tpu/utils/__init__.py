"""Shared utilities: profiling, logging, verbose reporting."""

from patchworkpp_tpu.utils.profiling import FrameTimer, profile_trace

__all__ = ["FrameTimer", "profile_trace"]
