"""Parallel / distributed execution layer.

The reference is single-threaded and single-process (SURVEY.md §2 checklist:
no DP/TP/PP/SP/EP, no NCCL/MPI). These are therefore new first-class
capabilities, built the TPU way — `jax.sharding.Mesh` + pjit/shard_map with
XLA collectives over ICI/DCN:

- frame-level data parallelism: independent scans/streams sharded across
  devices (embarrassingly parallel; per-stream adaptive state).
- point-level sharding within a frame (the "sequence parallel" analog for
  dense 128-beam scans): per-patch statistics combined with psum.
"""

from patchworkpp_tpu.parallel.sharded import (
    make_batch_frame_fn,
    make_point_sharded_frame_fn,
    make_point_sharded_sequence_fn,
    batch_init_state,
)

__all__ = [
    "make_batch_frame_fn",
    "make_point_sharded_frame_fn",
    "make_point_sharded_sequence_fn",
    "batch_init_state",
]
