"""Parallel / distributed execution layer.

The reference is single-threaded and single-process (SURVEY.md §2 checklist:
no DP/TP/PP/SP/EP, no NCCL/MPI). These are therefore new first-class
capabilities, built the TPU way — `jax.sharding.Mesh` + pjit/shard_map with
XLA collectives over ICI/DCN:

- frame-level data parallelism: independent scans/streams sharded across
  devices (embarrassingly parallel; per-stream adaptive state).
- point-level sharding within a frame (the "sequence parallel" analog for
  dense 128-beam scans): per-patch statistics combined with psum.
- single-device CHUNKING: the point-sharded per-shard program over a vmapped
  chunk axis (parallel/chunked.py) — the mesh program's single-process
  emulation and the shard x chunk composition's building block (measured
  NOT a single-chip throughput lever; ROOFLINE.md "Single-chip CHUNKING").
"""

from patchworkpp_tpu.parallel.sharded import (
    make_batch_frame_fn,
    make_point_sharded_frame_fn,
    make_point_sharded_sequence_fn,
    batch_init_state,
)
from patchworkpp_tpu.parallel.chunked import (
    make_chunked_frame_fn,
    make_chunked_sequence_fn,
    make_sharded_chunked_frame_fn,
)

__all__ = [
    "make_batch_frame_fn",
    "make_point_sharded_frame_fn",
    "make_point_sharded_sequence_fn",
    "make_chunked_frame_fn",
    "make_chunked_sequence_fn",
    "make_sharded_chunked_frame_fn",
    "batch_init_state",
]
