"""Mesh-sharded execution of the frame pipeline.

Two axes of scale (new capabilities over the single-thread reference):

1. **Frame data parallelism** (`make_batch_frame_fn`): a batch of frames —
   independent streams, or chunks of an evaluation set — sharded over a mesh
   axis. Each shard carries its own :class:`AdaptiveState`; no collectives
   are needed because the adaptive state is inherently per-stream (the
   reference adapts one sensor's thresholds over *its* frames).

2. **Point sharding within a frame** (`make_point_sharded_frame_fn`): the
   points of one (dense) scan are split across devices; every per-patch
   statistic (LPR candidates, plane-fit moments, final label reduction) is
   combined with small XLA collectives over ICI. The patch space (504) is
   replicated — it is the sufficient statistic, 100s of KB at most.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.pipeline import make_frame_fn
from patchworkpp_tpu.state import AdaptiveState, init_state


def batch_init_state(params: Params, batch: int) -> AdaptiveState:
    """A batch of fresh per-stream states (leading axis = stream)."""
    one = init_state(params)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def make_batch_frame_fn(params: Params, mesh: Mesh, axis: str = "frame"):
    """Data-parallel batched frame step over ``mesh[axis]``.

    Returns jitted ``fn(states, points, npts) -> (states, results)`` where
    ``points`` is (B, P, 4), ``npts`` (B,), and every state leaf has leading
    batch axis B; B must be divisible by the mesh axis size.
    """
    frame = make_frame_fn(params)
    vframe = jax.vmap(frame)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    state_shardings = AdaptiveState(
        sensor_height=shard, elevation_thr=shard, flatness_thr=shard,
        elev_buf=shard, elev_cnt=shard, flat_buf=shard, flat_cnt=shard,
    )
    from patchworkpp_tpu.pipeline import FrameResult

    result_shardings = FrameResult(
        ground_mask=shard, num_ground=shard, patch_mean=shard,
        patch_normal=shard, patch_svals=shard, patch_processed=shard,
    )
    return jax.jit(
        vframe,
        in_shardings=(state_shardings, shard, shard),
        out_shardings=(state_shardings, result_shardings),
    )


def make_point_sharded_frame_fn(
    params: Params, mesh: Mesh, axis: str = "point", donate_state: bool = False
):
    """Single-frame step with the point dimension sharded over ``mesh[axis]``.

    The implementation lives in :mod:`patchworkpp_tpu.parallel.point_sharded`;
    this thin wrapper keeps the public surface stable.
    """
    from patchworkpp_tpu.parallel.point_sharded import build as _build

    return _build(params, mesh, axis, donate_state=donate_state)
