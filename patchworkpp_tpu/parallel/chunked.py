"""Single-device CHUNKED frame: point-sharding math over a vmapped axis.

Why this exists (ROOFLINE.md "Dense scans"): the global (patch, z)
``lax.sort`` that builds the tiled layout is nearly FLAT in row count up to
~262k rows, then leaves its flat region — a 524k-point frame costs 2.7x a
262k one on a single chip. Point sharding fixes that across devices (each
shard sorts only its rows), but a dense scan on ONE chip paid the full
super-linear sort. This module runs the *same* per-shard program over a
leading chunk axis on one device: ``jax.vmap`` with an ``axis_name`` gives
``jax.lax.all_gather`` / ``psum`` / ``axis_index`` batching rules, so the
exact ``MeshComm`` collective hooks from ``parallel/point_sharded.py`` lower
to ordinary (fusable) array ops over the chunk axis — one plain-jit
executable, no SPMD lowering, no mesh.

A (K, P/K)-batched ``lax.sort`` sorts each chunk independently in ONE call,
keeping every chunk inside the sort's flat region. Cross-chunk state is the
same few-hundred-KB per-patch statistics point sharding exchanges over ICI
(fixed shard-order reduction, gather+sorted LPR merge), so labels carry the
same zero-tolerance parity contract as the sharded path — enforced in
tests/test_chunked.py against the single-device program, the oracle, and
the 8-device mesh.

The reference (single-thread C++, cpp/patchworkpp/src/patchworkpp.cpp) has
no counterpart; this is the dense-scan (128-beam / multi-sensor-fusion
class) single-chip scaling path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from patchworkpp_tpu.params import CZMGeometry, Params
from patchworkpp_tpu.pipeline import (
    FrameResult,
    make_frame_fn,
)
from patchworkpp_tpu.parallel.point_sharded import MeshComm

_AXIS = "chunk"


def make_chunked_frame_fn(
    params: Params,
    num_chunks: int,
    geom: CZMGeometry | None = None,
    fused: bool | str | None = "tiled",
):
    """Jitted ``fn(state, points, npts) -> (state, FrameResult)`` where the
    (P, 4) points are processed as ``num_chunks`` contiguous row blocks on
    ONE device (P must be divisible by ``num_chunks``).

    Semantics are the point-sharded path's (same ``MeshComm`` hooks, same
    fixed-order reductions), so the result contract matches
    ``parallel.point_sharded.build`` over a ``num_chunks``-device mesh —
    with the chunk axis realized as a batched leading dim instead of a mesh.
    ``num_chunks=1`` returns the plain single-device frame.
    """
    geom = geom or CZMGeometry.create(params)
    if num_chunks == 1:
        return jax.jit(make_frame_fn(params, geom, fused=fused))
    frame = make_frame_fn(params, geom, comm=MeshComm(_AXIS), fused=fused)
    vf = jax.vmap(frame, in_axes=(None, 0, None), out_axes=0, axis_name=_AXIS)

    def fn(state, points, npts):
        p_rows = points.shape[0]
        if p_rows % num_chunks:
            raise ValueError(
                f"point capacity {p_rows} not divisible by "
                f"num_chunks={num_chunks}"
            )
        pts = points.reshape(num_chunks, p_rows // num_chunks, points.shape[1])
        st, res = vf(state, pts, jnp.asarray(npts, jnp.int32))
        # Patch-space outputs and the state update are computed from the
        # MERGED per-patch statistics, identically in every chunk (the same
        # replication the shard_map path's out_specs=P() asserts) — chunk 0
        # is the canonical copy.
        state_out = jax.tree.map(lambda a: a[0], st)
        result = FrameResult(
            ground_mask=res.ground_mask.reshape(-1),
            num_ground=res.num_ground[0],
            patch_mean=res.patch_mean[0],
            patch_normal=res.patch_normal[0],
            patch_svals=res.patch_svals[0],
            patch_processed=res.patch_processed[0],
        )
        return state_out, result

    return jax.jit(fn)


def make_chunked_sequence_fn(
    params: Params,
    num_chunks: int,
    geom: CZMGeometry | None = None,
    fused: bool | str | None = "tiled",
):
    """Chunked analog of ``pipeline.make_sequence_fn``: one jitted dispatch
    scans B state-chained frames, each processed as ``num_chunks`` blocks.

    ``fn(state, stack, npts) -> (state, FrameResult)`` with ``stack``
    (B, P, 4) and B-leading FrameResult fields — bitwise-equal to calling
    :func:`make_chunked_frame_fn`'s product B times in order (lax.scan with
    the adaptive state as carry, the bench/serving dispatch shape).
    """
    geom = geom or CZMGeometry.create(params)
    if num_chunks == 1:
        from patchworkpp_tpu.pipeline import make_sequence_fn

        return jax.jit(make_sequence_fn(params, geom, fused=fused))
    frame = make_frame_fn(params, geom, comm=MeshComm(_AXIS), fused=fused)
    vf = jax.vmap(frame, in_axes=(None, 0, None), out_axes=0, axis_name=_AXIS)

    def sequence(state, stack, npts):
        b, p_rows = stack.shape[0], stack.shape[1]
        if p_rows % num_chunks:
            raise ValueError(
                f"point capacity {p_rows} not divisible by "
                f"num_chunks={num_chunks}"
            )
        pts = stack.reshape(b, num_chunks, p_rows // num_chunks, stack.shape[2])

        def step(st, xn):
            x, n = xn
            st2, res = vf(st, x, jnp.asarray(n, jnp.int32))
            st2 = jax.tree.map(lambda a: a[0], st2)
            out = FrameResult(
                ground_mask=res.ground_mask.reshape(-1),
                num_ground=res.num_ground[0],
                patch_mean=res.patch_mean[0],
                patch_normal=res.patch_normal[0],
                patch_svals=res.patch_svals[0],
                patch_processed=res.patch_processed[0],
            )
            return st2, out

        return jax.lax.scan(step, state, (pts, npts))

    return jax.jit(sequence)
