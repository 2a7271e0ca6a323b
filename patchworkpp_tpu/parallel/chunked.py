"""Single-device CHUNKED frame: point-sharding math over a vmapped axis.

The per-shard program of ``parallel/point_sharded.py`` run over a leading
chunk axis on ONE device: ``jax.vmap`` with an ``axis_name`` gives
``jax.lax.all_gather`` / ``psum`` / ``axis_index`` batching rules, so the
exact ``MeshComm`` collective hooks lower to ordinary array ops over the
chunk axis — one plain-jit executable, no SPMD lowering, no mesh. Labels
carry the sharded path's zero-tolerance parity contract — enforced in
tests/test_chunked.py against the single-device program, the oracle, and
the 8-device mesh (bitwise, including per-patch fit outputs).

ROLE (revised round 5, measured): this is a CORRECTNESS/EMULATION feature
and the building block of the shard x chunk composition
(:func:`make_sharded_chunked_frame_fn`) — NOT a performance lever. The r4
hypothesis (per-chunk sorts stay in the global sort's flat cost region)
was measured on chip and is FALSE twice over: jax.vmap lowers the layout
sort to a BATCHED variadic sort that costs ~2x the flat sort of the same
total rows, and the flat sort itself is nearly flat in row count to at
least 589k rows, so there is nothing for chunking to save. Full per-K
numbers and the two isolated causes: ROOFLINE.md "Single-chip CHUNKING".
``chunks`` therefore defaults to 1 everywhere and no auto-chunk policy
exists.

The reference (single-thread C++, cpp/patchworkpp/src/patchworkpp.cpp) has
no counterpart.
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


def make_sharded_chunked_frame_fn(
    params: Params,
    mesh,
    num_chunks: int,
    axis: str = "point",
    geom: CZMGeometry | None = None,
    fused: bool | str | None = "tiled",
):
    """Shard x chunk composition: the frame's points row-sharded over
    ``mesh[axis]``, each shard's rows further processed as ``num_chunks``
    vmapped chunks — the 1M-point multi-sensor class (each device keeps its
    per-chunk working set small while the mesh scales capacity).

    Global row layout is shard-major, chunk-minor (contiguous blocks), so
    with ``MeshComm((axis, "chunk"))`` the composed program's reductions run
    in the same linear block order as a plain ``mesh.shape[axis] *
    num_chunks``-device point-sharded mesh — bitwise the same program
    (asserted in tests/test_chunked.py::test_sharded_chunked_composition).

    Correctness-gated on the virtual CPU mesh only: the tunneled pod's
    fixed ~3-4.5 s SPMD dispatch tax (ROOFLINE.md) makes multi-device
    timing meaningless here. Returns ``fn(state, points, npts)`` with
    ``points`` (P, 4) row-sharded over ``axis``; P divisible by
    ``mesh.shape[axis] * num_chunks``.
    """
    from jax.sharding import PartitionSpec as P

    from patchworkpp_tpu.parallel.point_sharded import build as _ps_build
    from patchworkpp_tpu.state import AdaptiveState

    geom = geom or CZMGeometry.create(params)
    if num_chunks == 1:
        # geom passed through so a caller-supplied geometry is honored on
        # this fallback too (r5 review: it used to be silently rebuilt).
        return _ps_build(params, mesh, axis=axis, fused=fused, geom=geom)
    frame = make_frame_fn(
        params, geom, comm=MeshComm((axis, _AXIS)), fused=fused
    )
    vf = jax.vmap(frame, in_axes=(None, 0, None), out_axes=0, axis_name=_AXIS)

    def per_shard(state, pts_shard, npts):
        rows = pts_shard.shape[0]
        if rows % num_chunks:
            raise ValueError(
                f"per-shard rows {rows} not divisible by "
                f"num_chunks={num_chunks}"
            )
        pts = pts_shard.reshape(num_chunks, rows // num_chunks, -1)
        st, res = vf(state, pts, jnp.asarray(npts, jnp.int32))
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

    state_spec = jax.tree.map(lambda _: P(), AdaptiveState(*[0] * 7))
    result_spec = FrameResult(
        ground_mask=P(axis),
        num_ground=P(),
        patch_mean=P(),
        patch_normal=P(),
        patch_svals=P(),
        patch_processed=P(),
    )
    shard_frame = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(state_spec, P(axis), P()),
        out_specs=(state_spec, result_spec),
        check_vma=False,
    )
    return jax.jit(shard_frame)


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
