"""Multi-device sharding tests on a virtual 8-device CPU mesh.

Exercises the same pjit/shard_map/collective code paths a real pod slice
would use (SURVEY.md §4c): frame data parallelism and point sharding within
a frame, validated against the single-device pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patchworkpp_tpu import Params, init_state
from patchworkpp_tpu.models import PatchworkPP
from patchworkpp_tpu.parallel import (
    batch_init_state,
    make_batch_frame_fn,
    make_point_sharded_frame_fn,
    make_point_sharded_sequence_fn,
)

SUB = 16
CAPACITY = 8192


def _pad(cloud, cap=CAPACITY):
    out = np.zeros((cap, 4), np.float32)
    out[: len(cloud)] = cloud
    return out


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), ("d",))


@pytest.fixture(scope="module")
def single_results(scans):
    m = PatchworkPP(capacity=CAPACITY)
    out = {}
    for name in ["000000", "000001"]:
        out[name] = m.estimate_ground(scans[name][::SUB]).ground_mask
        m.reset()
    return out


def test_frame_data_parallel(mesh8, scans, single_results):
    """8 frames sharded over 8 devices; each must match single-device labels."""
    p = Params()
    fn = make_batch_frame_fn(p, mesh8, axis="d")
    names = ["000000", "000001"] * 4
    clouds = np.stack([_pad(scans[n][::SUB]) for n in names])
    npts = np.array([len(scans[n][::SUB]) for n in names], np.int32)
    states = batch_init_state(p, 8)
    new_states, res = fn(states, jnp.asarray(clouds), jnp.asarray(npts))
    masks = np.asarray(res.ground_mask)
    for i, n in enumerate(names):
        got = masks[i][: npts[i]]
        np.testing.assert_array_equal(got, single_results[n], err_msg=f"frame {i}")
    # states adapted independently and identically per stream content
    sh = np.asarray(new_states.sensor_height)
    assert np.allclose(sh[0], sh[2]) and np.allclose(sh[1], sh[3])


def test_point_sharded_frame(mesh8, scans, single_results):
    """One frame's points sharded over 8 devices: labels EXACTLY match the
    single-device program on both real scans (zero tolerance). Cross-shard
    reductions are fixed-order (MeshComm.reduce_patches: all_gather + sum in
    shard order; lpr_stats: gather + sorted merge), so there is no
    reduction-order slack to forgive."""
    p = Params()
    fn = make_point_sharded_frame_fn(p, mesh8, axis="d")
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        padded = _pad(cloud)
        state = init_state(p)
        new_state, res = fn(state, jnp.asarray(padded), jnp.int32(len(cloud)))
        got = np.asarray(res.ground_mask)[: len(cloud)]
        np.testing.assert_array_equal(got, single_results[name], err_msg=name)
        assert abs(float(new_state.sensor_height) - 1.723) < 0.2


def test_merge_lpr_table_contract():
    """Pin the FrameComm.merge_lpr_table hook contract (the identity
    reference semantics custom comms must honor): occupied slots sum in
    rank order, count clamps to num_lpr, empty patches yield (0, 0)."""
    from patchworkpp_tpu.pipeline import FrameComm

    num_lpr = 4
    z = jnp.asarray(
        [
            [-1.9, -1.7, -1.5, 0.0],   # 3 of 4 slots occupied, 3 eligible
            [-2.0, -1.8, -1.6, -1.4],  # full table, 9 eligible > num_lpr
            [0.0, 0.0, 0.0, 0.0],      # empty patch
        ],
        jnp.float32,
    )
    occ = jnp.asarray(
        [[1, 1, 1, 0], [1, 1, 1, 1], [0, 0, 0, 0]], jnp.float32
    )
    cnt = jnp.asarray([3.0, 9.0, 0.0])
    s, k = FrameComm().merge_lpr_table(z, occ, cnt, num_lpr)
    np.testing.assert_allclose(np.asarray(s), [-5.1, -6.8, 0.0], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(k), [3.0, 4.0, 0.0])


def test_point_sharded_unfused_exact(mesh8, scans, single_results):
    """The unfused sorted-layout sharded engine (fused=False) stays exact
    too — it remains the fallback when the tiled engine is not wanted."""
    p = Params()
    fn = make_point_sharded_frame_fn(p, mesh8, axis="d", fused=False)
    name = "000001"
    cloud = scans[name][::SUB]
    state = init_state(p)
    _, res = fn(state, jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    got = np.asarray(res.ground_mask)[: len(cloud)]
    np.testing.assert_array_equal(got, single_results[name])


def test_point_sharded_large_czm_exact(mesh8, scans):
    """A >511-patch CZM (geom.spad > 512, round-4 cap lift) through the
    8-device point-sharded program: the spad-threaded patch space must
    flow through MeshComm's LPR merge and fixed-order moment reductions —
    labels exactly equal to the single-device engine on the same config."""
    p = Params(num_sectors_each_zone=(16, 32, 64, 64))
    name = "000002"
    cloud = scans[name][::SUB]
    want = np.asarray(
        PatchworkPP(p, capacity=CAPACITY).estimate_ground(cloud).ground_mask
    )
    fn = make_point_sharded_frame_fn(p, mesh8, axis="d")
    _, res = fn(init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    got = np.asarray(res.ground_mask)[: len(cloud)]
    np.testing.assert_array_equal(got, want[: len(cloud)])


def test_point_sharded_1device_mesh_exact(scans, single_results):
    """A 1-device mesh takes the plain-jit bypass (point_sharded
    ._single_device — SPMD-compiled executables cost seconds per dispatch
    on the tunneled pod): same labels as the single-device program, and
    the lowering contains no SPMD channel ops at all."""
    p = Params()
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("d",))
    fn = make_point_sharded_frame_fn(p, mesh1, axis="d")
    name = "000000"
    cloud = scans[name][::SUB]
    state = init_state(p)
    _, res = fn(state, jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    got = np.asarray(res.ground_mask)[: len(cloud)]
    np.testing.assert_array_equal(got, single_results[name])

    txt = jax.jit(fn).lower(
        state, jnp.zeros((CAPACITY, 4), jnp.float32), jnp.int32(len(cloud))
    ).as_text()
    assert "channel_handle" not in txt, "1-device mesh emitted collectives"


def test_point_sharded_size1_axis_on_multidevice_mesh(scans, single_results):
    """A multi-device mesh whose POINT axis has size 1 keeps the shard_map
    program but swaps MeshComm for the identity FrameComm
    (point_sharded._comm_for): labels must stay exact and the point axis
    must emit no collectives."""
    p = Params()
    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("d", "pt"))
    fn = make_point_sharded_frame_fn(p, mesh, axis="pt")
    name = "000000"
    cloud = scans[name][::SUB]
    state = init_state(p)
    _, res = fn(state, jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    got = np.asarray(res.ground_mask)[: len(cloud)]
    np.testing.assert_array_equal(got, single_results[name])


@pytest.mark.slow
def test_point_sharded_full_res_golden(mesh8, scans, golden):
    """Full-resolution golden parity THROUGH the 8-device point-sharded
    program: all 6 scans, fresh AND sequential variants, zero tolerance —
    the same exactness bar as the single-device paths
    (tests/test_pipeline_golden.py::test_full_resolution_golden)."""
    p = Params()
    cap = 131072
    fn = make_point_sharded_frame_fn(p, mesh8, axis="d")
    names = [f"{i:06d}" for i in range(6)]

    for name in names:  # fresh state per scan
        cloud = scans[name]
        _, res = fn(
            init_state(p), jnp.asarray(_pad(cloud, cap)), jnp.int32(len(cloud))
        )
        got = np.flatnonzero(np.asarray(res.ground_mask)[: len(cloud)])
        np.testing.assert_array_equal(
            got, np.sort(golden[f"fresh_{name}"]), err_msg=f"fresh {name}"
        )

    st = init_state(p)  # one adapted chain across all 6
    for name in names:
        cloud = scans[name]
        st, res = fn(st, jnp.asarray(_pad(cloud, cap)), jnp.int32(len(cloud)))
        got = np.flatnonzero(np.asarray(res.ground_mask)[: len(cloud)])
        np.testing.assert_array_equal(
            got, np.sort(golden[f"seq_{name}"]), err_msg=f"seq {name}"
        )


@pytest.mark.slow
def test_2d_mesh_full_res_golden(scans, golden):
    """Full-resolution golden parity through a 2x4 ("frame", "point") mesh:
    frames data-parallel over the first axis, each frame's points sharded
    over the second (the dryrun's 2D program at 131k capacity). Zero
    tolerance vs golden — closes VERDICT r3 weak #3 (the 2D path was only
    synthetic-checked)."""
    from patchworkpp_tpu.parallel.point_sharded import MeshComm
    from patchworkpp_tpu.pipeline import FrameResult, make_frame_fn
    from patchworkpp_tpu.state import AdaptiveState

    p = Params()
    cap = 131072
    devs = jax.devices()[:8]
    mesh2 = Mesh(np.array(devs).reshape(2, 4), ("frame", "point"))
    frame = make_frame_fn(p, comm=MeshComm("point"), fused="tiled")
    vframe = jax.vmap(frame)
    state_spec = jax.tree.map(lambda _: P("frame"), AdaptiveState(*[0] * 7))
    result_spec = FrameResult(
        ground_mask=P("frame", "point"), num_ground=P("frame"),
        patch_mean=P("frame"), patch_normal=P("frame"),
        patch_svals=P("frame"), patch_processed=P("frame"),
    )
    fn2 = jax.jit(
        jax.shard_map(
            vframe, mesh=mesh2,
            in_specs=(state_spec, P("frame", "point"), P("frame")),
            out_specs=(state_spec, result_spec),
            check_vma=False,
        )
    )
    for pair in (("000000", "000001"), ("000002", "000003"),
                 ("000004", "000005")):
        clouds = jnp.asarray(np.stack([_pad(scans[n], cap) for n in pair]))
        npts = jnp.asarray([len(scans[n]) for n in pair], jnp.int32)
        _, res = fn2(batch_init_state(p, 2), clouds, npts)
        masks = np.asarray(res.ground_mask)
        for fi, n in enumerate(pair):
            got = np.flatnonzero(masks[fi][: len(scans[n])])
            np.testing.assert_array_equal(
                got, np.sort(golden[f"fresh_{n}"]), err_msg=f"2D mesh {n}"
            )


@pytest.mark.slow
def test_frame_parallel_full_res_golden(mesh8, scans, golden):
    """Full-resolution golden parity through the frame-parallel path at
    131k capacity (8 streams / 8 devices; was only subsample-checked)."""
    p = Params()
    cap = 131072
    fn = make_batch_frame_fn(p, mesh8, axis="d")
    names = [f"{i:06d}" for i in range(6)] + ["000000", "000001"]
    clouds = jnp.asarray(np.stack([_pad(scans[n], cap) for n in names]))
    npts = jnp.asarray([len(scans[n]) for n in names], jnp.int32)
    _, res = fn(batch_init_state(p, 8), clouds, npts)
    masks = np.asarray(res.ground_mask)
    for i, n in enumerate(names):
        got = np.flatnonzero(masks[i][: len(scans[n])])
        np.testing.assert_array_equal(
            got, np.sort(golden[f"fresh_{n}"]), err_msg=f"frame-parallel {n}"
        )


def test_point_sharded_state_matches_single(mesh8, scans):
    """Adaptive state after a sharded frame ~= single-device state."""
    p = Params()
    fn = make_point_sharded_frame_fn(p, mesh8, axis="d")
    cloud = scans["000001"][::SUB]
    state = init_state(p)
    new_state, _ = fn(state, jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))

    m = PatchworkPP(capacity=CAPACITY)
    m.estimate_ground(cloud)
    np.testing.assert_allclose(
        float(new_state.sensor_height), m.sensor_height, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state.elevation_thr),
        np.asarray(m.state.elevation_thr),
        atol=1e-4,
    )


def test_frame_data_parallel_local_batch(mesh8, scans, single_results):
    """16 streams over 8 devices (local batch 2): the lax.map fallback path."""
    p = Params()
    fn = make_batch_frame_fn(p, mesh8, axis="d")
    names = ["000000", "000001"] * 8
    clouds = np.stack([_pad(scans[n][::SUB]) for n in names])
    npts = np.array([len(scans[n][::SUB]) for n in names], np.int32)
    states = batch_init_state(p, 16)
    _, res = fn(states, jnp.asarray(clouds), jnp.asarray(npts))
    masks = np.asarray(res.ground_mask)
    for i, n in enumerate(names):
        np.testing.assert_array_equal(
            masks[i][: npts[i]], single_results[n], err_msg=f"frame {i}"
        )


def test_point_sharded_sequence_matches_frame_loop(mesh8, scans):
    """The point-sharded scan-dispatched chain (the multi-chip streaming
    driver) must be bitwise-equal to the per-frame point-sharded loop."""
    p = Params()
    names = ["000000", "000001", "000002"]
    clouds = [scans[n][::SUB] for n in names]
    stack = np.stack([_pad(c) for c in clouds])
    npts = np.array([len(c) for c in clouds], np.int32)

    seq = make_point_sharded_sequence_fn(p, mesh8, axis="d")
    st_seq, seq_res = seq(init_state(p), jnp.asarray(stack), jnp.asarray(npts))

    frame = make_point_sharded_frame_fn(p, mesh8, axis="d")
    st = init_state(p)
    for i, c in enumerate(clouds):
        st, res = frame(st, jnp.asarray(stack[i]), jnp.int32(npts[i]))
        for field, a in zip(res._fields, res):
            np.testing.assert_array_equal(
                np.asarray(getattr(seq_res, field)[i]), np.asarray(a),
                err_msg=f"{names[i]}: {field}",
            )
    for a, b in zip(jax.tree.leaves(st_seq), jax.tree.leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
