"""Single-device CHUNKED engine (parallel/chunked.py) parity tests.

The chunked frame runs the point-sharded per-shard program over a vmapped
leading chunk axis on one device (dense-scan single-chip scaling: each
chunk's rows stay inside the global sort's flat region — ROOFLINE.md "Dense
scans"). Its contract is the sharded path's zero-tolerance one: labels must
EXACTLY match the single-device program, the 8-device mesh program, and the
oracle (same fixed-order MeshComm reductions). The one-hot movement dots —
onehot.mxu_dot / mxu_dot_c0 / f32_dot_c0 (patch_reduce) and the factored
count histogram — carry custom_vmap rules pinning their batch lowering to
the mesh path's per-device 2D dots; everything else under the vmap is
elementwise/per-chunk, so the equality is enforced for both the tiled and
the unfused per-shard engines below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from patchworkpp_tpu import Params, init_state
from patchworkpp_tpu.parallel import (
    make_chunked_frame_fn,
    make_chunked_sequence_fn,
    make_point_sharded_frame_fn,
)
from patchworkpp_tpu.pipeline import make_frame_fn, make_sequence_fn

SUB = 16
CAPACITY = 8192


def _pad(cloud, cap=CAPACITY):
    out = np.zeros((cap, 4), np.float32)
    out[: len(cloud)] = cloud
    return out


@pytest.fixture(scope="module")
def single_masks(scans):
    p = Params()
    fn = jax.jit(make_frame_fn(p))
    out = {}
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        _, res = fn(
            init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud))
        )
        out[name] = np.asarray(res.ground_mask)[: len(cloud)]
    return out


@pytest.mark.parametrize("num_chunks", [2, 4, 8])
def test_chunked_frame_exact_vs_single(scans, single_masks, num_chunks):
    """Chunked labels == single-device labels, zero tolerance, both scans."""
    p = Params()
    fn = make_chunked_frame_fn(p, num_chunks)
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        st, res = fn(
            init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud))
        )
        got = np.asarray(res.ground_mask)[: len(cloud)]
        np.testing.assert_array_equal(got, single_masks[name], err_msg=name)
        assert abs(float(st.sensor_height) - 1.723) < 0.2


def test_chunked_matches_mesh_sharded_bitwise(scans):
    """Chunked(K=8) must reproduce the 8-device point-sharded mesh program
    EXACTLY — labels AND per-patch fit outputs — since both run the same
    MeshComm math; the chunk axis is the mesh axis realized as a batch dim."""
    p = Params()
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("d",))
    fmesh = make_point_sharded_frame_fn(p, mesh, axis="d")
    fchunk = make_chunked_frame_fn(p, 8)
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        args = (init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
        stm, rm = fmesh(*args)
        stc, rc = fchunk(*args)
        np.testing.assert_array_equal(
            np.asarray(rm.ground_mask), np.asarray(rc.ground_mask), err_msg=name
        )
        np.testing.assert_array_equal(
            np.asarray(rm.patch_normal), np.asarray(rc.patch_normal)
        )
        np.testing.assert_array_equal(
            np.asarray(rm.patch_mean), np.asarray(rc.patch_mean)
        )
        assert float(stm.sensor_height) == float(stc.sensor_height)


def test_sharded_chunked_composition(scans):
    """Shard x chunk composition (2 mesh devices x 4 chunks each) must be
    BITWISE the 8-device point-sharded mesh program AND the single-device
    8-chunk program: all three run MeshComm reductions over the same 8
    contiguous row blocks in the same linear order (shard-major,
    chunk-minor), so labels AND per-patch fit outputs agree exactly."""
    from patchworkpp_tpu.parallel import make_sharded_chunked_frame_fn

    p = Params()
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    cloud = scans["000000"][::SUB]
    args = (init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))

    mesh2 = Mesh(np.array(devs[:2]), ("point",))
    fcomp = make_sharded_chunked_frame_fn(p, mesh2, 4)
    stc, rc = fcomp(*args)

    mesh8 = Mesh(np.array(devs[:8]), ("d",))
    fmesh = make_point_sharded_frame_fn(p, mesh8, axis="d")
    stm, rm = fmesh(*args)

    fchunk = make_chunked_frame_fn(p, 8)
    stk, rk = fchunk(*args)

    for other, tag in ((rm, "mesh8"), (rk, "chunk8")):
        np.testing.assert_array_equal(
            np.asarray(rc.ground_mask), np.asarray(other.ground_mask),
            err_msg=tag,
        )
        np.testing.assert_array_equal(
            np.asarray(rc.patch_normal), np.asarray(other.patch_normal),
            err_msg=tag,
        )
        np.testing.assert_array_equal(
            np.asarray(rc.patch_mean), np.asarray(other.patch_mean),
            err_msg=tag,
        )
    assert (
        float(stc.sensor_height)
        == float(stm.sensor_height)
        == float(stk.sensor_height)
    )


def test_chunked_sequence_matches_frame_loop(scans):
    """One scanned dispatch == the per-frame loop, bitwise (state chain and
    every per-frame output), and labels == the single-device sequence."""
    p = Params()
    names = ["000000", "000001", "000002"]
    clouds = [scans[n][::SUB] for n in names]
    stack = np.stack([_pad(c) for c in clouds])
    npts = np.array([len(c) for c in clouds], np.int32)

    seq = make_chunked_sequence_fn(p, 4)
    st_seq, res = seq(init_state(p), jnp.asarray(stack), jnp.asarray(npts))

    frame = make_chunked_frame_fn(p, 4)
    st = init_state(p)
    for i in range(3):
        st, r = frame(st, jnp.asarray(stack[i]), jnp.int32(int(npts[i])))
        np.testing.assert_array_equal(
            np.asarray(res.ground_mask[i]), np.asarray(r.ground_mask)
        )
    assert float(st_seq.sensor_height) == float(st.sensor_height)

    single = jax.jit(make_sequence_fn(p))
    _, res_s = single(init_state(p), jnp.asarray(stack), jnp.asarray(npts))
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(res.ground_mask[i])[: npts[i]],
            np.asarray(res_s.ground_mask[i])[: npts[i]],
        )


def test_chunked_oracle_parity(scans):
    """Chunked labels == the f64 NumPy oracle on a determinate scan."""
    from patchworkpp_tpu.oracle import NumpyPatchworkpp

    p = Params()
    cloud = scans["000000"][::SUB]
    want = NumpyPatchworkpp(p).estimate_ground(cloud)
    fn = make_chunked_frame_fn(p, 4)
    _, res = fn(init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    got = np.asarray(res.ground_mask)[: len(cloud)].astype(bool)
    np.testing.assert_array_equal(got, want)


def test_facade_chunks_exact(scans, single_masks):
    """models.PatchworkPP(chunks=K) — the user-facing dense-scan switch —
    returns exactly the plain facade's labels, for single frames and for
    the one-dispatch sequence path; a fixed capacity that K does not divide
    raises instead of silently repadding."""
    from patchworkpp_tpu.models import PatchworkPP

    cloud = scans["000000"][::SUB]
    m = PatchworkPP(chunks=4)
    res = m.estimate_ground(cloud)
    np.testing.assert_array_equal(res.ground_mask, single_masks["000000"])

    m.reset()
    seq = m.estimate_ground_sequence([cloud, scans["000001"][::SUB]])
    np.testing.assert_array_equal(seq[0].ground_mask, single_masks["000000"])

    with pytest.raises(ValueError, match="not divisible"):
        PatchworkPP(capacity=1000, chunks=3).estimate_ground(cloud[:100])


def test_chunked_unfused_exact_vs_single_and_mesh(scans):
    """Chunked + UNFUSED engine: labels == single-device unfused (zero
    tolerance, the empirical sharding invariant), and labels AND per-patch
    fit outputs BITWISE == the 8-device mesh unfused program — the unfused
    per-shard path reduces f32 per-point moments through onehot.patch_reduce,
    whose custom_vmap rule must unroll to the mesh path's per-device dots
    (ADVICE r4: this combination used to fall to vmap's default batched
    dot_general with no test). Fit outputs vs the SINGLE-device program
    differ by design (per-chunk partials + fixed-order sum is a different
    f32 association than one global reduction; labels still match)."""
    p = Params()
    cloud = scans["000000"][::SUB]
    args = (init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    _, want = jax.jit(make_frame_fn(p, fused=False))(*args)
    fn = make_chunked_frame_fn(p, 8, fused=False)
    _, res = fn(*args)
    np.testing.assert_array_equal(
        np.asarray(res.ground_mask)[: len(cloud)],
        np.asarray(want.ground_mask)[: len(cloud)],
    )

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("d",))
    fmesh = make_point_sharded_frame_fn(p, mesh, axis="d", fused=False)
    _, rm = fmesh(*args)
    np.testing.assert_array_equal(
        np.asarray(rm.ground_mask), np.asarray(res.ground_mask)
    )
    np.testing.assert_array_equal(
        np.asarray(rm.patch_normal), np.asarray(res.patch_normal)
    )
    np.testing.assert_array_equal(
        np.asarray(rm.patch_mean), np.asarray(res.patch_mean)
    )


def test_facade_auto_capacity_nondividing_chunks(scans, single_masks):
    """chunks=3 with auto capacity: capacity rounds to lcm(8192, 3) so each
    chunk is whole 8192-point quanta (ADVICE r4: an off-quantum bump used to
    trace with extra filler-tile padding), and labels stay exact."""
    from patchworkpp_tpu.models import PatchworkPP

    cloud = scans["000000"][::SUB]
    m = PatchworkPP(chunks=3)
    cap = m._capacity(len(cloud))
    assert cap % 3 == 0 and cap % 8192 == 0
    res = m.estimate_ground(cloud)
    np.testing.assert_array_equal(res.ground_mask, single_masks["000000"])


def test_chunked_rejects_indivisible_capacity():
    p = Params()
    fn = make_chunked_frame_fn(p, 3)
    with pytest.raises(ValueError, match="not divisible"):
        fn(init_state(p), jnp.zeros((8192, 4), jnp.float32), jnp.int32(0))


def test_chunked_one_chunk_is_plain_frame(scans, single_masks):
    """num_chunks=1 returns the plain single-device program (no vmap)."""
    p = Params()
    fn = make_chunked_frame_fn(p, 1)
    cloud = scans["000000"][::SUB]
    _, res = fn(init_state(p), jnp.asarray(_pad(cloud)), jnp.int32(len(cloud)))
    np.testing.assert_array_equal(
        np.asarray(res.ground_mask)[: len(cloud)], single_masks["000000"]
    )


@pytest.mark.slow
def test_chunked_full_res_golden(scans, golden):
    """Full-resolution 12/12 golden gate through the chunked engine (K=4):
    fresh and sequential label parity on all six scans, zero mismatches —
    the same gate the tiled/unfused/mesh paths carry."""
    p = Params()
    cap = 131072
    names = [f"{i:06d}" for i in range(6)]
    frame = make_chunked_frame_fn(p, 4)

    for name in names:
        cloud = scans[name]
        _, res = frame(
            init_state(p),
            jnp.asarray(_pad(cloud, cap)),
            jnp.int32(len(cloud)),
        )
        got = np.flatnonzero(np.asarray(res.ground_mask)[: len(cloud)])
        np.testing.assert_array_equal(
            got, np.sort(golden[f"fresh_{name}"]), err_msg=f"fresh {name}"
        )

    st = init_state(p)
    for name in names:
        cloud = scans[name]
        st, res = frame(
            st, jnp.asarray(_pad(cloud, cap)), jnp.int32(len(cloud))
        )
        got = np.flatnonzero(np.asarray(res.ground_mask)[: len(cloud)])
        np.testing.assert_array_equal(
            got, np.sort(golden[f"seq_{name}"]), err_msg=f"seq {name}"
        )
