"""Fused Pallas fit kernel: interpret-mode parity vs oracle + tiled layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchworkpp_tpu import Params, init_state
from patchworkpp_tpu.oracle import NumpyPatchworkpp
from patchworkpp_tpu.ops.tiled import TILE, build_tiled, tiled_capacity
from patchworkpp_tpu.ops.onehot import SPAD
from patchworkpp_tpu.pipeline import make_frame_fn

SUB = 16
CAP = 8192


def test_tiled_layout_invariants(scans):
    cloud = scans["000000"][::SUB]
    n = len(cloud)
    rng = np.random.default_rng(0)
    pid = rng.integers(0, 505, n).astype(np.int32)
    xyz = cloud[:, :3].astype(np.float32)

    tp = jax.jit(build_tiled)(jnp.asarray(xyz), jnp.asarray(pid))
    pid_s = np.asarray(tp.patch_id)
    valid = np.asarray(tp.valid)
    tpa = np.asarray(tp.tile_patch)
    counts = np.asarray(tp.counts)

    pt = tiled_capacity(n)
    assert pid_s.shape[0] == pt
    tiles = pid_s.reshape(-1, TILE)
    assert (tiles == tiles[:, :1]).all(), "mixed-patch tile"
    np.testing.assert_array_equal(tpa, tiles[:, 0])
    ref_counts = np.bincount(pid, minlength=SPAD)
    np.testing.assert_array_equal(counts, ref_counts)
    # per-patch z-sorted and fillers at the tail
    z = np.asarray(tp.xyz)[:, 2]
    for s in np.unique(pid):
        run = np.flatnonzero(pid_s == s)
        k = ref_counts[s]
        assert valid[run[:k]].all() and not valid[run[k:]].any()
        assert (np.diff(z[run[:k]]) >= 0).all()


def test_fused_interpret_matches_oracle(scans):
    cloud = scans["000001"][::SUB]
    padded = np.zeros((CAP, 4), np.float32)
    padded[: len(cloud)] = cloud

    params = Params()
    fn = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    state = init_state(params)
    st, res = fn(state, jnp.asarray(padded), jnp.int32(len(cloud)))
    mask = np.asarray(res.ground_mask)[: len(cloud)]

    oracle = NumpyPatchworkpp()
    ref = oracle.estimate_ground(cloud)
    mism = int((mask != ref).sum())
    assert mism == 0, f"{mism}/{len(cloud)} label mismatches"
    np.testing.assert_allclose(
        float(st.sensor_height), oracle.sensor_height, atol=1e-5
    )


def test_fused_interpret_sequential_state(scans):
    """Two frames with state carry through the fused path."""
    params = Params()
    fn = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    st = init_state(params)
    oracle = NumpyPatchworkpp()
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        padded = np.zeros((CAP, 4), np.float32)
        padded[: len(cloud)] = cloud
        st, res = fn(st, jnp.asarray(padded), jnp.int32(len(cloud)))
        ref = oracle.estimate_ground(cloud)
        mism = int((np.asarray(res.ground_mask)[: len(cloud)] != ref).sum())
        assert mism == 0, f"{name}: {mism} mismatches"


def test_fused_onehot_variant_matches_oracle(scans):
    """The alternative one-hot in-kernel movement path (fused="onehot")."""
    cloud = scans["000003"][::SUB]
    padded = np.zeros((CAP, 4), np.float32)
    padded[: len(cloud)] = cloud
    params = Params()
    fn = jax.jit(make_frame_fn(params, fused="onehot", interpret=True))
    st, res = fn(init_state(params), jnp.asarray(padded), jnp.int32(len(cloud)))
    ref = NumpyPatchworkpp().estimate_ground(cloud)
    mism = int((np.asarray(res.ground_mask)[: len(cloud)] != ref).sum())
    # The one-hot variant's HIGHEST-precision MXU reductions can flip a
    # point sitting exactly on a threshold (observed: 1/7.8k on this scan).
    assert mism <= 2


def test_fused_grid_rvpf_off(scans):
    """Pass program without R-VPF through the grid kernel."""
    cloud = scans["000002"][::SUB]
    padded = np.zeros((CAP, 4), np.float32)
    padded[: len(cloud)] = cloud
    p = Params(enable_RVPF=False)
    fn = jax.jit(make_frame_fn(p, fused="grid", interpret=True))
    st, res = fn(init_state(p), jnp.asarray(padded), jnp.int32(len(cloud)))
    ref = NumpyPatchworkpp(p).estimate_ground(cloud)
    mism = int((np.asarray(res.ground_mask)[: len(cloud)] != ref).sum())
    assert mism == 0


def test_fused_grid_no_intensity(scans):
    """3-column cloud (RNR off) through the grid kernel."""
    cloud = scans["000004"][::SUB, :3]
    padded = np.zeros((CAP, 4), np.float32)
    padded[: len(cloud), :3] = cloud
    p = Params(enable_RNR=False)
    fn = jax.jit(make_frame_fn(p, fused="grid", interpret=True))
    st, res = fn(init_state(p), jnp.asarray(padded), jnp.int32(len(cloud)))
    ref = NumpyPatchworkpp(p).estimate_ground(cloud)
    mism = int((np.asarray(res.ground_mask)[: len(cloud)] != ref).sum())
    assert mism == 0
