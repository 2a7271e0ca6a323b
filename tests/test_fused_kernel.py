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
    """Oracle-exact on subsampled scans whose fits are all full-rank.

    Subsampling can leave a patch iteration with only 2 points: the smallest
    eigenvector of the rank-1 covariance is then UNDERDETERMINED, and the
    reference's JacobiSVD (patchworkpp.cpp:62-66) picks an arbitrary
    null-space vector our deterministic +z convention need not match (scans
    000001/3/4 at SUB=16 each hit one such patch). Exact oracle parity is
    asserted on the scans free of rank-deficient fits; the full-res golden
    suite (test_pipeline_golden.py -m slow), where every fit is determinate,
    is the product parity bar. Engine-internal exactness (fused == unfused,
    degenerate fits included) is covered for all six scans below.
    """
    params = Params()
    fn = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    for name in ("000000", "000002", "000005"):
        cloud = scans[name][::SUB]
        padded = np.zeros((CAP, 4), np.float32)
        padded[: len(cloud)] = cloud
        oracle = NumpyPatchworkpp()
        st, res = fn(init_state(params), jnp.asarray(padded), jnp.int32(len(cloud)))
        mask = np.asarray(res.ground_mask)[: len(cloud)]
        ref = oracle.estimate_ground(cloud)
        mism = int((mask != ref).sum())
        assert mism == 0, f"{name}: {mism}/{len(cloud)} label mismatches"
        np.testing.assert_allclose(
            float(st.sensor_height), oracle.sensor_height, atol=1e-5
        )


def test_fused_matches_unfused_exactly(scans):
    """The two engine paths agree per-point on every scan — including
    rank-deficient fits, which both resolve to +z (ops/eigen3.py and
    ops/pallas/fit_kernel.py share the scale-relative degeneracy test)."""
    params = Params()
    fn_f = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    fn_u = jax.jit(make_frame_fn(params, fused=False))
    for name in sorted(scans):
        cloud = scans[name][::SUB]
        padded = np.zeros((CAP, 4), np.float32)
        padded[: len(cloud)] = cloud
        args = (jnp.asarray(padded), jnp.int32(len(cloud)))
        _, rf = fn_f(init_state(params), *args)
        _, ru = fn_u(init_state(params), *args)
        mism = int(
            (np.asarray(rf.ground_mask) != np.asarray(ru.ground_mask)).sum()
        )
        assert mism == 0, f"{name}: fused vs unfused {mism} mismatches"


def test_fused_grid_iota_prefix_bitwise(scans):
    """prefix_mode='iota' (in-kernel static triangle, re-segmented
    arithmetically) must equal the 'lb' input-matrix mode BITWISE — the
    prior is integer counts, exact in f32 through either dot shape."""
    params = Params()
    fn_lb = jax.jit(make_frame_fn(params, fused="grid", interpret=True))
    fn_io = jax.jit(make_frame_fn(params, fused="grid_iota", interpret=True))
    for name in ("000000", "000004"):
        cloud = scans[name][::SUB]
        padded = np.zeros((CAP, 4), np.float32)
        padded[: len(cloud)] = cloud
        args = (jnp.asarray(padded), jnp.int32(len(cloud)))
        s1, r1 = fn_lb(init_state(params), *args)
        s2, r2 = fn_io(init_state(params), *args)
        for a, b in zip(jax.tree.leaves((s1, r1)), jax.tree.leaves((s2, r2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_interpret_sequential_state(scans):
    """Two frames with state carry through the fused path.

    Frame 000001 at SUB=16 contains a rank-deficient fit (see
    test_fused_interpret_matches_oracle), so the oracle is asserted on frame
    000000 only; across both frames the fused path must track the unfused
    path exactly — state adaptation included.
    """
    params = Params()
    fn_f = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    fn_u = jax.jit(make_frame_fn(params, fused=False))
    st_f, st_u = init_state(params), init_state(params)
    oracle = NumpyPatchworkpp()
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        padded = np.zeros((CAP, 4), np.float32)
        padded[: len(cloud)] = cloud
        args = (jnp.asarray(padded), jnp.int32(len(cloud)))
        st_f, res_f = fn_f(st_f, *args)
        st_u, res_u = fn_u(st_u, *args)
        ref = oracle.estimate_ground(cloud)
        mask_f = np.asarray(res_f.ground_mask)[: len(cloud)]
        if name == "000000":
            assert int((mask_f != ref).sum()) == 0
        mism = int((mask_f != np.asarray(res_u.ground_mask)[: len(cloud)]).sum())
        assert mism == 0, f"{name}: {mism} fused-vs-unfused mismatches"
        np.testing.assert_allclose(
            float(st_f.sensor_height), float(st_u.sensor_height), atol=1e-6
        )


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
    """3-column cloud (RNR off) through the grid kernel. Scan 000005: the
    RNR-off subsample of 000004 hits a rank-deficient fit (oracle parity
    undefined there — see test_fused_interpret_matches_oracle)."""
    cloud = scans["000005"][::SUB, :3]
    padded = np.zeros((CAP, 4), np.float32)
    padded[: len(cloud), :3] = cloud
    p = Params(enable_RNR=False)
    fn = jax.jit(make_frame_fn(p, fused="grid", interpret=True))
    st, res = fn(init_state(p), jnp.asarray(padded), jnp.int32(len(cloud)))
    ref = NumpyPatchworkpp(p).estimate_ground(cloud)
    mism = int((np.asarray(res.ground_mask)[: len(cloud)] != ref).sum())
    assert mism == 0


def test_fused_grid_empty_and_tiny_clouds():
    """Degenerate inputs through the fused kernel: no crash, all nonground,
    and identical to the unfused path (reference: patches below num_min_pts
    are skipped wholesale, patchworkpp.cpp:191-195)."""
    params = Params()
    fn_f = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    fn_u = jax.jit(make_frame_fn(params, fused=False))
    rng = np.random.default_rng(7)
    for n in (0, 1, 5, 37):
        padded = np.zeros((1024, 4), np.float32)
        if n:
            r = rng.uniform(3.0, 40.0, n)
            th = rng.uniform(0, 2 * np.pi, n)
            padded[:n, 0] = r * np.cos(th)
            padded[:n, 1] = r * np.sin(th)
            padded[:n, 2] = rng.normal(-1.7, 0.1, n)
        args = (jnp.asarray(padded), jnp.int32(n))
        _, rf = fn_f(init_state(params), *args)
        _, ru = fn_u(init_state(params), *args)
        mf = np.asarray(rf.ground_mask)
        np.testing.assert_array_equal(mf, np.asarray(ru.ground_mask),
                                      err_msg=f"n={n}")
        assert not mf[n:].any(), f"n={n}: padding rows labeled ground"
        assert int(rf.num_ground) == int(mf.sum())


def test_fused_matches_unfused_random_clouds():
    """Fuzz the fused==unfused label invariant beyond the golden scans:
    synthetic ground planes + walls + noise, several seeds, state carried."""
    params = Params()
    fn_f = jax.jit(make_frame_fn(params, fused=True, interpret=True))
    fn_u = jax.jit(make_frame_fn(params, fused=False))
    cap = 8192
    st_f, st_u = init_state(params), init_state(params)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3000, cap - 100))
        r = rng.uniform(1.0, 90.0, n)  # includes out-of-range > 80 m
        th = rng.uniform(0, 2 * np.pi, n)
        pts = np.zeros((cap, 4), np.float32)
        pts[:n, 0] = r * np.cos(th)
        pts[:n, 1] = r * np.sin(th)
        pts[:n, 2] = rng.normal(-1.7, 0.08, n) + 0.015 * r
        # vertical structures + floating clutter on a random third
        idx = rng.choice(n, n // 3, replace=False)
        pts[idx, 2] = rng.uniform(-2.5, 3.0, len(idx))
        pts[:n, 3] = rng.uniform(0, 1, n)
        args = (jnp.asarray(pts), jnp.int32(n))
        st_f, rf = fn_f(st_f, *args)
        st_u, ru = fn_u(st_u, *args)
        mism = int(
            (np.asarray(rf.ground_mask) != np.asarray(ru.ground_mask)).sum()
        )
        assert mism == 0, f"seed {seed}: fused vs unfused {mism} mismatches"
