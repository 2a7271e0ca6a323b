"""JAX pipeline parity: exact agreement with the golden-exact oracle.

Fast tests run on subsampled scans (smaller static capacity keeps CPU compile
time reasonable); the full-resolution golden test is marked slow and is run
explicitly. Full-size parity against the C++ golden sets was verified to be
exact (0 mismatches, fresh and sequential) — see git history / BENCH notes.
"""

import numpy as np
import pytest

from patchworkpp_tpu import Params, init_state
from patchworkpp_tpu.models import PatchworkPP
from patchworkpp_tpu.oracle import NumpyPatchworkpp
from tests.conftest import SCAN_NAMES

SUB = 8          # take every 8th point -> ~15.6k points
CAPACITY = 16384


@pytest.fixture(scope="module")
def model():
    return PatchworkPP(capacity=CAPACITY)


def test_fresh_matches_oracle(model, scans):
    cloud = scans["000000"][::SUB]
    res = model.estimate_ground(cloud)
    model.reset()
    oracle = NumpyPatchworkpp()
    ref = oracle.estimate_ground(cloud)
    np.testing.assert_array_equal(res.ground_mask, ref)


def test_sequential_matches_oracle(model, scans):
    model.reset()
    oracle = NumpyPatchworkpp()
    for name in SCAN_NAMES[:3]:
        cloud = scans[name][::SUB]
        res = model.estimate_ground(cloud)
        ref = oracle.estimate_ground(cloud)
        mism = int((res.ground_mask != ref).sum())
        assert mism == 0, f"scan {name}: {mism} mismatched labels"
        assert abs(model.sensor_height - oracle.sensor_height) < 1e-5
    model.reset()


def test_no_intensity_matches_oracle(model, scans):
    """3-column cloud: RNR disabled on both sides (reference :379-382)."""
    cloud = scans["000001"][::SUB, :3]
    res = model.estimate_ground(cloud)
    model.reset()
    ref = NumpyPatchworkpp().estimate_ground(cloud)
    np.testing.assert_array_equal(res.ground_mask, ref)


def test_rvpf_tgr_disabled_matches_oracle(scans):
    p = Params(enable_RVPF=False, enable_TGR=False)
    cloud = scans["000000"][::SUB]
    res = PatchworkPP(p, capacity=CAPACITY).estimate_ground(cloud)
    ref = NumpyPatchworkpp(p).estimate_ground(cloud)
    np.testing.assert_array_equal(res.ground_mask, ref)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(enable_RNR=False),
        dict(enable_RVPF=False),
        dict(enable_TGR=False),
        dict(enable_RNR=False, enable_RVPF=False, enable_TGR=False),
        dict(num_iter=2),
        dict(num_iter=5),
        dict(num_lpr=5),
        dict(num_min_pts=40),
        dict(th_seeds=0.3, th_dist=0.2),
        dict(th_seeds_v=0.4, th_dist_v=0.2),
        dict(uprightness_thr=0.4),
        dict(sensor_height=1.2, max_range=60.0, min_range=3.5),
        dict(adaptive_seed_selection_margin=-2.0),
        dict(num_rings_of_interest=2),
        dict(RNR_ver_angle_thr=-10.0, RNR_intensity_thr=0.5),
    ],
    ids=lambda kw: ",".join(f"{k}={v}" for k, v in kw.items()),
)
def test_param_matrix_oracle_and_engine_parity(scans, kwargs):
    """Config-matrix sweep (quirk-path coverage). Two invariants:

    1. tiled == unfused EXACT, unconditionally — the engines resolve even
       rank-deficient fits identically (deterministic +z), so this holds
       for every config (fresh AND a 2-frame adapted chain).
    2. engine == oracle EXACT whenever the run is DETERMINATE, i.e.
       (a) no plane fit saw exactly 2 points (rank-1 covariance,
       solver-arbitrary null vector — the documented subsampled-cloud
       caveat, tests/test_fused_kernel.py), AND (b) the engine's f32
       binning agrees point-for-point with the oracle's f64 binning (a
       ring-edge-straddling point can bin differently — the documented
       deviation in ops/binning.py, observed on scan 000003 @ SUB=8 where
       XLA's jitted f32 sqrt is 1 ulp off). Indeterminate configs skip
       invariant 2 only, with the cause reported — never silently.
       Scan 000002 is used because 000003 @ SUB=8 carries a permanent
       ring-edge straggler (the ops/binning.py documented case) that would
       make the oracle half vacuous for every config."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.pipeline import make_frame_fn

    p = Params(**kwargs)
    cloud = scans["000002"][::SUB]
    pts = np.zeros((CAPACITY, 4), np.float32)
    pts[: len(cloud)] = cloud
    args = (jnp.asarray(pts), jnp.int32(len(cloud)))

    orc = NumpyPatchworkpp(p)
    want0 = orc.estimate_ground(cloud)
    oracle_pid0 = orc.last_patch_id
    want1 = orc.estimate_ground(cloud)  # adapted second pass
    oracle_pid1 = orc.last_patch_id

    masks = {}
    st1 = {}  # per-engine adapted state: the engines are label-equal but
    # their per-tile moment partials differ by ulps, so the adapted
    # sensor_height (and hence frame-2 binning) can differ per engine.
    for fused in ("tiled", False):
        fn = jax.jit(make_frame_fn(p, fused=fused))
        st, r0 = fn(init_state(p), *args)
        st1[fused] = st
        _, r1 = fn(st, *args)
        masks[fused] = (
            np.asarray(r0.ground_mask)[: len(cloud)],
            np.asarray(r1.ground_mask)[: len(cloud)],
        )

    # Engine's f32 binning decisions (jitted — the compiled rounding is what
    # the engines actually see): frame 1 with the fresh state, frame 2 with
    # the adapted sensor height (RNR's threshold moves with it).
    from patchworkpp_tpu.ops.binning import bin_points
    from patchworkpp_tpu.params import CZMGeometry

    geom = CZMGeometry.create(p)
    bfn = jax.jit(
        lambda a, sh: bin_points(a, jnp.int32(len(cloud)), sh, p, geom)
    )
    pid_diffs = 0
    for sh, want_pid in (
        (init_state(p).sensor_height, oracle_pid0),
        # frame 2 must be determinate under BOTH engines' adapted heights
        # (invariant 2 compares the tiled labels; the unfused height can
        # sit an ulp away and straddle a different point)
        (st1["tiled"].sensor_height, oracle_pid1),
        (st1[False].sensor_height, oracle_pid1),
    ):
        epid = np.asarray(bfn(jnp.asarray(pts), sh).patch_id)[: len(cloud)]
        epid = np.where(epid == geom.num_patches, -1, epid)
        pid_diffs += int((epid != want_pid).sum())
    binning_agrees = pid_diffs == 0
    determinate = orc.two_point_fits == 0 and binning_agrees

    # Invariant 1: engines agree bit-for-bit, every config.
    np.testing.assert_array_equal(
        masks["tiled"][0], masks[False][0], err_msg="tiled != unfused fresh"
    )
    np.testing.assert_array_equal(
        masks["tiled"][1], masks[False][1], err_msg="tiled != unfused adapted"
    )

    # Invariant 2: oracle parity on determinate runs.
    if determinate:
        np.testing.assert_array_equal(masks["tiled"][0], want0, "vs oracle fresh")
        np.testing.assert_array_equal(masks["tiled"][1], want1, "vs oracle adapted")
    else:
        cause = (
            f"{pid_diffs} boundary-straddling point-frame(s) binned "
            "differently in f32 vs f64"
            if not binning_agrees
            else (
                f"{orc.two_point_fits} two-point fit(s) "
                "(rank-1, solver-arbitrary)"
            )
        )
        pytest.skip(
            f"oracle parity undefined for this run ({cause}); "
            "engine==engine invariant still asserted above"
        )


def test_state_checkpoint_resume(model, scans, tmp_path):
    """Segment 2 frames, checkpoint, resume elsewhere: labels must agree."""
    model.reset()
    a = scans["000000"][::SUB]
    b = scans["000001"][::SUB]
    c = scans["000002"][::SUB]
    model.estimate_ground(a)
    model.estimate_ground(b)
    path = str(tmp_path / "state.npz")
    model.save_state(path)
    r1 = model.estimate_ground(c)

    fresh = PatchworkPP(capacity=CAPACITY)
    fresh.load_state(path)
    r2 = fresh.estimate_ground(c)
    np.testing.assert_array_equal(r1.ground_mask, r2.ground_mask)
    model.reset()


def test_point_conservation(model, scans):
    res = model.estimate_ground(scans["000003"][::SUB])
    model.reset()
    n = len(res.ground_mask)
    assert res.ground_indices.size + res.nonground_indices.size == n


def test_custom_czm_geometries(scans):
    """Non-default CZM configs (the reference hardcodes its 4-zone layout;
    ours is generic): exact oracle parity AND fused == unfused, including a
    zone whose sector count overflows the factored (ring, sector) histogram
    grid (falls back to the generic one-hot counts path in build_tiled).
    Also: >511-patch configs (which the reference's vector-built CZM accepts,
    patchworkpp.h:104-134) scale the patch space (geom.spad) instead of
    raising; only the 512-native Pallas kernels refuse them."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.ops.binning import supports_factored_counts
    from patchworkpp_tpu.params import CZMGeometry
    from patchworkpp_tpu.pipeline import make_frame_fn

    scan = scans["000002"][::8]
    configs = [
        dict(num_rings_each_zone=(2, 2, 2, 2),
             num_sectors_each_zone=(16, 32, 70, 32)),   # factored overflow
        dict(num_rings_each_zone=(2, 3, 5, 4),
             num_sectors_each_zone=(8, 16, 32, 16)),
    ]
    expected_factored = [False, True]
    for kwargs, exp in zip(configs, expected_factored):
        p = Params(**kwargs)
        assert supports_factored_counts(CZMGeometry.create(p)) is exp
        pts = np.zeros((16384, 4), np.float32)
        pts[: len(scan)] = scan
        args = (jnp.asarray(pts), jnp.int32(len(scan)))
        _, ru = jax.jit(make_frame_fn(p, fused=False))(init_state(p), *args)
        _, rf = jax.jit(make_frame_fn(p, fused="grid", interpret=True))(
            init_state(p), *args
        )
        np.testing.assert_array_equal(
            np.asarray(rf.ground_mask), np.asarray(ru.ground_mask)
        )
        ref = NumpyPatchworkpp(p).estimate_ground(scan)
        np.testing.assert_array_equal(
            np.asarray(ru.ground_mask)[: len(scan)], ref
        )

    # Large CZM (VERDICT r3 missing #2): {16,32,64,64} sectors with default
    # rings = 672 patches — runs in the reference; it must run here too,
    # spad-scaled past the old 511 cap, with exact oracle parity through
    # BOTH product engines (tiled + unfused).
    big = Params(num_sectors_each_zone=(16, 32, 64, 64))
    geom_big = CZMGeometry.create(big)
    assert geom_big.num_patches == 672 and geom_big.spad == 768
    pts = np.zeros((16384, 4), np.float32)
    pts[: len(scan)] = scan
    args = (jnp.asarray(pts), jnp.int32(len(scan)))
    ref = NumpyPatchworkpp(big).estimate_ground(scan)
    for fused in ("tiled", False):
        _, r = jax.jit(make_frame_fn(big, fused=fused))(init_state(big), *args)
        np.testing.assert_array_equal(
            np.asarray(r.ground_mask)[: len(scan)], ref
        )

    # The Pallas grid kernel stays 512-native: loud error, not silent wrap.
    with pytest.raises(ValueError, match="Pallas"):
        make_frame_fn(big, fused="grid")


def test_degenerate_single_seed_fit_is_contained():
    """A patch whose seed set is ONE point divides by n-1 == 0: NaN cov, NaN
    plane. The reference hits the same 0/0 and its NaN merely fails that
    patch's comparisons; here a NaN plane row would poison EVERY point's
    label through the one-hot lookup (0 * NaN = NaN), so the carry stores
    the [0,0,0,1e30] sentinel instead — decision-identical per consumer
    (pipeline._fit_planes). The degenerate patch must go nonground, the
    clean patch must stay exactly oracle-ground, in both engine paths."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.pipeline import make_frame_fn

    rng = np.random.default_rng(9)
    # Patch A (degenerate): 10 points at r~10, one low outlier -> 1 seed.
    n_a = 10
    th_a = 0.3 + np.arange(n_a) * 1e-3
    pa = np.stack(
        [10.0 * np.cos(th_a), 10.0 * np.sin(th_a),
         np.r_[-1.6, np.full(n_a - 1, 3.0)], np.full(n_a, 0.5)], axis=1
    ).astype(np.float32)
    # Patch A0: same construction in ZONE 0 (r~5): the sentinel's nz=0
    # keeps R-VPF's vert test true where the reference's NaN fails it —
    # the refit must be a no-op so labels still agree (pipeline R-VPF block,
    # kernel snapshot vert).
    th_a0 = 0.3 + np.arange(n_a) * 1e-3
    pa0 = np.stack(
        [5.0 * np.cos(th_a0), 5.0 * np.sin(th_a0),
         np.r_[-1.6, np.full(n_a - 1, 3.0)], np.full(n_a, 0.5)], axis=1
    ).astype(np.float32)
    # Patch B (clean ground plane): 60 points at r~15.
    n_b = 60
    th_b = 1.2 + rng.uniform(0, 0.05, n_b)
    rr = 15.0 + rng.uniform(0, 0.5, n_b)
    pb = np.stack(
        [rr * np.cos(th_b), rr * np.sin(th_b),
         rng.normal(-1.73, 0.01, n_b), np.full(n_b, 0.5)], axis=1
    ).astype(np.float32)
    n_a = 2 * n_a  # A + A0 rows lead the cloud
    cloud = np.concatenate([pa, pa0, pb]).astype(np.float32)

    ref = NumpyPatchworkpp().estimate_ground(cloud)
    assert ref[n_a:].sum() > n_b // 2  # the clean patch IS mostly ground

    pts = np.zeros((8192, 4), np.float32)
    pts[: len(cloud)] = cloud
    args = (jnp.asarray(pts), jnp.int32(len(cloud)))
    for fused in (False, "tiled", "grid"):
        fn = jax.jit(
            make_frame_fn(Params(), fused=fused, interpret=fused == "grid")
        )
        st, res = fn(init_state(Params()), *args)
        got = np.asarray(res.ground_mask)[: len(cloud)]
        np.testing.assert_array_equal(got, ref, err_msg=f"fused={fused}")
        assert not got[:n_a].any()
        for leaf in jax.tree.leaves(st):
            assert np.isfinite(np.asarray(leaf)).all()


def test_nonfinite_points_are_contained():
    """A NaN/Inf coordinate must label its own row nonground and leave every
    other label AND the adaptive state untouched. (Deliberate deviation from
    the reference, which lets one NaN poison its patch and then its
    threshold buffers; here an unsanitized NaN row would poison ALL patches
    through the one-hot MXU contractions — pipeline._sanitize_nonfinite.)"""
    rng = np.random.default_rng(0)
    cloud = rng.normal(0, 20, (4096, 4)).astype(np.float32)
    cloud[:, 2] = rng.normal(-1.7, 0.3, 4096).astype(np.float32)
    cloud[:, 3] = rng.random(4096).astype(np.float32)
    bad = np.array(
        [
            [np.nan, 3.0, -1.7, 0.5],
            [np.inf, 1.0, -1.7, 0.5],
            [2.0, -np.inf, -1.7, 0.5],
            [5.0, 5.0, np.nan, 0.5],
            [5.0, 5.0, np.inf, 0.5],
            [1e30, 5.0, -1.7, 0.5],   # finite, but its f32 square is Inf
            [5.0, 5.0, -1e25, 0.5],
        ],
        np.float32,
    )
    m_clean = PatchworkPP(capacity=8192)
    r_clean = m_clean.estimate_ground(cloud)
    m_bad = PatchworkPP(capacity=8192)
    r_bad = m_bad.estimate_ground(np.concatenate([cloud, bad]))
    assert not r_bad.ground_mask[4096:].any()
    np.testing.assert_array_equal(r_bad.ground_mask[:4096], r_clean.ground_mask)
    np.testing.assert_array_equal(
        np.asarray(m_bad.state.elevation_thr), np.asarray(m_clean.state.elevation_thr)
    )
    assert m_bad.sensor_height == m_clean.sensor_height


@pytest.mark.slow
def test_full_resolution_golden(scans, golden):
    """Full 124k-point exact parity vs the compiled C++ reference (slow)."""
    m = PatchworkPP(capacity=131072)
    for name in SCAN_NAMES:
        res = m.estimate_ground(scans[name])
        ref = np.sort(golden[f"seq_{name}"])
        np.testing.assert_array_equal(res.ground_indices, ref, err_msg=name)


def test_sequence_fn_matches_frame_loop(scans):
    """make_sequence_fn (one scan-dispatched chain — the bench driver) must
    be bitwise-equal to the per-frame loop: same masks, same final state."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.pipeline import make_frame_fn, make_sequence_fn

    p = Params()
    names = SCAN_NAMES[:3]
    stack = np.zeros((len(names), CAPACITY, 4), np.float32)
    npts = np.zeros((len(names),), np.int32)
    for i, name in enumerate(names):
        cloud = scans[name][::SUB]
        stack[i, : len(cloud)] = cloud
        npts[i] = len(cloud)

    seq = jax.jit(make_sequence_fn(p))
    st_seq, seq_res = seq(init_state(p), jnp.asarray(stack), jnp.asarray(npts))

    frame = jax.jit(make_frame_fn(p))
    st = init_state(p)
    for i in range(len(names)):
        st, res = frame(st, jnp.asarray(stack[i]), jnp.int32(npts[i]))
        # Full per-frame FrameResult parity, not just masks: the sequence
        # path must not drop centers/normals (compat getCenters/getNormals
        # go through these — reference patchworkpp.h:154-163).
        for field, a in zip(res._fields, res):
            np.testing.assert_array_equal(
                np.asarray(getattr(seq_res, field)[i]), np.asarray(a),
                err_msg=f"{names[i]}: {field}",
            )
    for a, b in zip(jax.tree.leaves(st_seq), jax.tree.leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_sequence_api_matches_loop(scans):
    """PatchworkPP.estimate_ground_sequence == the per-frame loop."""
    m_seq = PatchworkPP(capacity=CAPACITY)
    m_loop = PatchworkPP(capacity=CAPACITY)
    clouds = [scans[name][::SUB] for name in SCAN_NAMES[:3]]
    results = m_seq.estimate_ground_sequence(clouds)
    assert len(results) == 3
    for cloud, rs in zip(clouds, results):
        rl = m_loop.estimate_ground(cloud)
        np.testing.assert_array_equal(rs.ground_mask, rl.ground_mask)
        # Batched dispatch must not degrade the result: centers/normals
        # identical to the live path (reference getters patchworkpp.h:154-163).
        np.testing.assert_array_equal(rs.centers, rl.centers)
        np.testing.assert_array_equal(rs.normals, rl.normals)
    assert m_seq.sensor_height == m_loop.sensor_height


def test_model_sequence_api_mixed_intensity(scans):
    """A batch mixing 4- and 3-column scans must gate RNR per cloud exactly
    like the per-frame path (dispatched as uniform-width runs)."""
    m_seq = PatchworkPP(capacity=CAPACITY)
    m_loop = PatchworkPP(capacity=CAPACITY)
    clouds = [
        scans["000000"][::SUB],          # 4-col: RNR on
        scans["000001"][::SUB, :3],      # 3-col: RNR off for this frame
        scans["000002"][::SUB],          # 4-col: RNR on again
    ]
    results = m_seq.estimate_ground_sequence(clouds)
    for cloud, rs in zip(clouds, results):
        rl = m_loop.estimate_ground(cloud)
        np.testing.assert_array_equal(rs.ground_mask, rl.ground_mask)
    assert m_seq.sensor_height == m_loop.sensor_height


def test_long_horizon_trim_parity(scans):
    """Bounded, non-accumulating drift PAST the FIFO trim of the ring buffers.

    The reference computes mean/stdev of each ring buffer BEFORE trimming it
    to max_*_storage (patchworkpp.cpp:354-355, :372-373); round 1 computed it
    on the post-trim buffer with the pre-trim count, so after the first trim
    the window contained wrapped stale values and every later frame diverged
    (advisor round-1 high finding; with this config that bug produces 5361
    mismatched labels and a 0.68 m sensor-height error over these 18 frames).

    Exact parity over unbounded horizons is not attainable in f32 — the
    oracle/C++ compare elevation/flatness in double, so a patch statistic
    within ~1e-8 of a threshold can flip (observed: one 9-point patch on
    subsampled scan 3, pre-trim, every epoch). The bar here is therefore:
    buffer bookkeeping exact, sensor height to 1e-5, thresholds to 1e-4,
    total label drift bounded and non-accumulating (<0.05% of labels).
    """
    p = Params(max_elevation_storage=25, max_flatness_storage=25)
    model = PatchworkPP(p, capacity=CAPACITY)
    oracle = NumpyPatchworkpp(p)
    total_mism = 0
    total_pts = 0
    for epoch in range(3):
        for name in SCAN_NAMES:
            cloud = scans[name][::SUB]
            res = model.estimate_ground(cloud)
            ref = oracle.estimate_ground(cloud)
            total_mism += int((res.ground_mask != ref).sum())
            total_pts += len(ref)
            assert abs(model.sensor_height - oracle.sensor_height) < 1e-5, (
                f"epoch {epoch} scan {name}: sensor_height diverged"
            )
            # FIFO bookkeeping must track the oracle exactly.
            np.testing.assert_array_equal(
                np.asarray(model.state.elev_cnt),
                np.asarray([len(b) for b in oracle.update_elevation], np.int32),
            )
            np.testing.assert_array_equal(
                np.asarray(model.state.flat_cnt),
                np.asarray([len(b) for b in oracle.update_flatness], np.int32),
            )
    # The trim must actually have happened for this test to mean anything.
    assert int(np.max(np.asarray(model.state.elev_cnt))) == 25
    assert total_mism <= 5e-4 * total_pts, (
        f"{total_mism}/{total_pts} mismatches — drift is accumulating"
    )
    np.testing.assert_allclose(
        np.asarray(model.state.elevation_thr),
        np.asarray(oracle.elevation_thr, np.float32),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(model.state.flatness_thr),
        np.asarray(oracle.flatness_thr, np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_blocked_label_tail_uneven_blocks(scans, monkeypatch):
    """Fast multi-block coverage of the row-blocked label replay: shrink
    the block size so an 8192-capacity cloud splits into 3 blocks with an
    UNEVEN last block (3000+3000+2192 — the on-chip dense capacities all
    divide 131072 evenly, so the remainder path had no coverage), for
    both engines, asserting bitwise equality with the single-block
    program and the golden oracle."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu import pipeline as plmod

    p = Params()
    cloud = scans["000000"][::16]
    cap = 8192
    pads = np.zeros((cap, 4), np.float32)
    pads[: len(cloud)] = cloud
    args = (jnp.asarray(pads), jnp.int32(len(cloud)))

    want = {}
    for fused in ("tiled", False):
        fn = jax.jit(plmod.make_frame_fn(p, fused=fused))
        _, r = fn(init_state(p), *args)
        want[fused] = np.asarray(r.ground_mask)[: len(cloud)]

    monkeypatch.setattr(plmod, "_REPLAY_BLOCK", 3000)
    for fused in ("tiled", False):
        fn = jax.jit(plmod.make_frame_fn(p, fused=fused))
        _, r = fn(init_state(p), *args)
        got = np.asarray(r.ground_mask)[: len(cloud)]
        np.testing.assert_array_equal(got, want[fused], err_msg=str(fused))


@pytest.mark.slow
def test_blocked_label_tail_capacity_invariance(scans):
    """The row-blocked label replay (pipeline._finalize `_replay`; r5
    dense-scan fix) must be BITWISE capacity-invariant: the same full-res
    scan padded to 262144 rows (two replay blocks) and to 131072 (single
    block — the unchanged r4 program) yields identical labels and the
    golden-exact ground count."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.pipeline import make_frame_fn

    p = Params()
    fn = jax.jit(make_frame_fn(p))
    scan = scans["000000"]
    outs = {}
    for cap in (131072, 262144):
        pads = np.zeros((cap, 4), np.float32)
        pads[: len(scan)] = scan
        _, r = fn(init_state(p), jnp.asarray(pads), jnp.int32(len(scan)))
        outs[cap] = np.asarray(r.ground_mask)[: len(scan)]
    np.testing.assert_array_equal(outs[131072], outs[262144])
    assert int(outs[262144].sum()) == 72665  # golden count, scan 000000


@pytest.mark.slow
def test_long_horizon_default_buffer_turnover(scans):
    """The fast trim test shrinks the buffers to 25 entries; this one runs
    the DEFAULT 1000-entry FIFO buffers (patchworkpp.cpp:354-355 trims at
    max_*_storage=1000) through ~4 full window turnovers — 252 state-chained
    frames at 16 ring-0 pushes/frame: fill at ~frame 63, then three more
    complete window replacements (VERDICT r4 missing #3, the CPU half of
    the long-horizon soak; the multi-thousand-frame throughput soak runs on
    chip, scripts/soak.py).

    Bars differ from the fast test's EXACT bookkeeping: at default params a
    borderline patch (elevation within f32-vs-f64 slack of the adaptive
    threshold — the documented deviation class, ops/binning.py) flips one
    buffer PUSH — and the workload is the same 6 scans cycled, so the SAME
    borderline patch re-flips every cycle (measured ~0.2 counts/frame on
    ring 3). Pre-saturation counts are therefore allowed a small linear
    drift (<= 20 over the <= 70 frames to saturation); once a ring
    saturates, both engines pin at exactly 1000 (the FIFO cap is the
    invariant that matters at this horizon). Sensor height / thresholds get mm-scale tolerances (a
    single divergent entry among 1000 moves a buffer mean by ~3e-4); label
    drift must stay bounded and non-accumulating."""
    p = Params()  # default max_elevation/flatness_storage = 1000
    model = PatchworkPP(p, capacity=CAPACITY)
    oracle = NumpyPatchworkpp(p)
    total_mism = 0
    total_pts = 0
    saturated_at = None
    frame = 0
    for epoch in range(42):
        for name in SCAN_NAMES:
            frame += 1
            cloud = scans[name][::SUB]
            res = model.estimate_ground(cloud)
            ref = oracle.estimate_ground(cloud)
            total_mism += int((res.ground_mask != ref).sum())
            total_pts += len(ref)
            assert abs(model.sensor_height - oracle.sensor_height) < 2e-3, (
                f"frame {frame}: sensor_height diverged "
                f"({model.sensor_height} vs {oracle.sensor_height})"
            )
            got_cnt = np.asarray(model.state.elev_cnt)
            want_cnt = np.asarray(
                [len(b) for b in oracle.update_elevation], np.int32
            )
            assert (np.abs(got_cnt - want_cnt) <= 20).all(), (
                f"frame {frame}: buffer-count drift {got_cnt} vs {want_cnt}"
            )
            cap = p.max_elevation_storage
            both_full = (got_cnt >= cap) & (want_cnt >= cap)
            np.testing.assert_array_equal(
                got_cnt[both_full], want_cnt[both_full],
                err_msg=f"frame {frame}: saturated ring off the FIFO cap",
            )
            if saturated_at is None and int(got_cnt[0]) >= cap:
                saturated_at = frame
    assert saturated_at is not None and saturated_at <= 70, (
        f"ring-0 buffer never saturated (at {saturated_at}) — the default "
        "trim path was not exercised"
    )
    # >= 3 full window turnovers past saturation (16 pushes/frame).
    assert (frame - saturated_at) * 16 >= 3000
    assert total_mism <= 5e-4 * total_pts, (
        f"{total_mism}/{total_pts} mismatches — drift is accumulating"
    )
    np.testing.assert_allclose(
        np.asarray(model.state.elevation_thr),
        np.asarray(oracle.elevation_thr, np.float32),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(model.state.flatness_thr),
        np.asarray(oracle.flatness_thr, np.float32),
        rtol=5e-3, atol=5e-3,
    )
