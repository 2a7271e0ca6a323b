"""Seeded synthetic-cloud fuzz: oracle == tiled == unfused == point-sharded
on adversarial geometry the KITTI fixtures do not exercise on purpose.

Each seed builds a cloud stacked with the pipeline's known hard cases — a
noisy ground plane, vertical walls (R-VPF peel fodder), reflected-noise
points (RNR), out-of-range points, bit-identical duplicate rows (sort tie
freedom), and a near-collinear 6-point cluster (the clustered-eigenpair
case that motivated the hybrid solver in ops/eigen3.py) — in two variants:

* the EDGY variant places probe points EXACTLY on zone/ring radii, sector
  boundary angles, and the RNR vertical-angle gate (within an f32 ulp).
  These have no f32-decidable bin, so oracle (f64) parity is undefined for
  them — but every compiled ENGINE program must still agree with every
  other on the labels (tiled == unfused == point-sharded, bit for bit).
  This is the invariant that caught a real bug: without the
  optimization_barrier in ops/binning.py, XLA's context-dependent fusion
  rounded the radius differently in the tiled vs the unfused program and
  a straddling point flipped a whole patch across num_min_pts.
* the CLEAN variant nudges the same probes 1e-3 off the boundaries
  (safely f32-decidable), so the full oracle parity bar applies: engine
  labels must EXACTLY match the f64 NumPy oracle, fresh and adapted,
  whenever the run is determinate (no exact two-point fit and no natural
  boundary straddler — detected and reported, never silently skipped).

Reference semantics under test: the full estimateGround pipeline
(/root/reference/cpp/patchworkpp/src/patchworkpp.cpp:151-336).
"""

from __future__ import annotations

import numpy as np
import pytest

from patchworkpp_tpu.oracle import NumpyPatchworkpp
from patchworkpp_tpu.params import Params
from patchworkpp_tpu.state import init_state

CAP = 8192
# zone radial boundaries for the default CZM (patchworkpp.h:122-125 derivation)
ZONE_EDGES = (2.7, 12.3625, 22.025, 41.35, 80.0)


def geom_probe_constants(p: Params):
    """Derive boundary-probe constants from an arbitrary CZM geometry:
    (all radial ring/zone edges, a mid-ring radius per zone, sector counts)."""
    from patchworkpp_tpu.params import CZMGeometry

    geom = CZMGeometry.create(p)
    edges = []
    for k in range(p.num_zones):
        lo = float(geom.min_ranges[k])
        size = float(geom.ring_sizes[k])
        for j in range(p.num_rings_each_zone[k] + 1):
            edges.append(lo + j * size)
    edges = sorted(set(edges))
    if len(edges) > 16:  # keep probe row count bounded for exotic grids
        edges = edges[:: len(edges) // 16 + 1] + [edges[-1]]
    mids = [
        float(geom.min_ranges[k]) + 0.5 * float(geom.ring_sizes[k])
        for k in range(p.num_zones)
    ]
    return tuple(edges), tuple(mids), tuple(p.num_sectors_each_zone)


def synth_cloud(
    seed: int,
    exact_edges: bool = True,
    zone_edges=ZONE_EDGES,
    zone_mid_r=(7.0, 17.0, 30.0, 60.0),
    nsec=(16, 32, 54, 32),
) -> np.ndarray:
    """~3.7k-point adversarial cloud, float32 (N, 4).

    exact_edges=True puts boundary probes ON the edges (sub-ulp);
    exact_edges=False nudges them 1e-3 away (f32-decidable bins).
    zone_edges/zone_mid_r/nsec default to the stock CZM; pass
    geom_probe_constants(p) values to probe a custom geometry's boundaries.
    """
    rng = np.random.default_rng(seed)
    eps_set = (0.0, 1e-7, -1e-7) if exact_edges else (1e-3, -1e-3)

    def disc(n, r_lo, r_hi):
        r = rng.uniform(r_lo, r_hi, n)
        th = rng.uniform(0, 2 * np.pi, n)
        return r * np.cos(th), r * np.sin(th)

    rows = []

    # noisy ground plane, mild radial tilt, some beyond max_range
    n = 2200
    x, y = disc(n, 0.5, 85.0)
    z = -1.723 + 0.004 * np.hypot(x, y) + rng.normal(0, 0.04, n)
    rows.append(np.stack([x, y, z, rng.uniform(0, 1, n)], 1))

    # vertical walls: 3 planar slabs at random heading/distance
    for _ in range(3):
        n = 160
        th = rng.uniform(0, 2 * np.pi)
        d = rng.uniform(4.0, 35.0)
        along = rng.uniform(-6.0, 6.0, n)
        cx, cy = d * np.cos(th), d * np.sin(th)
        x = cx - along * np.sin(th) + rng.normal(0, 0.02, n)
        y = cy + along * np.cos(th) + rng.normal(0, 0.02, n)
        z = rng.uniform(-1.7, 1.8, n)
        rows.append(np.stack([x, y, z, rng.uniform(0, 1, n)], 1))

    # reflected noise: steep vertical angle, far below ground, dim returns
    # (reference reflected_noise_removal, patchworkpp.cpp:377-400)
    n = 40
    x, y = disc(n, 3.0, 9.0)
    z = rng.uniform(-3.6, -2.8, n)
    rows.append(np.stack([x, y, z, rng.uniform(0.0, 0.15, n)], 1))

    # out-of-range: beyond max_range and inside min_range
    n = 60
    x, y = disc(n, 81.0, 120.0)
    z = rng.uniform(-2, 2, n)
    rows.append(np.stack([x, y, z, rng.uniform(0, 1, n)], 1))
    n = 40
    x, y = disc(n, 0.05, 2.69)
    z = rng.uniform(-2, 2, n)
    rows.append(np.stack([x, y, z, rng.uniform(0, 1, n)], 1))

    # radii on/near zone boundaries — the f32-vs-f64 binning edge
    # (ops/binning.py); the exact variant trips the cross-PROGRAM hazard
    # the optimization_barrier pins down
    for edge in zone_edges:
        for eps in eps_set:
            n = 4
            th = rng.uniform(0, 2 * np.pi, n)
            r = edge + eps
            z = -1.723 + rng.normal(0, 0.03, n)
            rows.append(
                np.stack(
                    [r * np.cos(th), r * np.sin(th), z, rng.uniform(0, 1, n)], 1
                )
            )

    # theta on/near sector boundaries (per-zone sector grids) — the atan2
    # analog of the radius edge probes
    th_eps = (0.0, 1e-7, -1e-7) if exact_edges else (1e-4, -1e-4)
    for zr, ns in zip(zone_mid_r, nsec):
        j = rng.integers(0, ns, 6)
        th = j * (2 * np.pi / ns) + rng.choice(th_eps, 6)
        z = -1.723 + rng.normal(0, 0.03, 6)
        rows.append(
            np.stack(
                [zr * np.cos(th), zr * np.sin(th), z, rng.uniform(0, 1, 6)], 1
            )
        )

    # RNR vertical-angle probes: atan2(z, r) at/near the -15 deg gate
    # (z = r * tan(thr)), dim returns, z below the height gate
    n = 12
    x, y = disc(n, 10.5, 19.0)
    rr = np.hypot(x, y)
    z_eps = (0.0, 1e-6, -1e-6) if exact_edges else (1e-3, -1e-3)
    z = rr * np.tan(np.deg2rad(-15.0)) + rng.choice(z_eps, n)
    rows.append(np.stack([x, y, z, rng.uniform(0.0, 0.15, n)], 1))

    # near-collinear 6-point cluster (clustered small eigenpair)
    t = np.linspace(0, 1, 6)
    base = np.array([15.0, 3.0, -1.68])
    dirv = np.array([0.8, 0.6, 0.01])
    pts = base + t[:, None] * dirv + rng.normal(0, 1e-4, (6, 3))
    rows.append(np.concatenate([pts, rng.uniform(0, 1, (6, 1))], 1))

    cloud = np.concatenate(rows, 0).astype(np.float32)

    # bit-identical duplicates: sort tie freedom must not leak into labels
    dup = cloud[rng.integers(0, len(cloud), 120)]
    cloud = np.concatenate([cloud, dup], 0)
    return cloud[rng.permutation(len(cloud))]


def _pad_args(cloud):
    import jax.numpy as jnp

    pts = np.zeros((CAP, 4), np.float32)
    pts[: len(cloud)] = cloud
    return jnp.asarray(pts), jnp.int32(len(cloud))


@pytest.fixture(scope="module")
def frame_fns():
    """Compile each engine ONCE for the module; all seeds share the shapes."""
    import jax

    from patchworkpp_tpu.pipeline import make_frame_fn

    p = Params()
    return p, {
        fused: jax.jit(make_frame_fn(p, fused=fused))
        for fused in ("tiled", False)
    }


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_engines_agree_on_edges(frame_fns, seed):
    """EDGY clouds: tiled == unfused bit-for-bit (fresh + adapted), even on
    points with no f32-decidable bin."""
    p, fns = frame_fns
    args = _pad_args(synth_cloud(seed, exact_edges=True))

    masks = {}
    for fused, fn in fns.items():
        st, r0 = fn(init_state(p), *args)
        _, r1 = fn(st, *args)
        masks[fused] = (np.asarray(r0.ground_mask), np.asarray(r1.ground_mask))

    np.testing.assert_array_equal(
        masks["tiled"][0], masks[False][0], err_msg="tiled != unfused fresh"
    )
    np.testing.assert_array_equal(
        masks["tiled"][1], masks[False][1], err_msg="tiled != unfused adapted"
    )


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_oracle_parity_clean(frame_fns, seed):
    """CLEAN clouds: engine == f64 oracle EXACT (fresh + adapted) on
    determinate runs; indeterminacy (two-point fits / natural boundary
    straddlers) is detected and reported, never silently passed."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.ops.binning import bin_points
    from patchworkpp_tpu.params import CZMGeometry

    p, fns = frame_fns
    cloud = synth_cloud(seed, exact_edges=False)
    args = _pad_args(cloud)

    orc = NumpyPatchworkpp(p)
    want0 = orc.estimate_ground(cloud)
    oracle_pid0 = orc.last_patch_id
    want1 = orc.estimate_ground(cloud)  # adapted second pass
    oracle_pid1 = orc.last_patch_id
    two_point_fits = orc.two_point_fits

    masks, st1 = {}, {}
    for fused, fn in fns.items():
        st, r0 = fn(init_state(p), *args)
        st1[fused] = st
        _, r1 = fn(st, *args)
        masks[fused] = (
            np.asarray(r0.ground_mask)[: len(cloud)],
            np.asarray(r1.ground_mask)[: len(cloud)],
        )

    # engines must agree on the clean clouds too
    for k in (0, 1):
        np.testing.assert_array_equal(
            masks["tiled"][k], masks[False][k], err_msg=f"engines frame {k}"
        )

    # Determinacy: the engines' f32 binning must agree with the oracle's
    # f64 binning under the fresh height and both engines' adapted heights.
    geom = CZMGeometry.create(p)
    bfn = jax.jit(
        lambda a, sh: bin_points(a, jnp.int32(len(cloud)), sh, p, geom)
    )
    pid_diffs = 0
    for sh, want_pid in (
        (init_state(p).sensor_height, oracle_pid0),
        (st1["tiled"].sensor_height, oracle_pid1),
        (st1[False].sensor_height, oracle_pid1),
    ):
        epid = np.asarray(bfn(args[0], sh).patch_id)[: len(cloud)]
        epid = np.where(epid == geom.num_patches, -1, epid)
        pid_diffs += int((epid != want_pid).sum())

    if two_point_fits == 0 and pid_diffs == 0:
        np.testing.assert_array_equal(masks["tiled"][0], want0, "vs oracle fresh")
        np.testing.assert_array_equal(masks["tiled"][1], want1, "vs oracle adapted")
    else:
        cause = (
            f"{pid_diffs} boundary point-frame(s) binned differently f32 vs f64"
            if pid_diffs
            else f"{two_point_fits} two-point fit(s) (rank-1, solver-arbitrary)"
        )
        pytest.skip(
            f"oracle parity undefined for seed {seed} ({cause}); "
            "engine==engine invariant still asserted"
        )


def test_fuzz_custom_czm_parity():
    """A >511-patch custom CZM (688 patches — the reference's vector-built
    CZM accepts any grid, patchworkpp.h:104-134; ours scales geom.spad)
    fuzzed with probes ON ITS OWN derived ring/sector boundaries: the
    engines must agree bit-for-bit on the edgy cloud, and match the f64
    oracle exactly on the clean cloud when determinate."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.ops.binning import bin_points
    from patchworkpp_tpu.params import CZMGeometry
    from patchworkpp_tpu.pipeline import make_frame_fn

    p = Params(
        num_rings_each_zone=(3, 4, 4, 4),
        num_sectors_each_zone=(16, 32, 64, 64),
    )
    geom = CZMGeometry.create(p)
    assert geom.num_patches == 688 and geom.spad > 512
    probes = geom_probe_constants(p)
    fns = {
        fused: jax.jit(make_frame_fn(p, fused=fused))
        for fused in ("tiled", False)
    }

    # edgy: engines agree bit-for-bit (seed 1: determinate on the clean
    # variant — seed 0 hits a two-point fit and would skip the oracle half)
    args = _pad_args(synth_cloud(1, True, *probes))
    edgy = {}
    for fused, fn in fns.items():
        st, r0 = fn(init_state(p), *args)
        _, r1 = fn(st, *args)
        edgy[fused] = (np.asarray(r0.ground_mask), np.asarray(r1.ground_mask))
    for k in (0, 1):
        np.testing.assert_array_equal(
            edgy["tiled"][k], edgy[False][k], err_msg=f"engines frame {k}"
        )

    # clean: oracle parity under the determinacy guard
    cloud = synth_cloud(1, False, *probes)
    args = _pad_args(cloud)
    orc = NumpyPatchworkpp(p)
    want0 = orc.estimate_ground(cloud)
    pid0 = orc.last_patch_id
    st, r0 = fns["tiled"](init_state(p), *args)
    got0 = np.asarray(r0.ground_mask)[: len(cloud)]
    bfn = jax.jit(
        lambda a, sh: bin_points(a, jnp.int32(len(cloud)), sh, p, geom)
    )
    epid = np.asarray(bfn(args[0], init_state(p).sensor_height).patch_id)[
        : len(cloud)
    ]
    epid = np.where(epid == geom.num_patches, -1, epid)
    pid_diffs = int((epid != pid0).sum())
    if orc.two_point_fits == 0 and pid_diffs == 0:
        np.testing.assert_array_equal(got0, want0, "vs oracle fresh")
    else:
        pytest.skip(
            f"oracle parity undefined ({pid_diffs} straddlers, "
            f"{orc.two_point_fits} two-point fits); engines-agree asserted"
        )


def test_fuzz_grid_kernel_interpret_parity(frame_fns):
    """The Mosaic grid kernel's frame program is a FOURTH embedding of
    bin_points (interpret mode here; its on-chip golden gate is
    scripts/tpu_parity.py --grid). Bit-for-bit label agreement with the
    tiled engine on an edgy cloud extends the cross-program invariant to
    the kernel embedding in CI."""
    import jax

    from patchworkpp_tpu.pipeline import make_frame_fn

    p, fns = frame_fns
    gfn = jax.jit(make_frame_fn(p, fused="grid", interpret=True))
    args = _pad_args(synth_cloud(0, exact_edges=True))

    st_g, r_g = gfn(init_state(p), *args)
    st_t, r_t = fns["tiled"](init_state(p), *args)
    np.testing.assert_array_equal(
        np.asarray(r_g.ground_mask), np.asarray(r_t.ground_mask),
        err_msg="grid(interpret) != tiled fresh",
    )
    _, r_g1 = gfn(st_g, *args)
    _, r_t1 = fns["tiled"](st_t, *args)
    np.testing.assert_array_equal(
        np.asarray(r_g1.ground_mask), np.asarray(r_t1.ground_mask),
        err_msg="grid(interpret) != tiled adapted",
    )


@pytest.fixture(scope="module")
def sharded_fns():
    """Compile the 8-device point-sharded program and the single-device
    tiled program ONCE for the module (the sharded-mesh compile dominates
    this test pair's wall-clock; both seeds share shapes and params)."""
    import jax
    from jax.sharding import Mesh

    from patchworkpp_tpu.parallel import make_point_sharded_frame_fn
    from patchworkpp_tpu.pipeline import make_frame_fn

    p = Params()
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    return (
        p,
        make_point_sharded_frame_fn(p, mesh, axis="d"),
        jax.jit(make_frame_fn(p, fused="tiled")),
    )


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_point_sharded_parity(sharded_fns, seed):
    """The point-sharded SPMD program is a THIRD compiled embedding of the
    same binning + fit math (per-shard shapes, collectives between passes).
    Its labels must equal the single-device tiled program bit-for-bit on
    the EDGY clouds too — exactly the cross-PROGRAM consistency the
    optimization_barrier in ops/binning.py pins down."""
    p, sfn, fn = sharded_fns

    args = _pad_args(synth_cloud(seed, exact_edges=True))

    st_s, r_s = sfn(init_state(p), *args)
    st_t, r_t = fn(init_state(p), *args)
    np.testing.assert_array_equal(
        np.asarray(r_s.ground_mask),
        np.asarray(r_t.ground_mask),
        err_msg="point-sharded != single-device fresh",
    )
    # adapted second frame through each program's own state
    _, r_s1 = sfn(st_s, *args)
    _, r_t1 = fn(st_t, *args)
    np.testing.assert_array_equal(
        np.asarray(r_s1.ground_mask),
        np.asarray(r_t1.ground_mask),
        err_msg="point-sharded != single-device adapted",
    )


def test_fuzz_sharded_chunked_composition_parity(sharded_fns):
    """The shard x chunk COMPOSED program (r5: MeshComm over ("point",
    "chunk") axis tuples — shard_map outside, vmap inside) is a fifth
    compiled embedding of the binning + fit math. One edge-probe cloud
    suffices (one extra compile): its labels must equal the single-device
    tiled program bit-for-bit, boundary-exact probes included."""
    import jax
    from jax.sharding import Mesh

    from patchworkpp_tpu.parallel import make_sharded_chunked_frame_fn

    p, _, fn = sharded_fns
    mesh = Mesh(np.array(jax.devices()[:4]), ("point",))
    cfn = make_sharded_chunked_frame_fn(p, mesh, 2)
    args = _pad_args(synth_cloud(0, exact_edges=True))
    _, r_c = cfn(init_state(p), *args)
    _, r_t = fn(init_state(p), *args)
    np.testing.assert_array_equal(
        np.asarray(r_c.ground_mask),
        np.asarray(r_t.ground_mask),
        err_msg="shard-x-chunk composed != single-device on edge probes",
    )


def test_fuzz_sequence_fn_matches_frame_loop():
    """The scan-dispatched sequence program (make_sequence_fn — the bench
    driver and the server's throughput mode) is yet another compiled
    embedding of the frame step: on a chain of EDGY clouds its per-frame
    FrameResults and final state must equal the frame-loop program
    bitwise, boundary-exact probes included."""
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu.pipeline import make_frame_fn, make_sequence_fn

    p = Params()
    clouds = [synth_cloud(s, exact_edges=True) for s in range(3)]
    stack = np.zeros((len(clouds), CAP, 4), np.float32)
    npts = np.zeros((len(clouds),), np.int32)
    for i, c in enumerate(clouds):
        stack[i, : len(c)] = c
        npts[i] = len(c)

    seq = jax.jit(make_sequence_fn(p))
    st_seq, seq_res = seq(init_state(p), jnp.asarray(stack), jnp.asarray(npts))

    frame = jax.jit(make_frame_fn(p))
    st = init_state(p)
    for i in range(len(clouds)):
        st, res = frame(st, jnp.asarray(stack[i]), jnp.int32(npts[i]))
        np.testing.assert_array_equal(
            np.asarray(seq_res.ground_mask[i]), np.asarray(res.ground_mask),
            err_msg=f"edgy chain frame {i}",
        )
    for leaf_s, leaf_f in zip(jax.tree.leaves(st_seq), jax.tree.leaves(st)):
        np.testing.assert_array_equal(np.asarray(leaf_s), np.asarray(leaf_f))
