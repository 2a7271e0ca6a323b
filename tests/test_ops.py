"""Unit tests for the core tensor ops (SURVEY.md §4b: per-kernel vs jnp ref)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchworkpp_tpu.ops.eigen3 import eigh3x3_descending
from patchworkpp_tpu.ops.onehot import SPAD, patch_lookup, patch_reduce
from patchworkpp_tpu.ops.segments import segment_rank, sort_by_patch, patch_counts
from patchworkpp_tpu.ops.moments import moment_features
from patchworkpp_tpu.ops.binning import bin_points
from patchworkpp_tpu.params import CZMGeometry, Params


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


# ------------------------------------------------------------------ eigen3


def test_eigen3_matches_numpy(rng):
    a = rng.normal(size=(500, 3, 3)).astype(np.float32)
    cov = (a @ a.transpose(0, 2, 1)).astype(np.float32)
    ev, vm = map(np.asarray, eigh3x3_descending(jnp.asarray(cov)))
    ref = np.linalg.eigvalsh(cov.astype(np.float64))[:, ::-1]
    rel = np.abs(ev - ref) / (np.abs(ref).max(axis=1, keepdims=True) + 1e-30)
    assert rel.max() < 1e-4
    # eigenvector residual for the smallest eigenvalue
    res = np.einsum("bij,bj->bi", cov.astype(np.float64), vm) - ref[:, 2:3] * vm
    assert np.abs(res).max() < 1e-2 * np.abs(cov).max()
    assert (vm[:, 2] >= 0).all()


def test_eigen3_planar_covariances(rng):
    """Ground-like: two large eigenvalues, one tiny. Normal must be accurate."""
    d = np.stack([np.diag([4.0, 1.0, f]).astype(np.float32) for f in (1e-6, 1e-4, 1e-2)])
    q, _ = np.linalg.qr(rng.normal(size=(3, 3, 3)))
    cov = (q @ d @ q.transpose(0, 2, 1)).astype(np.float32)
    ev, vm = map(np.asarray, eigh3x3_descending(jnp.asarray(cov)))
    ref_w, ref_v = np.linalg.eigh(cov.astype(np.float64))
    np.testing.assert_allclose(ev[:, 2], ref_w[:, 0], atol=2e-5)
    dots = np.abs(np.einsum("bi,bi->b", vm, ref_v[:, :, 0]))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_eigen3_nan_and_zero():
    cov = jnp.stack([jnp.full((3, 3), jnp.nan), jnp.zeros((3, 3))])
    ev, vm = eigh3x3_descending(cov)
    assert np.isnan(np.asarray(ev[0])).all() and np.isnan(np.asarray(vm[0])).all()
    np.testing.assert_array_equal(np.asarray(vm[1]), [0, 0, 1])


def test_eigen3_clustered_pair_accuracy(rng):
    """The hybrid's reason to exist: when the two SMALL eigenvalues cluster,
    the deflated path must stay within the intrinsic conditioning bound
    instead of the old cross-product-at-e2 form's sqrt(eps) blowup (which
    measurably rotated a real patch's normal across the uprightness
    threshold — scan 000004 patch 343; see ops/eigen3.py docstring)."""
    # Gaps INSIDE the hybrid's 1% switch but ABOVE f32 determinability
    # (the eigvec of a pair with gap <~ 100*eps*||A|| is not determined by
    # an f32 matrix at all — any two correct solvers may disagree up to 90
    # degrees there, and the solver resolves sub-resolution pairs to +z).
    mats, gaps = [], []
    for i in range(2000):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        gap = 10.0 ** rng.uniform(-3.5, -2.3)  # absolute e1-e2, fro ~ 5
        d = np.diag([5.0, 0.01 + gap, 0.01])
        mats.append(q @ d @ q.T)
        gaps.append(gap)
    cov = np.asarray(mats, np.float32)
    gaps = np.asarray(gaps)
    _, vm = map(np.asarray, jax.jit(eigh3x3_descending)(jnp.asarray(cov)))
    w64 = np.linalg.eigh(cov.astype(np.float64))
    vref = w64.eigenvectors[:, :, 0]
    dots = np.abs(np.einsum("bi,bi->b", vm, vref))
    ang = np.radians(np.degrees(np.arccos(np.clip(dots, 0.0, 1.0))))
    # Intrinsic conditioning: err ~ eps * ||A|| / gap. Demand the deflated
    # path stays within a small multiple of it; the OLD construction's
    # sqrt(eps) eigenvalue error put it at ~0.8 rad at the tight end.
    bound = 12.0 * np.finfo(np.float32).eps * 5.0 / gaps
    frac_over = (ang > np.maximum(bound, 2e-4)).mean()
    assert frac_over < 0.01, (
        f"{frac_over:.1%} of clustered pencils exceed the conditioning "
        f"bound (worst {ang.max():.4f} rad at gap {gaps[ang.argmax()]:.1e})"
    )


def test_eigen3_separated_path_matches_original_construction():
    """Lock the hybrid's separated-regime contract: for pencils with
    (e1 - e2) > 1% of ||A||_F the output is the ORIGINAL
    cross-product-at-e2 construction. The reference here is the stacked
    jnp.cross form the old eigen3 used — the hybrid standardizes on the old
    KERNEL's component form, and the two fuse differently by up to 1 ulp
    per component (they were never bitwise-equal to each other; fused ==
    unfused was always a label-level invariant, per CLAUDE.md). So: 1-ulp
    component agreement vs the jnp.cross form, and bitwise agreement with a
    component-form reimplementation."""
    from patchworkpp_tpu.ops.trig import cardano_cos_pair

    def original(cov):
        a00, a01, a02 = cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2]
        a11, a12, a22 = cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]
        off_sq = a01 * a01 + a02 * a02 + a12 * a12
        q = (a00 + a11 + a22) / 3.0
        b00, b11, b22 = a00 - q, a11 - q, a22 - q
        p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * off_sq
        p = jnp.sqrt(p2 / 6.0)
        safe_p = jnp.where(p > 1e-12, p, 1.0)
        c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
        c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
        detb = (
            c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02)
        )
        r = jnp.clip(detb / 2.0, -1.0, 1.0)
        _, cos_hi = cardano_cos_pair(r)
        e2 = q + 2.0 * p * cos_hi
        r0 = jnp.stack([a00 - e2, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - e2, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - e2], axis=-1)
        c_a, c_b, c_c = jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)
        n_a = jnp.sum(c_a * c_a, axis=-1)
        n_b = jnp.sum(c_b * c_b, axis=-1)
        n_c = jnp.sum(c_c * c_c, axis=-1)
        best_ab = jnp.where((n_a >= n_b)[..., None], c_a, c_b)
        nbest_ab = jnp.maximum(n_a, n_b)
        best = jnp.where((nbest_ab >= n_c)[..., None], best_ab, c_c)
        nbest = jnp.maximum(nbest_ab, n_c)
        fro2 = a00 * a00 + a11 * a11 + a22 * a22 + 2.0 * off_sq
        degenerate = nbest <= jnp.float32(1e-12) * fro2 * fro2
        zhat = jnp.zeros_like(best).at[..., 2].set(1.0)
        vec = jnp.where(degenerate[..., None], zhat, best)
        norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
        vmin = vec / norm
        flip = vmin[..., 2] < 0
        return jnp.where(flip[..., None], -vmin, vmin)

    rng = np.random.default_rng(7)
    a = rng.normal(size=(4000, 3, 3)).astype(np.float32)
    cov = (a @ a.transpose(0, 2, 1)).astype(np.float32)
    ev, vm = map(np.asarray, jax.jit(eigh3x3_descending)(jnp.asarray(cov)))
    vref = np.asarray(jax.jit(original)(jnp.asarray(cov)))
    fro = np.sqrt((cov * cov).sum(axis=(1, 2), dtype=np.float64))
    # 1.1% margin over the solver's 1% switch keeps this predicate clear of
    # ulp disagreements with the solver's own f32 gap estimate.
    separated = (ev[:, 1] - ev[:, 2]) > 0.011 * fro
    assert separated.sum() > 3000, "distribution sanity"
    # vs jnp.cross form: ulp-class agreement on unit-vector components
    diff = np.abs(vm[separated] - vref[separated]).max()
    assert diff <= 5e-7, f"separated path drifted {diff} from jnp.cross form"

    # vs the component form (what eig3_plane_columns traces): bitwise
    from patchworkpp_tpu.ops.eigen3 import _best_row_cross

    def component_form(cov):
        a00, a01, a02 = cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2]
        a11, a12, a22 = cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]
        off_sq = a01 * a01 + a02 * a02 + a12 * a12
        q = (a00 + a11 + a22) / 3.0
        b00, b11, b22 = a00 - q, a11 - q, a22 - q
        p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * off_sq
        p = jnp.sqrt(p2 / 6.0)
        safe_p = jnp.where(p > 1e-12, p, 1.0)
        c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
        c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
        detb = (
            c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02)
        )
        r = jnp.clip(detb / 2.0, -1.0, 1.0)
        _, cos_hi = cardano_cos_pair(r)
        e2 = q + 2.0 * p * cos_hi
        vx, vy, vz, nbest = _best_row_cross(
            a00 - e2, a01, a02, a11 - e2, a12, a22 - e2
        )
        fro2 = a00 * a00 + a11 * a11 + a22 * a22 + 2.0 * off_sq
        degen = nbest <= jnp.float32(1e-12) * fro2 * fro2
        vx = jnp.where(degen, 0.0, vx)
        vy = jnp.where(degen, 0.0, vy)
        vz = jnp.where(degen, 1.0, vz)
        norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        vx, vy, vz = vx / norm, vy / norm, vz / norm
        flip = vz < 0
        return jnp.stack(
            [jnp.where(flip, -vx, vx), jnp.where(flip, -vy, vy),
             jnp.where(flip, -vz, vz)], axis=-1,
        )

    vcomp = np.asarray(jax.jit(component_form)(jnp.asarray(cov)))
    np.testing.assert_array_equal(
        vm[separated].view(np.int32), vcomp[separated].view(np.int32)
    )


# ------------------------------------------------------------------ onehot


def test_patch_lookup_exact(rng):
    pid = jnp.asarray(rng.integers(0, 505, 4096).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(SPAD, 7)).astype(np.float32))
    out = np.asarray(jax.jit(patch_lookup)(table, pid))
    np.testing.assert_array_equal(out, np.asarray(table)[np.asarray(pid)])


def test_patch_lookup_factored_edges(rng):
    """The factored (64 x S/64) one-hot path: out-of-range and negative ids
    produce all-zero rows (as the flat one-hot did), extreme-exponent table
    values survive the bf16x3 chop bitwise (checked on the int32 bit
    patterns), and a width that is not a multiple of 64 still takes the
    flat branch. SIGNED ZERO is exempt by contract: the one-hot contraction
    may resolve a -0.0 entry to +0.0 (the 511 masked addends each
    contribute +0.0 and (-0.0) + (+0.0) == +0.0); every consumer reads
    looked-up values through comparisons, where -0.0 == +0.0 anyway."""
    pid = rng.integers(-8, SPAD + 16, 4096).astype(np.int32)
    table = (
        rng.normal(size=(SPAD, 5)) * np.exp(rng.uniform(-60, 60, (SPAD, 5)))
    ).astype(np.float32)
    table[3, 0] = 1e30  # the degenerate-plane sentinel
    table[7, 2] = -0.0  # exempt: value-equal only (see docstring)
    out = np.asarray(jax.jit(patch_lookup)(jnp.asarray(table), jnp.asarray(pid)))
    ref = np.zeros((4096, 5), np.float32)
    inr = (pid >= 0) & (pid < SPAD)
    ref[inr] = table[pid[inr]]
    np.testing.assert_array_equal(out, ref)
    nz = ref != 0.0  # bitwise on every non-zero payload (incl. denormals)
    np.testing.assert_array_equal(
        out[nz].view(np.int32), ref[nz].view(np.int32)
    )
    assert (out[~inr] == 0.0).all()

    # Flat branch (width 96 is not a 64 multiple > 64): same contract.
    t2 = jnp.asarray(table[:96])
    p2 = jnp.asarray(rng.integers(0, 96, 1024).astype(np.int32))
    out2 = np.asarray(jax.jit(patch_lookup)(t2, p2))
    np.testing.assert_array_equal(out2, table[:96][np.asarray(p2)])

    # Wide tables (C=17, e.g. the label table) stay on the flat one-hot
    # (the hi-select epilogue would cost more than the compare savings);
    # contract unchanged either way.
    t3 = jnp.asarray(np.tile(table, (1, 4))[:, :17])
    p3 = jnp.asarray(rng.integers(0, SPAD, 2048).astype(np.int32))
    out3 = np.asarray(jax.jit(patch_lookup)(t3, p3))
    np.testing.assert_array_equal(out3, np.asarray(t3)[np.asarray(p3)])


def test_patch_lookup_cols_bitwise(rng):
    """The transposed-output lookup equals patch_lookup(...).T bitwise at
    both widths (S=512 and S=96), including out-of-range / negative ids
    (all-zero columns). Exercises the same hostile table values as the
    (P, C)-oriented test (extreme exponents, the 1e30 sentinel; signed zero
    is exempt there and here — see test_patch_lookup_factored_edges)."""
    from patchworkpp_tpu.ops.onehot import patch_lookup_cols

    pid = rng.integers(-8, SPAD + 16, 4096).astype(np.int32)
    table = (
        rng.normal(size=(SPAD, 17)) * np.exp(rng.uniform(-60, 60, (SPAD, 17)))
    ).astype(np.float32)
    table[3, 0] = 1e30
    table[7, 2] = -0.0  # exempt: value-equal only
    out = np.asarray(
        jax.jit(patch_lookup_cols)(jnp.asarray(table), jnp.asarray(pid))
    )
    assert out.shape == (17, 4096)
    ref = np.asarray(jax.jit(patch_lookup)(jnp.asarray(table), jnp.asarray(pid)))
    np.testing.assert_array_equal(out, ref.T)
    nz = ref.T != 0.0  # bitwise on non-zero payloads (assert_array_equal
    np.testing.assert_array_equal(  # would let -0.0 == +0.0 slip through)
        out[nz].view(np.int32), ref.T[nz].view(np.int32)
    )
    inr = (pid >= 0) & (pid < SPAD)
    np.testing.assert_array_equal(out.T[inr], table[pid[inr]])
    assert (out.T[~inr] == 0.0).all()

    # Flat branch (width 96): same contract, transposed.
    t2 = jnp.asarray(table[:96, :5])
    p2 = jnp.asarray(rng.integers(0, 96, 1024).astype(np.int32))
    out2 = np.asarray(jax.jit(patch_lookup_cols)(t2, p2))
    np.testing.assert_array_equal(out2.T, np.asarray(t2)[np.asarray(p2)])


def test_patch_reduce_matches_segment_sum(rng):
    pid = rng.integers(0, 505, 4096).astype(np.int32)
    feats = rng.normal(size=(4096, 5)).astype(np.float32)
    out = np.asarray(jax.jit(patch_reduce)(jnp.asarray(feats), jnp.asarray(pid)))
    ref = np.zeros((SPAD, 5), np.float64)
    np.add.at(ref, pid, feats.astype(np.float64))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- segments


def test_sort_and_rank(rng):
    n = 2048
    pid = rng.integers(0, 40, n).astype(np.int32)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    sp = jax.jit(sort_by_patch)(
        jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]), jnp.asarray(xyz[:, 2]),
        jnp.asarray(pid),
    )
    pid_s = np.asarray(sp.patch_id)
    z_s = np.asarray(sp.z)
    assert (np.diff(pid_s) >= 0).all()
    for s in np.unique(pid_s):
        zs = z_s[pid_s == s]
        assert (np.diff(zs) >= 0).all()
    counts = np.asarray(patch_counts(sp))
    ref_counts = np.bincount(pid, minlength=SPAD)
    np.testing.assert_array_equal(counts, ref_counts)

    mask = np.asarray(sp.z) > 0
    rank = np.asarray(jax.jit(segment_rank)(jnp.asarray(mask), sp))
    for s in np.unique(pid_s):
        rows = np.flatnonzero(pid_s == s)
        expect = np.cumsum(mask[rows]) - mask[rows]
        np.testing.assert_array_equal(rank[rows], expect)


# ----------------------------------------------------------------- binning


def test_bin_points_matches_oracle_czm(rng, scans):
    """Patch assignment parity vs the golden-exact oracle's CZM."""
    from patchworkpp_tpu.oracle import NumpyPatchworkpp

    params = Params()
    geom = CZMGeometry.create(params)
    cloud = scans["000000"][::16]
    n = len(cloud)
    pad = np.zeros((8192, 4), np.float32)
    pad[:n] = cloud

    oracle = NumpyPatchworkpp(params)
    noise = oracle._rnr_mask(cloud)
    ref_pid, _ = oracle._czm_assign(cloud, excluded=noise)

    import jax.numpy as jnp

    bins = jax.jit(
        lambda x, m, sh: bin_points(x, m, sh, params, geom)
    )(jnp.asarray(pad), jnp.int32(n), jnp.float32(params.sensor_height))
    got = np.asarray(bins.patch_id)[:n]
    ref = np.where(ref_pid < 0, geom.num_patches, ref_pid)
    mismatch = (got != ref).sum()
    assert mismatch <= n * 1e-4, f"{mismatch}/{n} binning mismatches"


def test_moment_features_shape(rng):
    q = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    f = np.asarray(moment_features(q))
    assert f.shape == (128, 10)
    np.testing.assert_allclose(f[:, 0], 1.0)
    np.testing.assert_allclose(f[:, 4], np.asarray(q)[:, 0] ** 2, rtol=1e-6)


def test_trig_polynomials_accuracy():
    """ops/trig.py: the Cardano trig substitutes stay within f32-ulp class
    of the true functions over the full acos domain (Mosaic cannot lower
    acos, so both engine paths rely on these)."""
    from patchworkpp_tpu.ops.trig import acos_poly, cardano_cos_pair

    r = np.linspace(-1, 1, 200001).astype(np.float32)
    ref = np.arccos(r.astype(np.float64))
    got = np.asarray(acos_poly(jnp.asarray(r)))
    assert np.abs(got - ref).max() < 5e-7
    c_lo, c_hi = (np.asarray(v) for v in cardano_cos_pair(jnp.asarray(r)))
    phi = ref / 3.0
    assert np.abs(c_lo - np.cos(phi)).max() < 5e-7
    assert np.abs(c_hi - np.cos(phi + 2 * np.pi / 3)).max() < 5e-7


def test_movement_dots_exact():
    """The kernel's one-hot MXU movement (ops/pallas/movement.py): patch
    reductions are exact on integer payloads, broadcasts reconstruct every
    f32 bitwise (single addend through the bf16x3 chop split), and the
    strict-lower prefix matches a direct segmented cumsum."""
    from patchworkpp_tpu.ops.pallas.movement import _seg_dots, _prior_exclusive

    rng = np.random.default_rng(3)
    nt, spad = 96, 17
    tpc = np.sort(rng.integers(0, spad, nt)).astype(np.int32)
    oh_np = (tpc[:, None] == np.arange(spad)[None, :]).astype(np.float32)
    oh = jnp.asarray(oh_np, jnp.bfloat16)

    # Reduce: integer payloads sum exactly.
    v_int = rng.integers(0, 200, (nt, 10)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(_seg_dots(oh, jnp.asarray(v_int), transpose=True)),
        oh_np.T @ v_int,
    )

    # Broadcast: arbitrary-magnitude f32 values come back bitwise.
    w = (rng.standard_normal((spad, 5)) * np.exp(
        rng.uniform(-30, 30, (spad, 5))
    )).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(_seg_dots(oh, jnp.asarray(w), transpose=False)), w[tpc]
    )

    # Exclusive same-segment prefix vs direct computation.
    lower = np.arange(nt)[:, None] > np.arange(nt)[None, :]
    same = tpc[:, None] == tpc[None, :]
    lb = jnp.asarray((same & lower).astype(np.float32), jnp.bfloat16)
    m = rng.integers(0, 128, (nt, 1)).astype(np.float32)
    ref = (same & lower).astype(np.float32) @ m
    np.testing.assert_array_equal(
        np.asarray(_prior_exclusive(lb, jnp.asarray(m))), ref
    )


@pytest.mark.parametrize("fused", [True, False])
def test_no_point_sized_gathers_in_frame(fused):
    """Structural guard for the repo's data-movement rule: on TPU, P-sized
    gathers/scatter-adds in a composed program lower to a row-at-a-time
    emitter (~1 ms per op at 131k points). Walk the traced frame program and
    assert every gather/scatter indexes far fewer rows than the point count
    (allowed: SPAD-level table maps, tile-head strided slices)."""
    from patchworkpp_tpu import init_state
    from patchworkpp_tpu.pipeline import make_frame_fn

    p = Params()
    cap = 16384
    fn = make_frame_fn(p, fused=fused, interpret=True)
    jx = jax.make_jaxpr(fn)(
        init_state(p), jnp.zeros((cap, 4), jnp.float32), jnp.int32(cap - 100)
    )

    offenders = []

    def walk(jaxpr):
        for eq in jaxpr.eqns:
            if eq.primitive.name in ("gather", "scatter", "scatter-add"):
                idx_rows = [
                    v.aval.shape[0]
                    for v in eq.invars
                    if hasattr(v.aval, "shape")
                    and len(v.aval.shape) == 2
                    and v.aval.shape[1] == 1
                ]
                rows = max(idx_rows, default=0)
                if rows > cap // 4:
                    offenders.append((eq.primitive.name, rows))
            for key, val in eq.params.items():
                if key in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr",
                           "branches"):
                    for x in val if isinstance(val, (list, tuple)) else [val]:
                        walk(x.jaxpr if hasattr(x, "jaxpr") else x)

    walk(jx.jaxpr)
    assert not offenders, f"P-scale gathers/scatters found: {offenders}"


def test_z_sort_key_bijection():
    """z_sort_key is order-preserving on NaN-free f32 and exactly invertible
    (incl. +/-0, +/-inf, subnormals, extremes)."""
    from patchworkpp_tpu.ops.segments import z_sort_key, z_sort_key_inverse

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.standard_normal(4096).astype(np.float32) * 1e3,
        np.float32([0.0, -0.0, np.inf, -np.inf, 1e-45, -1e-45,
                    np.finfo(np.float32).max, np.finfo(np.float32).min,
                    np.finfo(np.float32).tiny, -np.finfo(np.float32).tiny]),
    ])
    keys = np.asarray(z_sort_key(jnp.asarray(vals)))
    back = np.asarray(z_sort_key_inverse(jnp.asarray(keys)))
    np.testing.assert_array_equal(back.view(np.uint32), vals.view(np.uint32))
    # Key order must match float order. (-0.0 sorts just below +0.0 in key
    # space; float equality treats them as the same value, so elementwise
    # comparison of the two sorted sequences is tie-safe.)
    sv = np.sort(vals)
    sk = vals[np.argsort(keys, kind="stable")]
    assert not (sv != sk).any()
