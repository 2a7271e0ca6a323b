"""The jittable ground-segmentation frame step — the heart of the engine.

TPU-first inversion of the reference design (reference driver:
cpp/patchworkpp/src/patchworkpp.cpp:151-336): instead of a sequential triple
loop over 504 ragged patches with per-patch sorts/SVDs, a frame is one
fixed-shape tensor program:

- one fused per-point pass (RNR + CZM binning)                 [C3, C4]
- one global (patch, z) sort replacing 504 per-patch sorts     [C5]
- LPR/seed selection as segmented rank + MXU reductions        [C6]
- R-VPF / R-GPF as statically unrolled masked iterations whose
  plane fits are batched masked moment reductions + a batched
  closed-form 3x3 eigensolve over all patches at once          [C7, C8, C9]
- A-GLE as a vectorized per-patch cascade                      [C10]
- TGR + threshold adaptation as small dense ops over the
  4 rings of interest, with the adaptive state an explicit
  functional pytree (AdaptiveState) threaded through           [C11, C12]

Data movement discipline (the perf-critical design rule): NO P-sized gathers
or scatter-adds anywhere — on TPU those lower to a row-at-a-time emitter
(~1 ms per op at 131k points). Every patch->point broadcast and point->patch
reduction is a one-hot MXU matmul (ops/onehot.py), and the final labels are
recomputed directly in original point order from small per-patch plane
tables, so no inverse-permutation scatter exists either.

Semantics match the reference per component C1-C13 of SURVEY.md §2,
including its quirks (signed R-GPF distance test, zone-0 LPR margin,
plane-state carry on empty fits, TGR's cross-ring flatness leak, the
flatness-update break). Validated against the golden-exact NumPy oracle and
the C++ golden index sets.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patchworkpp_tpu.params import CZMGeometry, Params
from patchworkpp_tpu.state import AdaptiveState
from patchworkpp_tpu.ops.binning import (
    bin_points,
    factored_patch_counts,
    supports_factored_counts,
)
from patchworkpp_tpu.ops.onehot import (
    SPAD,
    patch_lookup,
    patch_lookup_cols,
    patch_reduce,
)
from patchworkpp_tpu.ops.segments import (
    SortedPoints,
    patch_counts,
    segment_rank,
    sort_by_patch,
)
from patchworkpp_tpu.ops.moments import (
    masked_moment_features_cols,
    moments_to_mean_cov,
)
from patchworkpp_tpu.ops.eigen3 import eigh3x3_descending

_F32_MAX = np.float32(np.finfo(np.float32).max)

# Row-block size of the original-order label replay (the r5 dense-scan
# fix — see _finalize._replay). Past ~131k rows XLA stops fusing the
# (3C, P) lookup dot into its replay consumers (the x4 cliff); BELOW that
# the block size is a measured perf knob — on-chip sweep (x1 3000-frame
# group medians, scans/s): 131072 -> 1774.9, 65536 -> 1815.7 (+2.3%),
# 32768 -> 1812.3, 16384 -> 1787.8; at x4 density 65536 == 131072
# (504.2/503.9) and 32768 slightly worse. 65536 is the optimum at both
# densities. Module-level so tests can shrink it to exercise the
# multi-block and uneven-last-block paths on small clouds.
_REPLAY_BLOCK = 65536


class FrameResult(NamedTuple):
    """Per-frame outputs (original point order)."""

    ground_mask: jnp.ndarray     # (P,) bool; padding rows are False
    num_ground: jnp.ndarray      # () int32
    patch_mean: jnp.ndarray      # (NP, 3) final per-patch plane centroid
    patch_normal: jnp.ndarray    # (NP, 3) final per-patch plane normal
    patch_svals: jnp.ndarray     # (NP, 3) eigenvalues desc (flatness = [...,2])
    patch_processed: jnp.ndarray # (NP,) bool — had >= num_min_pts points


class StaticTables(NamedTuple):
    """Host-precomputed per-patch constants (closed over as jit constants).
    All padded to the geometry's ``spad``-wide patch space (num_patches +
    overflow + lane pad; 512 for the default 504-patch CZM)."""

    zone: np.ndarray        # (S,) int32 zone of each patch
    cring: np.ndarray       # (S,) int32 concentric ring (0..13); pad -> 14
    shift: np.ndarray       # (S, 3) f32 static centering offset per patch
    ring_slices: Tuple[Tuple[int, int], ...]  # (start, stop) per ring of interest
    max_ring_patches: int   # pad width for ring-of-interest arrays
    num_zone0: int          # patches in zone 0 (their flat ids are [0, num_zone0))


def build_static_tables(params: Params, geom: CZMGeometry) -> StaticTables:
    """Patch space scales with the CZM: any ring/sector vectors work, as in
    the reference ctor (patchworkpp.h:104-134) — geom.spad rounds
    num_patches + 1 up to a lane multiple (512 for the default CZM)."""
    p = params
    npz = geom.num_patches
    spad = geom.spad
    if npz > 65536:
        raise ValueError(
            f"CZM has {npz} patches; refusing configs past 65536 (the dense "
            "per-patch tables and one-hot movement would dwarf the points)"
        )
    zone = np.full(spad, p.num_zones - 1, np.int32)
    zone[:npz] = geom.patch_zone()
    cring = np.full(spad, geom.num_concentric_rings, np.int32)
    cring[:npz] = geom.patch_concentric_ring()

    # Static per-patch centering offset: the patch's geometric center at the
    # nominal ground height. Only used to keep f32 covariance well conditioned;
    # any fixed offset is semantically neutral.
    shift = np.zeros((spad, 3), np.float32)
    sector = geom.patch_sector()
    lo = np.asarray(geom.min_ranges)
    for pid in range(npz):
        k = int(zone[pid])
        ring_in_zone = (pid - geom.zone_patch_offset[k]) // p.num_sectors_each_zone[k]
        r_mid = lo[k] + (ring_in_zone + 0.5) * geom.ring_sizes[k]
        th_mid = (sector[pid] + 0.5) * geom.sector_sizes[k]
        shift[pid] = [r_mid * np.cos(th_mid), r_mid * np.sin(th_mid), -p.sensor_height]

    ring_slices = []
    for ci in range(p.num_rings_of_interest):
        sel = np.flatnonzero(cring[:npz] == ci)
        ring_slices.append((int(sel[0]), int(sel[-1]) + 1))
    max_rp = max(b - a for a, b in ring_slices)
    num_zone0 = p.num_rings_each_zone[0] * p.num_sectors_each_zone[0]
    return StaticTables(
        zone=zone,
        cring=cring,
        shift=shift,
        ring_slices=tuple(ring_slices),
        max_ring_patches=max_rp,
        num_zone0=num_zone0,
    )


class _PlaneCarry(NamedTuple):
    """Per-patch plane-fit state with the reference's staleness semantics:
    an empty fit leaves the previous values in place (patchworkpp.cpp:49)."""

    n: jnp.ndarray       # (S,) last successful fit's point count
    mean: jnp.ndarray    # (S, 3)
    normal: jnp.ndarray  # (S, 3)
    d: jnp.ndarray       # (S,)
    svals: jnp.ndarray   # (S, 3)


class FrameComm:
    """Cross-shard communication hooks for the frame step.

    The default (this class) is the single-device identity. The point-sharded
    SPMD path (parallel/point_sharded.py) overrides these with psums /
    all-gathers over the mesh axis: per-patch statistics are the *only*
    cross-shard state, a few hundred KB per frame over ICI.
    """

    is_sharded = False

    def row_offset(self, n_local: int) -> jnp.ndarray:
        """Global row index of this shard's first point."""
        return jnp.int32(0)

    def reduce_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sum a per-patch statistic across shards."""
        return x

    def lpr_stats(self, sp: SortedPoints, elig: jnp.ndarray, num_lpr: int):
        """(sum, count) of each patch's num_lpr globally-lowest eligible z."""
        rank = segment_rank(elig, sp)
        tf = jnp.where(elig & (rank < num_lpr), 1.0, 0.0)
        # sp.start is (spad + 1,): recover the patch-space width from it so
        # the stats table matches the caller's geometry (any CZM size).
        sums = patch_reduce(
            jnp.stack([sp.z * tf, tf], axis=1), sp.patch_id,
            sp.start.shape[0] - 1,
        )
        return sums[:, 0], sums[:, 1]

    def merge_lpr_table(self, z_at_rank, occ, elig_cnt, num_lpr: int):
        """Merge per-shard dense LPR candidate tables (the tiled engine's
        hook, ops/tiled_fit.py): (S, num_lpr) z at each local rank slot +
        occupancy + (S,) local eligible count -> global (lpr_sum, lpr_cnt).

        Identity form — the CONTRACT definition for custom comms (pinned by
        tests/test_sharded.py::test_merge_lpr_table_contract): the local
        table IS the global candidate set; sum the occupied slots in rank
        (= z-ascending) order over min(count, num_lpr). Note the tiled
        engine's single-device fast path computes the same quantities
        through a cheaper 2-column reduction without building the table
        (ops/tiled_fit.py), so on the identity comm this method is the
        semantic reference, not the executed code."""
        s = jnp.sum(jnp.where(occ > 0.5, z_at_rank, 0.0), axis=1)
        return s, jnp.minimum(elig_cnt, jnp.float32(num_lpr))


def _fit_planes(
    carry: _PlaneCarry,
    sp: SortedPoints,
    q: tuple,  # (qx, qy, qz) full-lane (P,) shifted-coordinate columns
    mask_f: jnp.ndarray,
    patch_gate: jnp.ndarray,
    shift: jnp.ndarray,
    comm: "FrameComm",
):
    """Batched masked PCA plane fit with carry (reference estimate_plane :47-75).

    ``mask_f`` (P,) f32 0/1 selects the fit's points (already gated per patch
    by the caller via lookup channels); ``patch_gate`` (S,) bool limits which
    patches may update. Patches whose masked count is zero keep their
    previous plane. Returns (new_carry, raw_count).
    """
    qx, qy, qz = q
    mom = comm.reduce_patches(
        patch_reduce(
            masked_moment_features_cols(qx, qy, qz, mask_f), sp.patch_id,
            shift.shape[0],
        )
    )
    n, mean, cov = moments_to_mean_cov(mom, shift)
    svals, normal = eigh3x3_descending(cov)
    d = -jnp.sum(normal * mean, axis=-1)
    # A 1-point fit divides by n-1 == 0: NaN cov -> NaN plane (the reference
    # hits the same 0/0, patchworkpp.cpp:47-75, and its NaN plane simply
    # fails every comparison FOR THAT PATCH). Here the plane is broadcast
    # through one-hot dots where a single NaN row poisons EVERY point's
    # lookup (0 * NaN = NaN in the contraction), so replace a non-finite
    # plane with the sentinel [0,0,0,1e30]: per consumer it reproduces the
    # reference's NaN decisions exactly — dist 1e30 fails `< th` and
    # `|.| < th_dist_v`, uprightness 0 fails `> 0.707`, heading 0 fails
    # `< 0` — while staying finite through the movement. (svals keep their
    # NaN: they ride per-patch scalars, never lookups.) MUST stay
    # decision-identical to ops/pallas/fit_kernel.apply_plane_sentinel —
    # the fused == unfused label invariant depends on it.
    fin = jnp.isfinite(normal).all(axis=-1) & jnp.isfinite(d)
    normal = jnp.where(fin[:, None], normal, 0.0)
    d = jnp.where(fin, d, jnp.float32(1e30))
    upd = patch_gate & (n > 0)
    u3 = upd[:, None]
    new_carry = _PlaneCarry(
        n=jnp.where(upd, n, carry.n),
        mean=jnp.where(u3, mean, carry.mean),
        normal=jnp.where(u3, normal, carry.normal),
        d=jnp.where(upd, d, carry.d),
        svals=jnp.where(u3, svals, carry.svals),
    )
    return new_carry, n


def _seed_mask(
    sp: SortedPoints,
    active: jnp.ndarray,
    zone0_pt: jnp.ndarray,
    gate_tab: jnp.ndarray,
    sensor_height: jnp.ndarray,
    th_seed: float,
    params: Params,
    comm: FrameComm,
) -> jnp.ndarray:
    """Initial-seed selection over the active set (reference :77-149).

    LPR = mean z of the lowest <= num_lpr active points, where zone-0 patches
    first skip points below margin * sensor_height; seeds are all active
    points with z < LPR + th_seed (the margin does NOT filter seeds).
    ``gate_tab`` (S,) f32 gates the produced seed mask per patch.
    Returns an f32 0/1 mask.
    """
    margin_thr = jnp.float32(params.adaptive_seed_selection_margin) * sensor_height
    elig = active & (~zone0_pt | (sp.z >= margin_thr))
    lpr_sum, lpr_cnt = comm.lpr_stats(sp, elig, params.num_lpr)
    lpr = jnp.where(lpr_cnt > 0, lpr_sum / jnp.maximum(lpr_cnt, 1.0), 0.0)
    look = patch_lookup(jnp.stack([lpr, gate_tab], axis=1), sp.patch_id)
    seed = active & (sp.z < look[:, 0] + jnp.float32(th_seed)) & (look[:, 1] > 0.5)
    return jnp.where(seed, 1.0, 0.0)


_COORD_SANE = np.float32(1e9)  # meters; LiDAR returns are < a few hundred


def _sanitize_nonfinite(points: jnp.ndarray) -> jnp.ndarray:
    """Zero rows whose coordinates are non-finite or absurdly large: they
    become out-of-range (r = 0 < min_range) and go straight to nonground,
    excluded from every statistic.

    DELIBERATE deviation from the reference: all patch<->point movement here
    is one-hot MXU contractions, where a single NaN/Inf row poisons EVERY
    patch's moments (0 * NaN = NaN along the contraction axis) — one bad
    point would corrupt the whole frame AND the adaptive state. Coordinates
    past ~2e19 produce the same Inf through their f32 squares in
    moment_features, so the gate is |coord| < 1e9 (NaN/Inf fail it too);
    any surviving value keeps all downstream f32 sums finite
    (1e18 * 131072 << f32 max), and finite garbage stays contained to its
    own patch. The reference instead lets a non-finite z poison its own
    patch's plane fit and then pushes NaN into the threshold buffers
    (update_elevation_thr, patchworkpp.cpp:338-361), silently breaking all
    future adaptation — upstream fragility, not behavior worth replicating.
    Sane inputs (all KITTI golden scans) are byte-identical either way."""
    ok = (jnp.abs(points[:, :3]) < _COORD_SANE).all(axis=1)
    return jnp.where(ok[:, None], points, 0.0)


def _masked_mean_stdev_rows(vals: jnp.ndarray, mask: jnp.ndarray):
    """Row-batched reference calc_mean_stdev (:557-566): reduces the LAST
    axis; rows with n <= 1 yield zeros, else sample stdev (n-1 denominator).

    One batched reduction set for all rings of interest replaces the
    per-ring scalar reductions (each dispatched op on TPU costs more than
    the 4-row arithmetic it performs)."""
    m = mask.astype(jnp.float32)
    n = jnp.sum(m, axis=-1)
    # Select-before-multiply: masked-out slots may hold NaN (0 * NaN = NaN).
    vals = jnp.where(mask, vals, 0.0)
    mean = jnp.sum(vals, axis=-1) / jnp.maximum(n, 1.0)
    var = jnp.sum(jnp.square(vals - mean[..., None]) * m, axis=-1) / jnp.maximum(
        n - 1.0, 1.0
    )
    ok = n > 1
    z = jnp.zeros_like(mean)
    return jnp.where(ok, mean, z), jnp.where(ok, jnp.sqrt(var), z), n


def _compact_rows(vals: jnp.ndarray, acc_mask: jnp.ndarray) -> jnp.ndarray:
    """Front-compact each row's mask-true entries, preserving order.

    out[r, j] = the j-th mask-true value of row r (zeros beyond) — the
    batched replacement for the reference's per-ring push_back loop. One
    fused compare-select-reduce over (R, w, w); no sort, no gather. Exact:
    every output slot has at most one contributing addend."""
    m = acc_mask.astype(jnp.float32)
    pos = jnp.cumsum(m, axis=1) - m  # exclusive rank among mask-true
    j = jnp.arange(vals.shape[1], dtype=pos.dtype)
    sel = jnp.where(acc_mask[:, :, None] & (pos[:, :, None] == j), 1.0, 0.0)
    # Select-before-multiply: a non-finite value at a mask-FALSE slot (e.g.
    # a rejected patch's NaN flatness) must not ride 0 * NaN into the sum.
    vals = jnp.where(acc_mask, vals, 0.0)
    return jnp.sum(vals[:, :, None] * sel, axis=1)


def _write_at(buf: jnp.ndarray, cnt: jnp.ndarray, vals_c: jnp.ndarray) -> jnp.ndarray:
    """out[r] = buf[r] with vals_c[r] added starting at offset cnt[r].

    Relies on the zeros-beyond-count invariant (buf[r, j] == 0 for
    j >= cnt[r]), which turns the batched dynamic-offset write into a
    one-hot select + add over (R, cap, w) — no scatter, no per-ring
    dynamic_update_slice. Writes running past cap are dropped (unreachable:
    the trim safety valve keeps cnt <= cap - w)."""
    cap = buf.shape[1]
    w = vals_c.shape[1]
    rel = jnp.arange(cap)[None, :, None] - cnt[:, None, None]  # (R, cap, 1)
    sel = jnp.where(rel == jnp.arange(w)[None, None, :], 1.0, 0.0)
    return buf + jnp.sum(vals_c[:, None, :] * sel, axis=2)


def make_frame_fn(
    params: Params,
    geom: CZMGeometry | None = None,
    comm: FrameComm | None = None,
    fused: bool | None = None,
    interpret: bool = False,
):
    """Build the pure frame step ``fn(state, points, npts) -> (state, FrameResult)``.

    ``points`` is (P, 4) float32 (padded), ``npts`` () int32. The returned
    function is jit-compatible and shape-polymorphic only in P. With a
    mesh-aware ``comm`` it runs as the per-shard body of a point-sharded
    shard_map (points = this shard's rows, npts = global count).

    ``fused`` selects the single-kernel Pallas fit loop over the tiled patch
    layout (ops/pallas/fit_kernel.py) — the fast path on TPU. Default: auto
    (TPU and no point sharding). ``interpret`` runs the kernel in interpreter
    mode (CPU testing).
    """
    p = params
    geom = geom or CZMGeometry.create(p)
    comm = comm or FrameComm()
    sharded = comm is not None and getattr(comm, "is_sharded", False)
    if fused is None:
        # Auto: the TILED engine is the product path on EVERY backend — the
        # fused grid kernel's layout/pass program composed in XLA
        # (ops/tiled_fit.py), no Pallas dependency. Measured: on the v5e
        # chip 1815.7 scans/s (r5) vs the Mosaic grid kernel's 1192 (XLA
        # overlaps the per-pass HBM traffic and drops the ~110 s Mosaic
        # compile) and it is the only fused path that runs under point
        # sharding; on CPU it is ~10x the unfused sorted-layout path
        # (341 ms vs 3500 ms per full-res frame, 5x faster compile). All
        # paths pass the same 12/12 golden gates (on-chip and CPU). The
        # grid kernel stays available as fused='grid', the sorted-layout
        # path as fused=False.
        fused = "tiled"
    if fused is True:
        fused = "grid"
    if fused not in (False, "grid", "grid_iota", "onehot", "tiled"):
        raise ValueError(
            f"unknown fused mode {fused!r}: expected False, True/'grid', "
            "'grid_iota' (in-kernel static prefix triangle), 'tiled' (the "
            "XLA tiled engine — the shardable fused path), or 'onehot' "
            "(the 'scan' variant was removed)"
        )
    if sharded and fused not in (False, "tiled"):
        raise ValueError(
            f"fused={fused!r} is a single-chip Pallas kernel and cannot run "
            "under a point-sharded comm; use fused='tiled' (the same tiled "
            "design composed in XLA so cross-shard collectives interleave "
            "at pass boundaries) or fused=False"
        )
    tables = build_static_tables(p, geom)
    npz = geom.num_patches
    spad = geom.spad
    if spad != SPAD and fused in ("grid", "grid_iota", "onehot"):
        raise ValueError(
            f"fused={fused!r} is a Pallas kernel compiled for the native "
            f"{SPAD}-patch space, but this CZM needs spad={spad} "
            f"({npz} patches); use fused='tiled' (default) or fused=False"
        )
    if (
        fused in ("grid", "grid_iota", "onehot")
        and p.enable_RVPF
        and p.num_iter > 3
    ):
        raise ValueError(
            f"fused={fused!r} is a Pallas kernel with a fixed 3-snapshot "
            f"R-VPF output layout, but num_iter={p.num_iter} needs "
            f"{p.num_iter} snapshots; use fused='tiled' (default) or "
            f"fused=False"
        )

    # The batched FIFO append (_write_at) drops writes that would run past
    # BUF_CAP; that is unreachable only while the post-trim count stays
    # <= BUF_CAP - (max new samples per frame). Reject configs that could
    # silently lose samples instead.
    from patchworkpp_tpu.state import BUF_CAP

    _max_storage_ok = BUF_CAP - tables.max_ring_patches
    for _nm in ("max_elevation_storage", "max_flatness_storage"):
        if getattr(p, _nm) > _max_storage_ok:
            raise ValueError(
                f"{_nm}={getattr(p, _nm)} exceeds {_max_storage_ok} "
                f"(BUF_CAP={BUF_CAP} minus the {tables.max_ring_patches} "
                "samples a ring can add per frame); the adaptive buffers "
                "would silently drop samples"
            )

    zone_tab = jnp.asarray(tables.zone)
    cring_tab = jnp.asarray(tables.cring)
    shift_tab = jnp.asarray(tables.shift)
    sid = jnp.arange(spad, dtype=jnp.int32)


    def _finalize(
        state, normal, mean, svals, n_carry, g_count, processed, proc_f,
        final_plane_tab, vpf_tables, pid_o, xyz_cols, npoints,
    ):
        """Shared tail: A-GLE cascade, TGR, state update, original-order labels."""
        uprightness = normal[:, 2]
        elevation = mean[:, 2]
        flatness = svals[:, 2]
        sv0, sv1 = svals[:, 0], svals[:, 1]
        line_variable = jnp.where(sv1 != 0, sv0 / sv1, _F32_MAX)
        heading = jnp.sum(mean * normal, axis=-1)

        is_upright = uprightness > jnp.float32(p.uprightness_thr)
        is_near = cring_tab < p.num_rings_of_interest
        ring_idx = jnp.minimum(cring_tab, p.num_rings_of_interest - 1)
        is_not_elevated = is_near & (elevation < state.elevation_thr[ring_idx])
        is_flat = is_near & (flatness < state.flatness_thr[ring_idx])
        heading_out = heading < 0.0

        accept = processed & is_upright & is_not_elevated & is_near
        ground_patch = (
            processed
            & is_upright
            & (~is_near | (heading_out & (is_not_elevated | is_flat)))
        )
        candidate = (
            processed
            & is_upright
            & is_near
            & heading_out
            & ~is_not_elevated
            & ~is_flat
        )

        # ---- TGR per ring of interest (C12, reference :291-304, :402-464).
        # ringwise_flatness is only flushed on rings that actually had
        # candidates, so accepted flatness can span several rings (quirk).
        n_roi = p.num_rings_of_interest
        w = tables.max_ring_patches
        ring_flat = jnp.zeros((n_roi, w), jnp.float32)
        ring_acc = jnp.zeros((n_roi, w), bool)
        ring_elev = jnp.zeros((n_roi, w), jnp.float32)
        for ci, (a, b) in enumerate(tables.ring_slices):
            s = b - a
            ring_flat = ring_flat.at[ci, :s].set(flatness[a:b])
            ring_acc = ring_acc.at[ci, :s].set(accept[a:b])
            ring_elev = ring_elev.at[ci, :s].set(elevation[a:b])

        revert_patch = jnp.zeros(spad, bool)
        if p.enable_TGR:
            # All rings at once: the only loop-carried value in the
            # reference's per-ring revert (:291-304) is which rings' accepted
            # flatness the mu_F window spans, and that is a cumulative max of
            # "last ring with candidates", not a true dependency.
            ring_cand = jnp.zeros((n_roi, w), bool)
            ring_gcnt = jnp.zeros((n_roi, w), jnp.float32)
            ring_linev = jnp.zeros((n_roi, w), jnp.float32)
            for ci, (a, b) in enumerate(tables.ring_slices):
                s = b - a
                ring_cand = ring_cand.at[ci, :s].set(candidate[a:b])
                ring_gcnt = ring_gcnt.at[ci, :s].set(g_count[a:b])
                ring_linev = ring_linev.at[ci, :s].set(line_variable[a:b])

            # flush_from AT ring ci = 1 + the last ring j < ci that had
            # candidates (0 if none): an exclusive cumulative max.
            ring_ids = jnp.arange(n_roi, dtype=jnp.int32)
            has_cand = jnp.any(ring_cand, axis=1)
            adv = jnp.where(has_cand, ring_ids + 1, 0)
            ff = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jax.lax.cummax(adv)[:-1]]
            )
            include = (ring_ids[None, :] >= ff[:, None]) & (
                ring_ids[None, :] <= ring_ids[:, None]
            )  # (target ring, source ring)
            m = ring_acc[None, :, :] & include[:, :, None]
            mean_f, stdev_f, _ = _masked_mean_stdev_rows(
                jnp.broadcast_to(ring_flat[None], m.shape).reshape(n_roi, -1),
                m.reshape(n_roi, -1),
            )
            mu = (mean_f + 1.5 * stdev_f)[:, None]
            F = ring_flat
            prob_flat = 1.0 / (1.0 + jnp.exp((F - mu) / (mu / 10.0)))
            big_flat = (ring_gcnt > 1500) & (
                F < jnp.float32(p.th_dist * p.th_dist)
            )
            prob_flat = jnp.where(big_flat, 1.0, prob_flat)
            prob_line = jnp.where(ring_linev > 8.0, 0.0, 1.0)
            revert_ring = ring_cand & (prob_line * prob_flat > 0.5)
            for ci, (a, b) in enumerate(tables.ring_slices):
                revert_patch = revert_patch.at[a:b].set(revert_ring[ci, : b - a])

        # ---- adaptive threshold update (C11, reference :338-375) ----
        new_state = _update_state(state, p, ring_acc, ring_elev, ring_flat)

        # ---- per-point labels, computed directly in ORIGINAL order (C13).
        # Replays the peel tests and the final distance test against the saved
        # per-patch plane tables — no inverse-permutation scatter. The table
        # is kept narrow (17 cols) since the per-point lookup and its readback
        # are HBM-bound: the two flags pack into one code column
        # (2*processed + ground), and each R-VPF snapshot's gate folds into a
        # sentinel plane [0,0,0,1e30] whose |distance| can never pass the
        # peel threshold.
        patch_ground_f = jnp.where(ground_patch | revert_patch, 1.0, 0.0)
        code = 2.0 * proc_f + patch_ground_f
        sentinel = jnp.asarray([0.0, 0.0, 0.0, 1e30], jnp.float32)
        vpf_cols = [
            jnp.where(t[:, 4:5] > 0.5, t[:, 0:4], sentinel[None, :])
            for t in vpf_tables
        ]
        label_tab = jnp.concatenate(
            [final_plane_tab, code[:, None]] + vpf_cols, axis=1
        )
        # Transposed-output lookup: lk rows are full-lane (P,) vectors, so
        # the replay math below runs at 128/128 lane utilization instead of
        # minor-dim-3 slices of a (P, 17) array (measured ~45 us/frame per
        # minor-dim-4 elementwise op at P=131k). The 12 R-VPF columns ride
        # the SAME spad-wide lookup deliberately: splitting them onto a
        # narrow 64-row zone-0 table (one extra (P, 64) one-hot + K=64 dot
        # + sentinel clamp) measured stage_gle_tail 0.106 -> 0.113 ms and
        # wall 1650 -> 1642 scans/s on chip (round 4) — the wide lookup's
        # marginal columns are cheaper than a second movement op, the same
        # lesson as the gated factored lookup (ops/onehot.py).
        x_o, y_o, z_o = xyz_cols

        def _replay(pid_b, xb, yb, zb):
            lk = patch_lookup_cols(label_tab, pid_b)  # (17, B)

            def _plane_dist(c0):
                return (
                    (xb * lk[c0] + yb * lk[c0 + 1]) + zb * lk[c0 + 2]
                ) + lk[c0 + 3]

            dist_o = _plane_dist(0)
            in_proc = lk[4] > 1.5
            peeled = jnp.zeros(pid_b.shape[0], bool)
            for it in range(len(vpf_tables)):
                dist_v = _plane_dist(5 + 4 * it)
                peeled = peeled | (jnp.abs(dist_v) < jnp.float32(p.th_dist_v))
            return (
                in_proc
                & ~peeled
                & (dist_o < jnp.float32(p.th_dist))
                & (lk[4] > 2.5)
            )

        # ROW-BLOCKED replay for dense scans: past ~131k rows XLA stops
        # fusing the (3C, P) lookup dot into its replay consumers and the
        # stage goes HBM-bound on the materialized intermediate — measured
        # on chip at 524k rows: stage_gle_tail 1.136 ms/frame vs 0.106 at
        # 131k (10.7x for 4x rows; the three big fusions sum to ~1.0 ms ~=
        # the 107 MB (51, P) round trip at HBM bandwidth). Each row's label
        # depends only on its own lookups, so computing the tail in <=131k
        # row blocks is bitwise identical and restores the 131k fusion
        # shape per block. No-op (single block) at the default capacity.
        blk = _REPLAY_BLOCK
        if npoints > blk:
            ground = jnp.concatenate([
                _replay(
                    pid_o[s : s + blk], x_o[s : s + blk],
                    y_o[s : s + blk], z_o[s : s + blk],
                )
                for s in range(0, npoints, blk)
            ])
        else:
            ground = _replay(pid_o, x_o, y_o, z_o)

        result = FrameResult(
            ground_mask=ground,
            num_ground=comm.reduce_patches(jnp.sum(ground).astype(jnp.int32)),
            patch_mean=mean[:npz],
            patch_normal=normal[:npz],
            patch_svals=svals[:npz],
            patch_processed=processed[:npz],
        )
        return new_state, result

    def frame(state: AdaptiveState, points: jnp.ndarray, npts: jnp.ndarray):
        points = _sanitize_nonfinite(points.astype(jnp.float32))
        npts = jnp.asarray(npts, jnp.int32) - comm.row_offset(points.shape[0])

        # ---- per-point: RNR + CZM (C3, C4) ----
        # (named scopes label HLO ops for the per-stage device-time split —
        # utils/roofline.py aggregates them; the reference's analog is the
        # verbose czm/sort/pca/gle clock() split, patchworkpp.cpp:320-333)
        with jax.named_scope("stage_rnr_czm"):
            bins = bin_points(points, npts, state.sensor_height, p, geom)
        pid_o = bins.patch_id

        # ---- global (patch, z) sort (C5) ----
        with jax.named_scope("stage_sort"):
            sp = sort_by_patch(
                points[:, 0], points[:, 1], points[:, 2], pid_o, spad
            )
        counts = comm.reduce_patches(patch_counts(sp))
        processed = (counts >= p.num_min_pts) & (sid < npz)
        proc_f = jnp.where(processed, 1.0, 0.0)

        pid_s = sp.patch_id
        zone0_pt = pid_s < tables.num_zone0  # zone-0 patches are flat ids [0, 32)
        shl = patch_lookup_cols(shift_tab, pid_s)  # (3, P)
        q = (sp.x - shl[0], sp.y - shl[1], sp.z - shl[2])
        active = patch_lookup(proc_f[:, None], pid_s)[:, 0] > 0.5

        carry = _PlaneCarry(
            n=jnp.zeros(spad, jnp.float32),
            mean=jnp.zeros((spad, 3), jnp.float32),
            normal=jnp.zeros((spad, 3), jnp.float32),
            d=jnp.zeros(spad, jnp.float32),
            svals=jnp.zeros((spad, 3), jnp.float32),
        )

        # Saved per-iteration plane tables for the original-order label pass.
        vpf_tables = []

        # ---- R-VPF: peel vertical planes, zone 0 only (C8, reference :477-508).
        # A patch stays "alive" while (zone == 0 and the fit is not upright);
        # every patch gets >= 1 fit (matching the reference's fit-then-break).
        if p.enable_RVPF:
            with jax.named_scope("stage_rvpf"):
                alive = processed
                for _ in range(p.num_iter):
                    alive_f = jnp.where(alive, 1.0, 0.0)
                    seeds_f = _seed_mask(
                        sp, active, zone0_pt, alive_f, state.sensor_height,
                        p.th_seeds_v, p, comm,
                    )
                    carry, _ = _fit_planes(
                        carry, sp, q, seeds_f, alive, shift_tab, comm
                    )
                    vert = (
                        alive
                        & (sid < tables.num_zone0)
                        & (carry.normal[:, 2] < jnp.float32(p.uprightness_thr))
                    )
                    vert_f = jnp.where(vert, 1.0, 0.0)
                    plane_tab = jnp.concatenate(
                        [carry.normal, carry.d[:, None], vert_f[:, None]], axis=1
                    )
                    vpf_tables.append(plane_tab)
                    look = patch_lookup_cols(plane_tab, pid_s)  # (5, P)
                    dist = (
                        (sp.x * look[0] + sp.y * look[1]) + sp.z * look[2]
                    ) + look[3]
                    peel = (
                        active
                        & (look[4] > 0.5)
                        & (jnp.abs(dist) < jnp.float32(p.th_dist_v))
                    )
                    active = active & ~peel
                    alive = vert

        # ---- R-GPF: iterative ground plane refinement (C9, reference :510-543).
        with jax.named_scope("stage_rgpf"):
            seeds_f = _seed_mask(
                sp, active, zone0_pt, proc_f, state.sensor_height, p.th_seeds,
                p, comm,
            )
            carry, _ = _fit_planes(carry, sp, q, seeds_f, processed, shift_tab, comm)
            g_f = jnp.zeros(points.shape[0], jnp.float32)
            g_count = jnp.zeros(spad, jnp.float32)
            final_plane_tab = None
            for i in range(p.num_iter):
                plane_tab = jnp.concatenate([carry.normal, carry.d[:, None]], axis=1)
                if i == p.num_iter - 1:
                    final_plane_tab = plane_tab
                look = patch_lookup_cols(plane_tab, pid_s)  # (4, P)
                dist = (
                    (sp.x * look[0] + sp.y * look[1]) + sp.z * look[2]
                ) + look[3]
                g_f = jnp.where(
                    active & (dist < jnp.float32(p.th_dist)), 1.0, 0.0
                )  # signed test (:525)
                carry, g_count = _fit_planes(
                    carry, sp, q, g_f, processed, shift_tab, comm
                )

        with jax.named_scope("stage_gle_tail"):
            return _finalize(
                state, carry.normal, carry.mean, carry.svals, carry.n, g_count,
                processed, proc_f, final_plane_tab, vpf_tables, pid_o,
                (points[:, 0], points[:, 1], points[:, 2]), points.shape[0],
            )

    def frame_fused(state: AdaptiveState, points: jnp.ndarray, npts: jnp.ndarray):
        from patchworkpp_tpu.ops.tiled import build_tiled
        from patchworkpp_tpu.ops.pallas import fit_kernel as fk

        points = _sanitize_nonfinite(points.astype(jnp.float32))
        # Under a sharded comm this body is the PER-SHARD program: points
        # are this shard's rows, npts is the global count (mirrors frame()).
        npts = jnp.asarray(npts, jnp.int32) - comm.row_offset(points.shape[0])

        with jax.named_scope("stage_rnr_czm"):
            bins = bin_points(points, npts, state.sensor_height, p, geom)
        pid_o = bins.patch_id
        xyz_o = points[:, :3]

        with jax.named_scope("stage_sort"):
            tp = build_tiled(
                xyz_o,
                pid_o,
                counts=(
                    factored_patch_counts(bins, geom, spad)
                    if supports_factored_counts(geom)
                    else None  # exotic CZM: generic one-hot counts
                ),
                width=spad,
            )
        counts = comm.reduce_patches(tp.counts)
        processed = (counts >= p.num_min_pts) & (sid < npz)
        proc_f = jnp.where(processed, 1.0, 0.0)

        nt = tp.xyz.shape[0] // 128
        xs = tp.xyz[:, 0].reshape(nt, 128)
        ys = tp.xyz[:, 1].reshape(nt, 128)
        zs = tp.xyz[:, 2].reshape(nt, 128)
        valid_f = tp.valid.astype(jnp.float32).reshape(nt, 128)
        tile_patch = jnp.minimum(tp.tile_patch, spad - 1).reshape(nt, 1)

        # Col 4 carries the zone-0 flag so tile-level kernels can read it
        # from the per-tile gates lookup (sentinel tiles clamp to patch
        # SPAD-1, which is never zone 0). Cols 0-3 are shared with the
        # "onehot" kernel; it ignores col 4.
        zone0_f = (sid < tables.num_zone0).astype(jnp.float32)
        gates = jnp.concatenate(
            [
                proc_f[:, None], shift_tab, zone0_f[:, None],
                jnp.zeros((spad, 3), jnp.float32),
            ],
            axis=1,
        )
        margin_thr = (
            jnp.float32(p.adaptive_seed_selection_margin) * state.sensor_height
        )
        consts = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(margin_thr)

        if fused == "tiled":
            from patchworkpp_tpu.ops.tiled_fit import tiled_fit

            with jax.named_scope("stage_fused_fit"):
                out = tiled_fit(
                    xs, ys, zs, valid_f, tile_patch, gates,
                    margin_thr, params=p,
                    num_zone0_patches=tables.num_zone0, comm=comm,
                    spad=spad,
                )
                out = jnp.where(counts[:, None] > 0, out, 0.0)
        elif fused == "onehot":
            with jax.named_scope("stage_fused_fit"):
                out = fk.fused_fit(
                    xs, ys, zs, valid_f, tile_patch, gates, consts,
                    params=p, num_zone0_patches=tables.num_zone0,
                    interpret=interpret,
                )
        else:  # "grid" / "grid_iota" (default fused): patch-level output table
            from patchworkpp_tpu.ops.pallas import fit_kernel_grid as fkg

            with jax.named_scope("stage_fused_fit"):
                gates_t = patch_lookup(gates, tile_patch[:, 0])  # (NT, 8)
                out = fkg.fused_fit_grid(
                    xs, ys, zs, valid_f, tile_patch, gates_t, gates,
                    consts, params=p,
                    num_zone0_patches=tables.num_zone0,
                    interpret=interpret,
                    prefix_mode="iota" if fused == "grid_iota" else "lb",
                )
                out = jnp.where(counts[:, None] > 0, out, 0.0)

        normal = out[:, fk.OUT_NORMAL : fk.OUT_NORMAL + 3]
        d = out[:, fk.OUT_D]
        mean = out[:, fk.OUT_MEAN : fk.OUT_MEAN + 3]
        n_carry = out[:, fk.OUT_N]
        g_count = out[:, fk.OUT_GCOUNT]
        cov6 = out[:, fk.OUT_COV : fk.OUT_COV + 6]
        cov = jnp.stack(
            [
                jnp.stack([cov6[:, 0], cov6[:, 1], cov6[:, 2]], axis=-1),
                jnp.stack([cov6[:, 1], cov6[:, 3], cov6[:, 4]], axis=-1),
                jnp.stack([cov6[:, 2], cov6[:, 4], cov6[:, 5]], axis=-1),
            ],
            axis=-2,
        )
        svals, _ = eigh3x3_descending(cov)

        # Per-iteration R-VPF snapshots: kernel layout [gate,nx,ny,nz,d] ->
        # label-pass layout [nx,ny,nz,d,gate]. Offsets via out_layout: the
        # canonical fk.OUT_* for num_iter <= 3, extended for larger
        # num_iter (tiled engine only; the Pallas kernels are gated above).
        from patchworkpp_tpu.ops.tiled_fit import out_layout

        snap_off, carry2_off, _ = out_layout(p)
        vpf_tables = []
        if p.enable_RVPF:
            for it in range(p.num_iter):
                a = snap_off + it * 5
                snap = out[:, a : a + 5]
                vpf_tables.append(
                    jnp.concatenate([snap[:, 1:5], snap[:, 0:1]], axis=1)
                )
        final_plane_tab = out[:, carry2_off : carry2_off + 4]

        with jax.named_scope("stage_gle_tail"):
            return _finalize(
                state, normal, mean, svals, n_carry, g_count, processed, proc_f,
                final_plane_tab, vpf_tables, pid_o,
                (points[:, 0], points[:, 1], points[:, 2]), points.shape[0],
            )

    return frame_fused if fused else frame


def make_sequence_fn(
    params: Params,
    geom: CZMGeometry | None = None,
    comm: FrameComm | None = None,
    fused: bool | None = None,
    interpret: bool = False,
):
    """Build ``fn(state, stack, npts) -> (state, FrameResult)``: a
    lax.scan of the frame step over a (B, P, 4) stack of scans.

    Semantically identical to calling the frame fn B times in order (the
    adaptive state is the scan carry, so every frame depends on the
    previous — bitwise-equal states and labels), but the whole chain is ONE
    device program: one dispatch amortizes the per-call host/launch
    overhead across B frames (~0.3 ms/frame on a tunneled chip, still tens
    of us on directly attached hardware). This is the throughput driver for
    sequential streams — the reference's demo_sequential loop
    (python/examples/demo_sequential.py:30) with the dispatch hoisted out.

    Returns the final state and the full per-frame :class:`FrameResult`
    with a leading B axis on every field — masks (B, P) plus the per-patch
    centers/normals/eigenvalues the reference exposes through
    getCenters()/getNormals() (patchworkpp.h:154-163). The patch tables add
    ~20 KB/frame of stacked output (negligible next to the (B, P) masks),
    and a batched dispatch loses nothing vs the per-frame loop.
    """
    frame = make_frame_fn(
        params, geom=geom, comm=comm, fused=fused, interpret=interpret
    )

    def sequence(state: AdaptiveState, stack: jnp.ndarray, npts: jnp.ndarray):
        def step(st, xn):
            x, n = xn
            st2, res = frame(st, x, n)
            return st2, res

        return jax.lax.scan(step, state, (stack, npts))

    return sequence


def _append_rings(buf, cnt, vals_c, k, max_storage, do_trim, w):
    """Batched FIFO append + conditional trim for (R,) adaptive ring buffers.

    ``vals_c`` is (R, w) front-compacted new values (in patch/sector order —
    the reference pushes them in its sector loop), written at each row's
    offset ``cnt``. Trimming to ``max_storage`` drops the oldest (front), as
    erase(begin..) does. A safety valve trims even "frozen" rings just below
    capacity (the reference's unbounded vector can't overflow; our fixed
    buffer can).

    Returns ``(buf_pre, buf_post, cnt_new, n_total)``: the threshold stats
    must be computed on ``buf_pre`` over ``n_total`` entries — the reference
    trims AFTER computing mean/stdev (patchworkpp.cpp:354-355, :372-373) —
    while ``buf_post`` is the trimmed carry for the next frame, re-zeroed
    past the count. The post-trim front shift runs as a per-ring
    ``jnp.roll`` (a dynamic-slice pair; its batched one-hot form would risk
    materializing an (R, cap, cap) select tensor), everything else is one
    batched op set across rings.
    """
    cap = buf.shape[1]
    buf_pre = _write_at(buf, cnt, vals_c)
    n_total = cnt + k
    excess = jnp.where(
        do_trim,
        jnp.maximum(n_total - max_storage, 0),
        jnp.maximum(n_total - (cap - w), 0),
    )
    cnt_new = n_total - excess
    iota = jnp.arange(cap)
    rows = [
        jnp.roll(buf_pre[i], -excess[i]) for i in range(buf.shape[0])
    ]
    buf_post = jnp.where(
        iota[None, :] < cnt_new[:, None], jnp.stack(rows), 0.0
    )
    return buf_pre, buf_post, cnt_new, n_total


def _update_state(
    state: AdaptiveState,
    p: Params,
    ring_acc: jnp.ndarray,
    ring_elev: jnp.ndarray,
    ring_flat: jnp.ndarray,
) -> AdaptiveState:
    """End-of-frame adaptation (reference update_elevation_thr /
    update_flatness_thr :338-375), including the elevation ring-0 sensor
    height self-calibration and the flatness ``break`` freeze quirk.

    All rings update as ONE batched op set (the freeze cascade is a
    cumulative count of starved rings, not a loop-carried flag): the
    reference's two per-ring loops are pure bookkeeping, and dispatching
    them ring-by-ring cost more device time than the whole update's math.
    """
    n_roi = p.num_rings_of_interest
    cap = state.elev_buf.shape[1]
    w = ring_elev.shape[1]
    iota = jnp.arange(cap)

    k = jnp.sum(ring_acc, axis=1).astype(jnp.int32)  # (R,) new samples
    elev_c = _compact_rows(ring_elev, ring_acc)
    flat_c = _compact_rows(ring_flat, ring_acc)

    # Elevation: per-ring independent ('continue' on empty).
    buf_pre_e, buf_post_e, cnt_new_e, n_tot_e = _append_rings(
        state.elev_buf[:n_roi], state.elev_cnt[:n_roi], elev_c, k,
        p.max_elevation_storage, do_trim=jnp.full(n_roi, True), w=w,
    )
    mean_e, stdev_e, _ = _masked_mean_stdev_rows(
        buf_pre_e, iota[None, :] < n_tot_e[:, None]
    )
    # n_total==1 -> calc_mean_stdev leaves zeros -> thr=0 (and sh=-0).
    factor = jnp.asarray([3.0] + [2.0] * (n_roi - 1), jnp.float32)
    elev_thr = state.elevation_thr.at[:n_roi].set(
        jnp.where(
            n_tot_e > 0, mean_e + factor * stdev_e, state.elevation_thr[:n_roi]
        )
    )
    sh = jnp.where(n_tot_e[0] > 0, -mean_e[0], state.sensor_height)

    # Flatness: 'break' on a starved ring freezes all later rings —
    # do[i] = no ring j <= i was starved (inclusive cumulative freeze).
    n_tot_pre = state.flat_cnt[:n_roi] + k
    do = jnp.cumsum((n_tot_pre <= 1).astype(jnp.int32)) == 0
    buf_pre_f, buf_post_f, cnt_new_f, n_tot_f = _append_rings(
        state.flat_buf[:n_roi], state.flat_cnt[:n_roi], flat_c, k,
        p.max_flatness_storage, do_trim=do, w=w,
    )
    mean_f, stdev_f, _ = _masked_mean_stdev_rows(
        buf_pre_f, iota[None, :] < n_tot_f[:, None]
    )
    flat_thr = state.flatness_thr.at[:n_roi].set(
        jnp.where(do, mean_f + stdev_f, state.flatness_thr[:n_roi])
    )

    return AdaptiveState(
        sensor_height=sh,
        elevation_thr=elev_thr,
        flatness_thr=flat_thr,
        elev_buf=state.elev_buf.at[:n_roi].set(buf_post_e),
        elev_cnt=state.elev_cnt.at[:n_roi].set(cnt_new_e),
        flat_buf=state.flat_buf.at[:n_roi].set(buf_post_f),
        flat_cnt=state.flat_cnt.at[:n_roi].set(cnt_new_f),
    )


@functools.lru_cache(maxsize=8)
def _cached_frame_fn(params: Params):
    return jax.jit(make_frame_fn(params))


def segment(state: AdaptiveState, points, npts, params: Params):
    """Convenience jitted entry: one frame through cached compiled step."""
    fn = _cached_frame_fn(params)
    return fn(state, points, npts)
