"""The jittable ground-segmentation frame step — the heart of the engine.

TPU-first inversion of the reference design (reference driver:
cpp/patchworkpp/src/patchworkpp.cpp:151-336): instead of a sequential triple
loop over 504 ragged patches with per-patch sorts/SVDs, a frame is one
fixed-shape tensor program:

- one fused per-point pass (RNR + CZM binning)                 [C3, C4]
- one global (patch, z) sort replacing 504 per-patch sorts     [C5]
- LPR/seed selection as segmented rank + reductions            [C6]
- R-VPF / R-GPF as statically unrolled masked iterations whose
  plane fits are batched masked moment reductions + a batched
  closed-form 3x3 eigensolve over all patches at once          [C7, C8, C9]
- A-GLE as a vectorized per-patch cascade                      [C10]
- TGR + threshold adaptation as small dense ops over the
  4 rings of interest, with the adaptive state an explicit
  functional pytree (AdaptiveState) threaded through           [C11, C12]

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
from patchworkpp_tpu.ops.binning import bin_points
from patchworkpp_tpu.ops.segments import (
    SortedPoints,
    segment_rank,
    segment_sum_sorted,
    sort_by_patch,
)
from patchworkpp_tpu.ops.moments import masked_patch_moments, moments_to_mean_cov
from patchworkpp_tpu.ops.eigen3 import eigh3x3_descending

_F32_MAX = np.float32(np.finfo(np.float32).max)


class FrameResult(NamedTuple):
    """Per-frame outputs (original point order)."""

    ground_mask: jnp.ndarray     # (P,) bool; padding rows are False
    num_ground: jnp.ndarray      # () int32
    patch_mean: jnp.ndarray      # (NP, 3) final per-patch plane centroid
    patch_normal: jnp.ndarray    # (NP, 3) final per-patch plane normal
    patch_svals: jnp.ndarray     # (NP, 3) eigenvalues desc (flatness = [...,2])
    patch_processed: jnp.ndarray # (NP,) bool — had >= num_min_pts points


class StaticTables(NamedTuple):
    """Host-precomputed per-patch constants (closed over as jit constants)."""

    zone: np.ndarray        # (NP+1,) int32 zone of each patch
    cring: np.ndarray       # (NP+1,) int32 concentric ring (0..13); NP -> 14
    shift: np.ndarray       # (NP+1, 3) f32 static centering offset per patch
    ring_slices: Tuple[Tuple[int, int], ...]  # (start, stop) per ring of interest
    max_ring_patches: int   # pad width for ring-of-interest arrays


def build_static_tables(params: Params, geom: CZMGeometry) -> StaticTables:
    p = params
    npz = geom.num_patches
    zone = np.concatenate([geom.patch_zone(), [p.num_zones - 1]]).astype(np.int32)
    cring = np.concatenate(
        [geom.patch_concentric_ring(), [geom.num_concentric_rings]]
    ).astype(np.int32)

    # Static per-patch centering offset: the patch's geometric center at the
    # nominal ground height. Only used to keep f32 covariance well conditioned;
    # any fixed offset is semantically neutral.
    shift = np.zeros((npz + 1, 3), np.float32)
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
    return StaticTables(
        zone=zone,
        cring=cring,
        shift=shift,
        ring_slices=tuple(ring_slices),
        max_ring_patches=max_rp,
    )


class _PlaneCarry(NamedTuple):
    """Per-patch plane-fit state with the reference's staleness semantics:
    an empty fit leaves the previous values in place (patchworkpp.cpp:49)."""

    n: jnp.ndarray       # (S,) last successful fit's point count
    mean: jnp.ndarray    # (S, 3)
    normal: jnp.ndarray  # (S, 3)
    d: jnp.ndarray       # (S,)
    svals: jnp.ndarray   # (S, 3)


def _fit_planes(
    carry: _PlaneCarry,
    sp: SortedPoints,
    q: jnp.ndarray,
    mask: jnp.ndarray,
    patch_gate: jnp.ndarray,
    shift: jnp.ndarray,
    num_segments: int,
    comm: "FrameComm",
) -> _PlaneCarry:
    """Batched masked PCA plane fit with carry (reference estimate_plane :47-75).

    ``patch_gate`` (S,) limits which patches may update (e.g. R-VPF alive set);
    patches whose masked point count is zero keep their previous plane.
    """
    mask = mask & patch_gate[sp.patch_id]
    mom = comm.reduce_patches(masked_patch_moments(q, mask, sp.patch_id, num_segments))
    n, mean, cov = moments_to_mean_cov(mom, shift)
    svals, normal = eigh3x3_descending(cov)
    d = -jnp.sum(normal * mean, axis=-1)
    upd = patch_gate & (n > 0)
    u3 = upd[:, None]
    return _PlaneCarry(
        n=jnp.where(upd, n, carry.n),
        mean=jnp.where(u3, mean, carry.mean),
        normal=jnp.where(u3, normal, carry.normal),
        d=jnp.where(upd, d, carry.d),
        svals=jnp.where(u3, svals, carry.svals),
    )


def _point_plane_dist(carry: _PlaneCarry, sp: SortedPoints) -> jnp.ndarray:
    """Signed distance of every point to its patch's current plane (:551-554)."""
    nrm = carry.normal[sp.patch_id]
    d = carry.d[sp.patch_id]
    return jnp.sum(sp.xyz * nrm, axis=-1) + d


class FrameComm:
    """Cross-shard communication hooks for the frame step.

    The default (this class) is the single-device identity. The point-sharded
    SPMD path (parallel/point_sharded.py) overrides these with psums /
    all-gathers over the mesh axis: per-patch statistics are the *only*
    cross-shard state, a few hundred KB per frame over ICI.
    """

    def row_offset(self, n_local: int) -> jnp.ndarray:
        """Global row index of this shard's first point."""
        return jnp.int32(0)

    def reduce_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sum a per-patch statistic across shards."""
        return x

    def lpr_stats(
        self, sp: SortedPoints, elig: jnp.ndarray, num_lpr: int, num_segments: int
    ):
        """(sum, count) of each patch's num_lpr globally-lowest eligible z."""
        rank = segment_rank(elig, sp)
        take = elig & (rank < num_lpr)
        tf = take.astype(jnp.float32)
        sums = segment_sum_sorted(jnp.stack([sp.z * tf, tf], axis=1), sp, num_segments)
        return sums[:, 0], sums[:, 1]


def _seed_mask(
    sp: SortedPoints,
    active: jnp.ndarray,
    zone0_pt: jnp.ndarray,
    sensor_height: jnp.ndarray,
    th_seed: float,
    params: Params,
    num_segments: int,
    comm: FrameComm,
) -> jnp.ndarray:
    """Initial-seed selection over the active set (reference :77-149).

    LPR = mean z of the lowest <= num_lpr active points, where zone-0 patches
    first skip points below margin * sensor_height; seeds are all active
    points with z < LPR + th_seed (the margin does NOT filter seeds).
    """
    margin_thr = jnp.float32(params.adaptive_seed_selection_margin) * sensor_height
    elig = active & (~zone0_pt | (sp.z >= margin_thr))
    lpr_sum, lpr_cnt = comm.lpr_stats(sp, elig, params.num_lpr, num_segments)
    lpr = jnp.where(lpr_cnt > 0, lpr_sum / jnp.maximum(lpr_cnt, 1.0), 0.0)
    return active & (sp.z < lpr[sp.patch_id] + jnp.float32(th_seed))


def _masked_mean_stdev(vals: jnp.ndarray, mask: jnp.ndarray):
    """Reference calc_mean_stdev (:557-566): zeros for n <= 1, else sample
    stdev with n-1 denominator. Works on any masked array."""
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    mean = jnp.sum(vals * m) / jnp.maximum(n, 1.0)
    var = jnp.sum(jnp.square(vals - mean) * m) / jnp.maximum(n - 1.0, 1.0)
    ok = n > 1
    return jnp.where(ok, mean, 0.0), jnp.where(ok, jnp.sqrt(var), 0.0), n


def make_frame_fn(
    params: Params,
    geom: CZMGeometry | None = None,
    comm: FrameComm | None = None,
):
    """Build the pure frame step ``fn(state, points, npts) -> (state, FrameResult)``.

    ``points`` is (P, 4) float32 (padded), ``npts`` () int32. The returned
    function is jit-compatible and shape-polymorphic only in P. With a
    mesh-aware ``comm`` it runs as the per-shard body of a point-sharded
    shard_map (points = this shard's rows, npts = global count).
    """
    p = params
    geom = geom or CZMGeometry.create(p)
    comm = comm or FrameComm()
    tables = build_static_tables(p, geom)
    npz = geom.num_patches
    nseg = npz + 1

    zone_tab = jnp.asarray(tables.zone)
    cring_tab = jnp.asarray(tables.cring)
    shift_tab = jnp.asarray(tables.shift)

    def frame(state: AdaptiveState, points: jnp.ndarray, npts: jnp.ndarray):
        points = points.astype(jnp.float32)
        npts = jnp.asarray(npts, jnp.int32) - comm.row_offset(points.shape[0])

        # ---- per-point: RNR + CZM (C3, C4) ----
        bins = bin_points(points, npts, state.sensor_height, p, geom)

        # ---- global (patch, z) sort (C5) ----
        sp = sort_by_patch(points[:, :3], bins.patch_id, npz)
        counts = comm.reduce_patches(sp.start[1:nseg + 1] - sp.start[:nseg])
        processed = (counts >= p.num_min_pts) & (
            jnp.arange(nseg, dtype=jnp.int32) < npz
        )

        pid_s = sp.patch_id
        zone0_pt = zone_tab[pid_s] == 0
        active = processed[pid_s]
        q = sp.xyz - shift_tab[pid_s]

        carry = _PlaneCarry(
            n=jnp.zeros(nseg, jnp.float32),
            mean=jnp.zeros((nseg, 3), jnp.float32),
            normal=jnp.zeros((nseg, 3), jnp.float32),
            d=jnp.zeros(nseg, jnp.float32),
            svals=jnp.zeros((nseg, 3), jnp.float32),
        )

        # ---- R-VPF: peel vertical planes, zone 0 only (C8, reference :477-508).
        # A patch stays "alive" while (zone == 0 and the fit is not upright);
        # every patch gets >= 1 fit (matching the reference's fit-then-break).
        if p.enable_RVPF:
            alive = processed
            for _ in range(p.num_iter):
                seeds = _seed_mask(
                    sp, active, zone0_pt, state.sensor_height, p.th_seeds_v,
                    p, nseg, comm,
                )
                carry = _fit_planes(carry, sp, q, seeds, alive, shift_tab, nseg, comm)
                vert = (
                    alive
                    & (zone_tab == 0)
                    & (carry.normal[:, 2] < jnp.float32(p.uprightness_thr))
                )
                dist = _point_plane_dist(carry, sp)
                peel = active & vert[pid_s] & (jnp.abs(dist) < jnp.float32(p.th_dist_v))
                active = active & ~peel
                alive = vert

        # ---- R-GPF: iterative ground plane refinement (C9, reference :510-543).
        seeds = _seed_mask(
            sp, active, zone0_pt, state.sensor_height, p.th_seeds, p, nseg, comm
        )
        carry = _fit_planes(carry, sp, q, seeds, processed, shift_tab, nseg, comm)
        g = jnp.zeros_like(active)
        for _ in range(p.num_iter):
            dist = _point_plane_dist(carry, sp)
            g = active & (dist < jnp.float32(p.th_dist))  # signed test (:525)
            carry = _fit_planes(carry, sp, q, g, processed, shift_tab, nseg, comm)
        g_count = comm.reduce_patches(
            segment_sum_sorted(g.astype(jnp.float32), sp, nseg)
        )

        # ---- A-GLE cascade (C10, reference :214-288) ----
        uprightness = carry.normal[:, 2]
        elevation = carry.mean[:, 2]
        flatness = carry.svals[:, 2]
        sv0, sv1 = carry.svals[:, 0], carry.svals[:, 1]
        line_variable = jnp.where(sv1 != 0, sv0 / sv1, _F32_MAX)
        heading = jnp.sum(carry.mean * carry.normal, axis=-1)

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
        ring_cand = jnp.zeros((n_roi, w), bool)
        ring_elev = jnp.zeros((n_roi, w), jnp.float32)
        for ci, (a, b) in enumerate(tables.ring_slices):
            s = b - a
            ring_flat = ring_flat.at[ci, :s].set(flatness[a:b])
            ring_acc = ring_acc.at[ci, :s].set(accept[a:b])
            ring_cand = ring_cand.at[ci, :s].set(candidate[a:b])
            ring_elev = ring_elev.at[ci, :s].set(elevation[a:b])

        revert_patch = jnp.zeros(nseg, bool)
        if p.enable_TGR:
            flush_from = jnp.int32(0)
            ring_ids = jnp.arange(n_roi, dtype=jnp.int32)
            for ci, (a, b) in enumerate(tables.ring_slices):
                include = (ring_ids >= flush_from) & (ring_ids <= ci)
                m = ring_acc & include[:, None]
                mean_f, stdev_f, _ = _masked_mean_stdev(ring_flat, m)
                mu = mean_f + 1.5 * stdev_f
                F = flatness[a:b]
                prob_flat = 1.0 / (1.0 + jnp.exp((F - mu) / (mu / 10.0)))
                big_flat = (g_count[a:b] > 1500) & (
                    F < jnp.float32(p.th_dist * p.th_dist)
                )
                prob_flat = jnp.where(big_flat, 1.0, prob_flat)
                prob_line = jnp.where(line_variable[a:b] > 8.0, 0.0, 1.0)
                revert = candidate[a:b] & (prob_line * prob_flat > 0.5)
                revert_patch = revert_patch.at[a:b].set(revert)
                has_cand = jnp.any(candidate[a:b])
                flush_from = jnp.where(has_cand, jnp.int32(ci + 1), flush_from)

        # ---- adaptive threshold update (C11, reference :338-375) ----
        new_state = _update_state(state, p, ring_acc, ring_elev, ring_flat)

        # ---- per-point labels, back to original order (C13) ----
        patch_ground = ground_patch | revert_patch
        ground_sorted = g & patch_ground[pid_s]
        ground = (
            jnp.zeros(points.shape[0], bool)
            .at[sp.orig_idx]
            .set(ground_sorted, unique_indices=True)
        )
        result = FrameResult(
            ground_mask=ground,
            num_ground=comm.reduce_patches(jnp.sum(ground).astype(jnp.int32)),
            patch_mean=carry.mean[:npz],
            patch_normal=carry.normal[:npz],
            patch_svals=carry.svals[:npz],
            patch_processed=processed[:npz],
        )
        return new_state, result

    return frame


def _append_ring(buf, cnt, vals, acc_mask, max_storage, do_trim):
    """FIFO append + conditional trim for one adaptive ring buffer.

    New values are compacted to the front in patch (sector) order — the
    reference pushes them in its sector loop — then written at offset cnt.
    Trimming to ``max_storage`` drops the oldest (front), as erase(begin..)
    does. A safety valve trims even "frozen" rings just below capacity (the
    reference's unbounded vector can't overflow; our fixed buffer can).
    """
    w = vals.shape[0]
    order = jnp.argsort(~acc_mask, stable=True)
    vals_c = jnp.where(acc_mask[order], vals[order], 0.0)
    k = jnp.sum(acc_mask).astype(jnp.int32)
    buf2 = jax.lax.dynamic_update_slice(buf, vals_c, (cnt,))
    n_total = cnt + k
    cap = buf.shape[0]
    excess = jnp.where(
        do_trim,
        jnp.maximum(n_total - max_storage, 0),
        jnp.maximum(n_total - (cap - w), 0),
    )
    buf3 = jnp.roll(buf2, -excess)
    return buf3, n_total - excess, n_total


def _update_state(
    state: AdaptiveState,
    p: Params,
    ring_acc: jnp.ndarray,
    ring_elev: jnp.ndarray,
    ring_flat: jnp.ndarray,
) -> AdaptiveState:
    """End-of-frame adaptation (reference update_elevation_thr /
    update_flatness_thr :338-375), including the elevation ring-0 sensor
    height self-calibration and the flatness ``break`` freeze quirk."""
    n_roi = p.num_rings_of_interest
    elev_thr = state.elevation_thr
    flat_thr = state.flatness_thr
    sh = state.sensor_height
    elev_buf, elev_cnt = state.elev_buf, state.elev_cnt
    flat_buf, flat_cnt = state.flat_buf, state.flat_cnt

    cap = elev_buf.shape[1]
    iota = jnp.arange(cap)

    # Elevation: per-ring independent ('continue' on empty).
    for i in range(n_roi):
        buf3, cnt_new, n_total = _append_ring(
            elev_buf[i], elev_cnt[i], ring_elev[i], ring_acc[i],
            p.max_elevation_storage, do_trim=jnp.bool_(True),
        )
        valid = iota < n_total
        mean, stdev, _ = _masked_mean_stdev(buf3, valid)
        # n_total==1 -> calc_mean_stdev leaves zeros -> thr=0 (and sh=-0).
        factor = 3.0 if i == 0 else 2.0
        new_thr = jnp.where(n_total > 0, mean + factor * stdev, elev_thr[i])
        elev_thr = elev_thr.at[i].set(new_thr)
        if i == 0:
            sh = jnp.where(n_total > 0, -mean, sh)
        elev_buf = elev_buf.at[i].set(buf3)
        elev_cnt = elev_cnt.at[i].set(cnt_new)

    # Flatness: 'break' on a starved ring freezes all later rings.
    stopped = jnp.bool_(False)
    for i in range(n_roi):
        pre_total = flat_cnt[i] + jnp.sum(ring_acc[i]).astype(jnp.int32)
        stopped = stopped | (pre_total <= 1)
        do = ~stopped
        buf3, cnt_new, n_total = _append_ring(
            flat_buf[i], flat_cnt[i], ring_flat[i], ring_acc[i],
            p.max_flatness_storage, do_trim=do,
        )
        valid = iota < n_total
        mean, stdev, _ = _masked_mean_stdev(buf3, valid)
        flat_thr = flat_thr.at[i].set(jnp.where(do, mean + stdev, flat_thr[i]))
        flat_buf = flat_buf.at[i].set(buf3)
        flat_cnt = flat_cnt.at[i].set(cnt_new)

    return AdaptiveState(
        sensor_height=sh,
        elevation_thr=elev_thr,
        flatness_thr=flat_thr,
        elev_buf=elev_buf,
        elev_cnt=elev_cnt,
        flat_buf=flat_buf,
        flat_cnt=flat_cnt,
    )


@functools.lru_cache(maxsize=8)
def _cached_frame_fn(params: Params):
    return jax.jit(make_frame_fn(params))


def segment(state: AdaptiveState, points, npts, params: Params):
    """Convenience jitted entry: one frame through cached compiled step."""
    fn = _cached_frame_fn(params)
    return fn(state, points, npts)
