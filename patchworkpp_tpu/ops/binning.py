"""Per-point stage: RNR noise mask + Concentric-Zone-Model patch assignment.

Replaces the reference's sequential per-point scatter into ragged
``vector<Zone>`` (reference: cpp/patchworkpp/src/patchworkpp.cpp:578-622 and
reflected_noise_removal :377-400) with one fused vectorized pass that labels
every point with a flat patch id in the static 504-patch space. Out-of-range,
noise, and padding points get the overflow id ``num_patches`` so every
downstream op is a fixed-shape segment op over ``num_patches + 1`` buckets.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from patchworkpp_tpu.ops.onehot import mxu_dot_c0
from patchworkpp_tpu.params import CZMGeometry, Params


class PointBins(NamedTuple):
    """Per-point binning result (all shapes (P,))."""

    patch_id: jnp.ndarray   # int32 in [0, num_patches]; num_patches = no patch
    valid: jnp.ndarray      # bool: non-padding
    noise: jnp.ndarray      # bool: RNR-flagged (always nonground)
    in_range: jnp.ndarray   # bool: inside (min_range, max_range]
    ring14: jnp.ndarray     # int32 concentric ring in [0, 14]; 14 = no patch
    sector: jnp.ndarray     # int32 sector within the ring; 0 when no patch


class BinTables(NamedTuple):
    """Static per-zone constants baked from :class:`CZMGeometry`."""

    zone_r_lo: np.ndarray        # (Z,) inner radius of each zone
    zone_r_hi: np.ndarray        # (Z,) outer radius
    ring_size: np.ndarray        # (Z,)
    sector_size: np.ndarray      # (Z,)
    nrings: np.ndarray           # (Z,) int32
    nsectors: np.ndarray         # (Z,) int32
    patch_offset: np.ndarray     # (Z,) int32 flat id of zone's first patch


def make_bin_tables(geom: CZMGeometry) -> BinTables:
    p = geom.params
    lo = np.asarray(geom.min_ranges, np.float64)
    hi = np.asarray(list(geom.min_ranges[1:]) + [p.max_range], np.float64)
    return BinTables(
        zone_r_lo=lo,
        zone_r_hi=hi,
        ring_size=np.asarray(geom.ring_sizes, np.float64),
        sector_size=np.asarray(geom.sector_sizes, np.float64),
        nrings=np.asarray(p.num_rings_each_zone, np.int32),
        nsectors=np.asarray(p.num_sectors_each_zone, np.int32),
        patch_offset=np.asarray(geom.zone_patch_offset, np.int32),
    )


def bin_points(
    points: jnp.ndarray,
    npts: jnp.ndarray,
    sensor_height: jnp.ndarray,
    params: Params,
    geom: CZMGeometry,
) -> PointBins:
    """Assign each point a flat patch id; flag RNR noise and out-of-range.

    Args:
      points: (P, 4) float32 padded point cloud (x, y, z, intensity). Pass
        zero intensity if unavailable (RNR is gated by ``params.enable_RNR``
        at trace time, mirroring the reference's 4-column requirement).
      npts: () int32 — number of real points; rows >= npts are padding.
      sensor_height: () float32 — current adaptive sensor height (RNR's
        ``z < -sensor_height - 0.8`` test uses the adapted value).
    """
    p = params
    tb = make_bin_tables(geom)
    num_patches = geom.num_patches

    # Precision note: r/theta are computed in f32, while the reference (and
    # the oracle, oracle/numpy_oracle.py) promotes to double. A point lying
    # within ~1 ulp of a ring/sector/range boundary could therefore bin
    # differently. TPU f64 is emulated and would dominate the frame, so we
    # accept the documented boundary-ulp risk; it has never produced a label
    # mismatch on the golden set (12/12 exact, full resolution).
    x = points[:, 0]
    y = points[:, 1]
    z = points[:, 2]
    inten = points[:, 3]
    n = x.shape[0]

    valid = jnp.arange(n, dtype=jnp.int32) < npts

    # Concrete instance of the boundary-ulp risk, measured on scan 000003
    # @ SUB=8 (point (12.200262, 12.115223), f64 r = 17.19374948..., zone-1
    # ring edge exactly 17.19375): XLA:CPU's jit-compiled f32 sqrt is one
    # ulp above the correctly-rounded value (vectorized approximation;
    # optimization_barrier does not change it), putting the point one ring
    # up vs the f64 oracle and dropping a 10-point patch below num_min_pts.
    # Unfixable at f32 (and f64 is emulated on TPU); tests detect
    # boundary-straddling runs by comparing engine vs oracle patch ids and
    # scope oracle-parity assertions to runs where the binning agrees
    # (tests/test_pipeline_golden.py::test_param_matrix_*).
    #
    # A second, SHARPER hazard (found by tests/test_fuzz_parity.py): the
    # same jit sqrt can round DIFFERENTLY in different jit PROGRAMS — XLA
    # fuses r's producer chain with whatever surrounds it, and the fused
    # codegen's last-ulp behavior depends on that context. Without the
    # barrier below, a synthetic point whose radius sits within an ulp of a
    # ring edge measurably binned into DIFFERENT rings in the tiled vs the
    # unfused frame program (same backend, same input), flipping a whole
    # patch across num_min_pts. The barrier pins r's computation into its
    # own canonical fusion, making the binning decision a function of the
    # inputs alone — every program that embeds bin_points (tiled, unfused,
    # per-shard under shard_map) sees the same patch ids. The one (P,)
    # materialization is not a cost but a measured WIN on the v5e-lite:
    # same-day control bench 1616.6 scans/s without the barrier vs 1743.6 /
    # 1752.2 with it (+8%) — splitting r out of the big binning fusion lets
    # XLA schedule the sqrt once and overlap the consumers.
    r = jax.lax.optimization_barrier(jnp.sqrt(x * x + y * y))

    if p.enable_RNR:
        ver_deg = jnp.arctan2(z, r) * jnp.float32(180.0 / math.pi)
        noise = (
            (ver_deg < jnp.float32(p.RNR_ver_angle_thr))
            & (z < -sensor_height - jnp.float32(0.8))
            & (inten < jnp.float32(p.RNR_intensity_thr))
            & valid
        )
    else:
        noise = jnp.zeros(n, bool)

    in_range = (r <= jnp.float32(p.max_range)) & (r > jnp.float32(p.min_range)) & valid

    # Same cross-program pinning for the sector decision: atan2's fused
    # codegen could in principle round differently per embedding program
    # (sector-edge probes in tests/test_fuzz_parity.py). Measured
    # perf-neutral on the chip (1757.8 vs 1752.2/1761.4 scans/s).
    theta = jnp.arctan2(y, x)
    theta = jax.lax.optimization_barrier(
        jnp.where(theta > 0, theta, theta + jnp.float32(2 * math.pi))
    )

    # Vectorized zone/ring/sector: compute candidate (ring, sector) for every
    # zone, then select by radial interval — cheap (Z=4) and branch-free.
    patch_id = jnp.full(n, num_patches, jnp.int32)
    # Factored (concentric ring, sector) ids: the same binning decision, kept
    # separate so per-patch histograms can use two narrow one-hots
    # (16 + 64 compares/point) instead of one SPAD-wide one (512).
    ring_offset = np.concatenate([[0], np.cumsum(tb.nrings)]).astype(np.int32)
    ring14 = jnp.full(n, int(ring_offset[-1]), jnp.int32)
    sector = jnp.zeros(n, jnp.int32)
    binnable = in_range & ~noise
    for k in range(p.num_zones):
        ring = jnp.minimum(
            jnp.floor((r - jnp.float32(tb.zone_r_lo[k])) / jnp.float32(tb.ring_size[k])).astype(jnp.int32),
            jnp.int32(tb.nrings[k] - 1),
        )
        sec = jnp.minimum(
            jnp.floor(theta / jnp.float32(tb.sector_size[k])).astype(jnp.int32),
            jnp.int32(tb.nsectors[k] - 1),
        )
        if k == 0:
            zsel = r < jnp.float32(tb.zone_r_hi[0])
        elif k < p.num_zones - 1:
            zsel = (r >= jnp.float32(tb.zone_r_lo[k])) & (r < jnp.float32(tb.zone_r_hi[k]))
        else:
            zsel = r >= jnp.float32(tb.zone_r_lo[k])
        pid_k = jnp.int32(tb.patch_offset[k]) + ring * jnp.int32(tb.nsectors[k]) + sec
        sel = binnable & zsel
        patch_id = jnp.where(sel, pid_k, patch_id)
        ring14 = jnp.where(sel, jnp.int32(ring_offset[k]) + ring, ring14)
        sector = jnp.where(sel, sec, sector)

    # Pin the DECISIONS themselves, not just r/theta: the sub/div/floor
    # chains (and the RNR arctan2) between the barriered inputs and these
    # outputs are otherwise duplicated into each consumer fusion, where
    # TPU's approximated divide could in principle round per-context like
    # the sqrt did. With barriers on both ends, the middle is an identical
    # self-contained subgraph in every embedding program, so bin decisions
    # are deterministic per backend BY CONSTRUCTION (NUMERICS.md). Measured
    # wall-neutral on the chip.
    patch_id, noise, in_range, ring14, sector = jax.lax.optimization_barrier(
        (patch_id, noise, in_range, ring14, sector)
    )
    return PointBins(
        patch_id=patch_id, valid=valid, noise=noise, in_range=in_range,
        ring14=ring14, sector=sector,
    )


_HIST_R, _HIST_S = 16, 64  # 14 rings + overflow row, 54 max sectors; padded


def supports_factored_counts(geom: CZMGeometry) -> bool:
    """True when the CZM fits the (ring, sector) histogram grid: total rings
    + the overflow row strictly below _HIST_R (keeping the (15,63) cell
    empty) and every zone's sector count strictly below _HIST_S."""
    p = geom.params
    total_rings = int(np.sum(np.asarray(p.num_rings_each_zone)))
    max_sectors = int(np.max(np.asarray(p.num_sectors_each_zone)))
    return total_rings + 1 <= _HIST_R - 1 and max_sectors <= _HIST_S - 1


def factored_patch_counts(
    bins: PointBins, geom: CZMGeometry, width: int | None = None
) -> jnp.ndarray:
    """Per-patch point counts as a (ring14 x sector) MXU histogram.

    counts[p] = sum_i [ring14_i == r(p)][sector_i == s(p)] — two narrow
    one-hots (16 + 64 compares/point) contracted on the MXU instead of one
    SPAD-wide one-hot reduce (512 compares/point, ~4x the MXU tiles;
    measured 49 -> ~14 us/frame at P=131k). Counts are small integers, so
    bf16 one-hots and f32 accumulation are exact; every row (including
    padding, which bins to the overflow cell like the patch_id path's
    overflow bucket) lands in exactly one cell, so the result equals
    patch_reduce(ones, patch_id) bitwise.

    Returns: (width,) f32 counts (width defaults to geom.spad; the trailing
    indices past num_patches+1 are unused pad buckets; the overflow bucket
    ``num_patches`` holds padding + out-of-range + RNR rows, as in the
    patch_id encoding).
    """
    if width is None:
        width = geom.spad

    if not supports_factored_counts(geom):
        raise ValueError(
            "CZM config exceeds the factored histogram grid "
            f"(rings+overflow <= {_HIST_R - 1}, sectors <= {_HIST_S - 1}); "
            "guard call sites with supports_factored_counts()."
        )
    p = geom.params
    nrings = np.asarray(p.num_rings_each_zone, np.int32)
    nsectors = np.asarray(p.num_sectors_each_zone, np.int32)
    ring_offset = np.concatenate([[0], np.cumsum(nrings)]).astype(np.int32)
    patch_offset = np.asarray(geom.zone_patch_offset, np.int32)

    # Static pid -> histogram cell map. Unused pad buckets point at the
    # always-empty cell (_HIST_R-1, _HIST_S-1): ring14 <= 14 < 15 for every
    # point, so its count is exactly 0.
    cell = np.full(width, (_HIST_R - 1) * _HIST_S + (_HIST_S - 1), np.int64)
    for k in range(p.num_zones):
        for ring in range(int(nrings[k])):
            for sec in range(int(nsectors[k])):
                pid = int(patch_offset[k]) + ring * int(nsectors[k]) + sec
                cell[pid] = (int(ring_offset[k]) + ring) * _HIST_S + sec
    cell[geom.num_patches] = int(ring_offset[-1]) * _HIST_S  # overflow bucket

    oh_r = (
        bins.ring14[:, None] == jnp.arange(_HIST_R, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    oh_s = (
        bins.sector[:, None] == jnp.arange(_HIST_S, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    # mxu_dot_c0 (not a bare dot_general): its custom_vmap rule unrolls the
    # chunked engine's batch axis into per-chunk 2D dots — a default batched
    # bf16xbf16->f32 contraction is the exact pattern XLA:CPU's thunk
    # runtime rejects (UNIMPLEMENTED DotThunk BF16; see ops/onehot.py).
    hist = mxu_dot_c0(oh_r, oh_s)  # (16, 64)
    return hist.reshape(-1)[jnp.asarray(cell)]
