"""Parameters and Concentric-Zone-Model geometry.

Capability parity with the reference ``patchwork::Params`` struct
(reference: cpp/patchworkpp/include/patchwork/patchworkpp.h:42-112) and the
CZM geometry derivation done in the ``PatchWorkpp`` constructor
(patchworkpp.h:120-147).

TPU-first design notes
----------------------
The reference stores the CZM as ragged ``vector<vector<vector<PointXYZ>>>``.
Here the CZM is a *static index space*: every (zone, ring, sector) triple maps
to a flat patch id, and all per-patch quantities live in dense fixed-shape
arrays. The geometry below is all host-side Python (precomputed once); only
numeric arrays derived from it enter jitted code.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np

# Capacity (max points) of a single patch's dense row, per zone. Chosen from
# measured KITTI occupancy (max observed over bundled scans: ~5.6k / 1.9k /
# 0.7k / 0.72k) with headroom. Points beyond capacity are excluded from plane
# *fitting* but still classified by the final plane (graceful overflow).
DEFAULT_ZONE_CAPACITY: Tuple[int, int, int, int] = (8192, 2048, 1024, 1024)


@dataclasses.dataclass(frozen=True)
class Params:
    """All tunables of the ground-segmentation engine.

    Field-for-field parity with reference ``patchwork::Params``
    (patchworkpp.h:42-112), same defaults. Frozen: adaptive quantities
    (elevation_thr / flatness_thr / sensor_height), which the reference
    mutates in place, live in :class:`patchworkpp_tpu.state.AdaptiveState`
    instead — functional state threaded through the pipeline.
    """

    verbose: bool = False
    enable_RNR: bool = True
    enable_RVPF: bool = True
    enable_TGR: bool = True

    num_iter: int = 3
    num_lpr: int = 20
    num_min_pts: int = 10
    num_zones: int = 4
    num_rings_of_interest: int = 4

    RNR_ver_angle_thr: float = -15.0
    RNR_intensity_thr: float = 0.2

    sensor_height: float = 1.723  # initial value; adapts in AdaptiveState
    th_seeds: float = 0.125
    th_dist: float = 0.125
    th_seeds_v: float = 0.25
    th_dist_v: float = 0.1
    max_range: float = 80.0
    min_range: float = 2.7
    uprightness_thr: float = 0.707
    adaptive_seed_selection_margin: float = -1.2
    intensity_thr: float = 0.2  # bound but unused, as in reference (h:67)

    num_sectors_each_zone: Tuple[int, ...] = (16, 32, 54, 32)
    num_rings_each_zone: Tuple[int, ...] = (2, 4, 4, 4)

    max_flatness_storage: int = 1000
    max_elevation_storage: int = 1000

    # Initial adaptive thresholds (reference defaults: zeros).
    elevation_thr: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    flatness_thr: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)

    # TPU-specific: dense per-patch capacity for each zone.
    zone_capacity: Tuple[int, ...] = DEFAULT_ZONE_CAPACITY

    def replace(self, **kw) -> "Params":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class CZMGeometry:
    """Static Concentric-Zone-Model geometry derived from :class:`Params`.

    Mirrors the derivations in the reference constructor
    (patchworkpp.h:122-134): zone radial boundaries
    ``{min, (7min+max)/8, (3min+max)/4, (min+max)/2, max}``, per-zone ring
    widths and sector angles. Adds the flat patch-id space used by the dense
    TPU layout.
    """

    params: Params
    min_ranges: Tuple[float, ...]      # inner radius of each zone (len 4)
    ring_sizes: Tuple[float, ...]      # radial width of a ring, per zone
    sector_sizes: Tuple[float, ...]    # angular width of a sector, per zone
    zone_patch_offset: Tuple[int, ...]  # flat patch id of first patch in zone
    num_patches: int                   # total patches (504 w/ defaults)
    num_concentric_rings: int          # total rings across zones (14)

    @property
    def spad(self) -> int:
        """Padded patch-space width for this geometry: num_patches + 1
        overflow bucket, rounded up to a 128-lane multiple, floored at the
        kernels' native 512 (the reference accepts ANY ring/sector vectors —
        patchworkpp.h:104-134 — so the patch space must scale with them; the
        default 504-patch CZM keeps the historical 512)."""
        need = self.num_patches + 1
        return max(512, -(-need // 128) * 128)

    @staticmethod
    def create(params: Params) -> "CZMGeometry":
        p = params
        mn, mx = p.min_range, p.max_range
        min_ranges = (mn, (7 * mn + mx) / 8.0, (3 * mn + mx) / 4.0, (mn + mx) / 2.0)
        bounds = min_ranges + (mx,)
        ring_sizes = tuple(
            (bounds[k + 1] - bounds[k]) / p.num_rings_each_zone[k]
            for k in range(p.num_zones)
        )
        sector_sizes = tuple(
            2 * math.pi / p.num_sectors_each_zone[k] for k in range(p.num_zones)
        )
        offsets = []
        off = 0
        for k in range(p.num_zones):
            offsets.append(off)
            off += p.num_rings_each_zone[k] * p.num_sectors_each_zone[k]
        n_rings = sum(p.num_rings_each_zone)
        return CZMGeometry(
            params=p,
            min_ranges=min_ranges,
            ring_sizes=ring_sizes,
            sector_sizes=sector_sizes,
            zone_patch_offset=tuple(offsets),
            num_patches=off,
            num_concentric_rings=n_rings,
        )

    # ---- static per-patch tables (NumPy; feed these into jit as constants) --

    def patch_zone(self) -> np.ndarray:
        """(num_patches,) zone index of each flat patch id."""
        out = np.empty(self.num_patches, np.int32)
        for k in range(self.params.num_zones):
            a = self.zone_patch_offset[k]
            b = a + self.params.num_rings_each_zone[k] * self.params.num_sectors_each_zone[k]
            out[a:b] = k
        return out

    def patch_concentric_ring(self) -> np.ndarray:
        """(num_patches,) global concentric ring index (0..13) of each patch.

        Matches the reference's ``concentric_idx`` counter that increments
        once per (zone, ring) pair in processing order (patchworkpp.cpp:309).
        """
        out = np.empty(self.num_patches, np.int32)
        cr = 0
        for k in range(self.params.num_zones):
            s = self.params.num_sectors_each_zone[k]
            for ring in range(self.params.num_rings_each_zone[k]):
                a = self.zone_patch_offset[k] + ring * s
                out[a:a + s] = cr
                cr += 1
        return out

    def patch_sector(self) -> np.ndarray:
        """(num_patches,) sector index of each flat patch id within its ring."""
        out = np.empty(self.num_patches, np.int32)
        for k in range(self.params.num_zones):
            s = self.params.num_sectors_each_zone[k]
            for ring in range(self.params.num_rings_each_zone[k]):
                a = self.zone_patch_offset[k] + ring * s
                out[a:a + s] = np.arange(s)
        return out

    def zone_patch_slice(self, k: int) -> slice:
        a = self.zone_patch_offset[k]
        return slice(a, a + self.params.num_rings_each_zone[k] * self.params.num_sectors_each_zone[k])
