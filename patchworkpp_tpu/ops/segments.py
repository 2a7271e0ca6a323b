"""Segment (per-patch) layout helpers over a point-major sorted array.

One global lexicographic sort by (patch_id, z) replaces the reference's 504
per-patch ``std::sort`` calls (reference: cpp/patchworkpp/src/patchworkpp.cpp:199).
After it, each patch occupies a contiguous ascending-z run, and every
"sorted per-patch" operation (LPR rank, seed selection under changing active
sets) becomes a segmented cumulative sum — no gathers into ragged storage.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SortedPoints(NamedTuple):
    xyz: jnp.ndarray        # (P, 3) float32, sorted by (patch_id, z)
    z: jnp.ndarray          # (P,) convenience alias of xyz[:, 2]
    patch_id: jnp.ndarray   # (P,) int32, nondecreasing
    orig_idx: jnp.ndarray   # (P,) int32 original row of each sorted point
    start: jnp.ndarray      # (NP+2,) int32: start offset of each patch's run


def sort_by_patch(
    xyz: jnp.ndarray, patch_id: jnp.ndarray, num_patches: int
) -> SortedPoints:
    """Stable sort points by (patch_id, z); overflow bucket lands at the end."""
    n = xyz.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pid_s, z_s, x_s, y_s, idx_s = jax.lax.sort(
        (patch_id, xyz[:, 2], xyz[:, 0], xyz[:, 1], idx),
        num_keys=2,
        is_stable=True,
    )
    xyz_s = jnp.stack([x_s, y_s, z_s], axis=1)
    start = jnp.searchsorted(
        pid_s, jnp.arange(num_patches + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return SortedPoints(xyz=xyz_s, z=z_s, patch_id=pid_s, orig_idx=idx_s, start=start)


def patch_starts(sp: SortedPoints) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(counts, starts) per patch: counts[p] = #points in patch p."""
    counts = sp.start[1:] - sp.start[:-1]
    return counts[:-1], sp.start[:-1]


def segment_rank(mask: jnp.ndarray, sp: SortedPoints) -> jnp.ndarray:
    """Exclusive rank of each point among mask-true points of its patch.

    rank[i] = #{j in same patch : j < i (sorted order) and mask[j]}. Because
    points are ascending in z within a patch, this is exactly the reference's
    "position after skipping earlier points" ordering.
    """
    m = mask.astype(jnp.int32)
    incl = jnp.cumsum(m)
    excl = incl - m
    seg_base = excl[jnp.minimum(sp.start, mask.shape[0] - 1)]  # excl at patch start
    # Guard the degenerate all-points case where start == P.
    seg_base = jnp.where(sp.start >= mask.shape[0], incl[-1], seg_base)
    return excl - seg_base[sp.patch_id]


def segment_sum_sorted(
    values: jnp.ndarray, sp: SortedPoints, num_segments: int
) -> jnp.ndarray:
    """Per-patch sum of ``values`` ((P,) or (P, C)) over the sorted layout."""
    return jax.ops.segment_sum(
        values, sp.patch_id, num_segments=num_segments, indices_are_sorted=True
    )
