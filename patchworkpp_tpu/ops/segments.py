"""Segment (per-patch) layout helpers over a point-major sorted array.

One global lexicographic sort by (patch_id, z) replaces the reference's 504
per-patch ``std::sort`` calls (reference: cpp/patchworkpp/src/patchworkpp.cpp:199).
After it, each patch occupies a contiguous ascending-z run, and every
"sorted per-patch" operation (LPR rank, seed selection under changing active
sets) becomes a segmented cumulative sum — no gathers into ragged storage.

All patch-indexed broadcasts go through the one-hot MXU path (ops/onehot.py);
the only true gathers left are tiny (S+1)-row ones.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from patchworkpp_tpu.ops.onehot import SPAD, patch_lookup


class SortedPoints(NamedTuple):
    """Struct-of-arrays: per-point elementwise math on TPU runs at full
    128/128 lane utilization on (P,) columns, while ops on a (P, 3) array
    use 3 of 128 lanes (a single minor-dim-4 op measured ~45 us/frame at
    P=131k)."""

    x: jnp.ndarray          # (P,) float32, sorted by (patch_id, z)
    y: jnp.ndarray          # (P,)
    z: jnp.ndarray          # (P,)
    patch_id: jnp.ndarray   # (P,) int32, nondecreasing
    start: jnp.ndarray      # (S+1,) int32: start offset of each patch's run


def z_sort_key(z: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving f32 -> uint32 bijection (sign-flip trick).

    Float sort comparators pay NaN-aware total-order handling in every
    stage of the sorting network; the integer image sorts identically for
    NaN-free inputs (+inf maps to 0xFF800000, above all finite keys) and
    :func:`z_sort_key_inverse` recovers the exact bits afterwards.
    """
    b = jax.lax.bitcast_convert_type(z, jnp.uint32)
    return b ^ (
        jnp.uint32(0x80000000)
        | jnp.where(b >= jnp.uint32(0x80000000), jnp.uint32(0x7FFFFFFF), 0)
    )


def z_sort_key_inverse(k: jnp.ndarray) -> jnp.ndarray:
    b = k ^ (
        jnp.uint32(0x80000000)
        | jnp.where(k < jnp.uint32(0x80000000), jnp.uint32(0x7FFFFFFF), 0)
    )
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def sort_by_patch(
    x: jnp.ndarray,
    y: jnp.ndarray,
    z: jnp.ndarray,
    patch_id: jnp.ndarray,
    width: int = SPAD,
) -> SortedPoints:
    """Sort points by (patch_id, z); overflow bucket lands at the end.

    Unstable (a stable TPU sort threads an extra iota tiebreaker through
    the whole network); ties share identical (patch, z) keys and every
    consumer treats a patch as a set, so labels are unchanged.
    """
    pid_s, zi_s, x_s, y_s = jax.lax.sort(
        (patch_id, z_sort_key(z), x, y),
        num_keys=2,
        is_stable=False,
    )
    z_s = z_sort_key_inverse(zi_s)
    # start[s] = #{i : pid_s[i] < s} for the sorted ids — derived from the
    # per-patch histogram (one fused one-hot MXU dot) instead of
    # jnp.searchsorted, whose binary-search while loop lowers to sequential
    # row-wise-emitter gathers on TPU.
    from patchworkpp_tpu.ops.onehot import patch_reduce

    counts = patch_reduce(
        jnp.ones((patch_id.shape[0], 1), jnp.float32), patch_id, width
    )[:, 0].astype(jnp.int32)
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return SortedPoints(x=x_s, y=y_s, z=z_s, patch_id=pid_s, start=start)


def patch_counts(sp: SortedPoints) -> jnp.ndarray:
    """(S,) float32 point count of each patch bucket."""
    return (sp.start[1:] - sp.start[:-1]).astype(jnp.float32)


def segment_rank(mask: jnp.ndarray, sp: SortedPoints) -> jnp.ndarray:
    """Exclusive rank of each point among mask-true points of its patch.

    rank[i] = #{j in same patch : j < i (sorted order) and mask[j]}. Because
    points are ascending in z within a patch, this is exactly the reference's
    "position after skipping earlier points" ordering.
    """
    n = mask.shape[0]
    m = mask.astype(jnp.int32)
    incl = jnp.cumsum(m)
    excl = (incl - m).astype(jnp.float32)
    # Per-patch base = excl at the patch's first row ((S+1)-row gather: tiny).
    base = excl[jnp.minimum(sp.start, n - 1)]
    base = jnp.where(sp.start >= n, jnp.float32(incl[-1]), base)
    base_pt = patch_lookup(base[: sp.start.shape[0] - 1, None], sp.patch_id)[:, 0]
    return excl - base_pt
