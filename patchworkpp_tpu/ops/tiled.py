"""Tiled patch layout: every 128-slot tile holds points of exactly one patch.

The fused fit kernel (ops/pallas/fit_kernel.py) wants per-tile single-patch
structure so per-patch broadcasts are one VMEM row read instead of a P-wide
gather or one-hot matmul. The layout is built by the *sort itself*: inject
per-patch filler rows (sort key z=+inf, so they land at each patch's tail)
sized to round every patch's run up to a multiple of TILE, then sort
(patch, z) over the extended array. Patch runs then start and end on tile
boundaries, so tile t belongs entirely to patch tile_patch[t].

Capacity: PT = P + S * (TILE-1) rounded up bounds the worst case (every
patch bucket non-empty with maximal padding waste).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from patchworkpp_tpu.ops.onehot import SPAD, patch_reduce

TILE = 128


def tiled_capacity(p: int, width: int = SPAD) -> int:
    """Static extended length for a P-point cloud (multiple of TILE).

    Sized so the static (width, TILE-1) filler grid always fits: every patch
    (including the unprocessed bucket) can need at most TILE-1 alignment
    fillers. ``width`` is the padded patch-space size (geom.spad; 512 for
    the default 504-patch CZM).
    """
    worst = p + width * (TILE - 1)
    return -(-worst // TILE) * TILE


class TiledPoints(NamedTuple):
    xyz: jnp.ndarray         # (PT, 3) f32; filler rows zeroed
    valid: jnp.ndarray       # (PT,) bool: real point (not filler/padding)
    patch_id: jnp.ndarray    # (PT,) int32 nondecreasing
    tile_patch: jnp.ndarray  # (PT/TILE,) int32: the patch owning each tile
    counts: jnp.ndarray      # (SPAD,) f32: real points per patch
    pad_start: jnp.ndarray   # (SPAD+1,) int32: tile-aligned run starts


def build_tiled(
    xyz: jnp.ndarray,
    patch_id: jnp.ndarray,
    counts: jnp.ndarray | None = None,
    width: int = SPAD,
) -> TiledPoints:
    """Sort points into the tiled layout.

    Args:
      xyz: (P, 3) f32 points (original order).
      patch_id: (P,) int32 in [0, width).
      counts: optional precomputed (width,) f32 per-patch counts (must equal
        patch_reduce(ones, patch_id) — e.g. binning.factored_patch_counts);
        computed here when absent.
      width: padded patch-space size (geom.spad; 512 default CZM).
    """
    p = xyz.shape[0]
    pt = tiled_capacity(p, width)
    nfill = pt - p

    # Real per-patch counts and the padded (tile-aligned) run lengths.
    if counts is None:
        counts = patch_reduce(jnp.ones((p, 1), jnp.float32), patch_id, width)[:, 0]
    counts_i = counts.astype(jnp.int32)
    padded = -(-counts_i // TILE) * TILE  # ceil to tile multiple; 0 stays 0
    pad_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )

    # Patch p needs fill_needed[p] < TILE alignment fillers. Rather than
    # run-length-decoding the needs into a flat filler stream (a
    # (nfill, SPAD) compare-reduce, ~70 us/frame of VPU at this size — and
    # jnp.searchsorted is worse: it lowers to a binary-search loop whose
    # body is a row-wise-emitter gather, ~5 ms/frame), lay fillers out as a
    # STATIC (width, TILE-1) grid: slot (p, i) is a patch-p filler iff
    # i < fill_needed[p] — one broadcast compare. Excess slots get the
    # sentinel key `width` and sort to the global tail with the trailing
    # capacity pad, exactly as before.
    fill_needed = padded - counts_i
    grid_i = jnp.arange(TILE - 1, dtype=jnp.int32)[None, :]
    grid_p = jnp.arange(width, dtype=jnp.int32)[:, None]
    grid_patch = jnp.where(
        grid_i < fill_needed[:, None], grid_p, jnp.int32(width)
    ).reshape(-1)
    fill_patch = jnp.concatenate(
        [grid_patch, jnp.full(nfill - width * (TILE - 1), width, jnp.int32)]
    )

    big = jnp.float32(jnp.inf)
    key_pid = jnp.concatenate([patch_id, fill_patch])
    key_z = jnp.concatenate([xyz[:, 2], jnp.full(nfill, big)])
    pay_x = jnp.concatenate([xyz[:, 0], jnp.zeros(nfill)])
    pay_y = jnp.concatenate([xyz[:, 1], jnp.zeros(nfill)])

    # The z key rides as an order-preserving uint32 (segments.z_sort_key):
    # integer comparators skip the NaN-aware total-order handling float keys
    # pay in every stage of the sorting network, and the bijection maps back
    # exactly afterwards (+inf fillers stay above all finite keys).
    # is_stable=False: a stable TPU sort threads an extra iota tiebreaker
    # through the whole sorting network (~25% more traffic, ~110 us/frame).
    # Instability only permutes rows with identical (patch, z) keys. The LPR
    # mean and all masks are tie-invariant; the x/y moment sums can see tied
    # rows in a different f32 accumulation order, which in principle moves a
    # covariance by an ulp — the same class of tie-order freedom the
    # reference's own std::sort has. Golden parity stays exact (12/12,
    # TPU-verified) and the fused==unfused label invariant is enforced by
    # tests, not by bitwise moment equality (the two paths already reduce in
    # different orders).
    from patchworkpp_tpu.ops.segments import z_sort_key, z_sort_key_inverse

    pid_s, zi_s, x_s, y_s = jax.lax.sort(
        (key_pid, z_sort_key(key_z), pay_x, pay_y), num_keys=2, is_stable=False
    )
    z_s = z_sort_key_inverse(zi_s)
    valid = ~jnp.isinf(z_s)
    z_s = jnp.where(valid, z_s, 0.0)

    tile_patch = pid_s[:: TILE]
    return TiledPoints(
        xyz=jnp.stack([x_s, y_s, z_s], axis=1),
        valid=valid,
        patch_id=pid_s,
        tile_patch=tile_patch,
        counts=counts_i.astype(jnp.float32),
        pad_start=pad_start,
    )
