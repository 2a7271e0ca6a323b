"""Gather/scatter-free patch<->point data movement via one-hot MXU matmuls.

On TPU, a composed program's P-sized gathers and scatter-adds lower to a
row-at-a-time emitter (~8 cycles per element — ~1 ms per op at 131k points),
which made a direct implementation ~40 ms/frame. The MXU path is ~50x faster:

- broadcast per-patch tables to points:  onehot(pid) @ table    (P,S)@(S,C)
- reduce per-point features to patches:  onehot(pid).T @ feats  (S,P)@(P,C)

The one-hot matrix is never materialized to HBM — XLA fuses the
``pid[:, None] == iota`` comparison into the matmul operand tiles. Exactly
one lane matches per row, so lookups are exact selections and reductions are
ordinary f32 accumulations (HIGHEST precision = bf16x6 passes ~ f32-exact).

S is the patch space padded to a lane multiple (504 patches + 1 overflow
bucket -> 512).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Padded patch-space width: 504 real patches + overflow bucket, padded to the
# TPU lane width.
SPAD = 512

_PREC = jax.lax.Precision.HIGHEST


# Per-call-site counter: gives every one-hot a structurally distinct iota so
# XLA cannot CSE them into one shared (P, S) array. A shared one-hot gets
# materialized to HBM (measured: every dot then costs 0.16-0.35 ms reading
# it back); distinct ones fuse into each dot's operand tiles (~30 us).
_SITE = [0]


# ---- vmap-safe bf16 MXU dots -------------------------------------------
#
# The chunked single-device engine (parallel/chunked.py) vmaps the per-shard
# frame program over a leading chunk axis. jax.vmap's default batching rule
# for dot_general emits a BATCHED bf16xbf16->f32 contraction, which XLA:CPU's
# thunk runtime cannot execute (UNIMPLEMENTED DotThunk BF16) — and even where
# supported, a batched contraction is NOT guaranteed the same reduction
# order as the per-device 2D dots the mesh path runs. These custom_vmap
# wrappers pin the batch rule: unroll the (small, static) chunk axis into
# the exact unbatched 2D dots each mesh device would issue — bitwise the
# per-shard program — except the lhs-only-batched lookup case, where
# flattening chunk rows into the row axis is an exact per-row-independent
# rewrite (each output row is still a single-addend selection chain).


@jax.custom_batching.custom_vmap
def mxu_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(m, k) @ (k, n) bf16 dot with f32 accumulation (MXU form)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


@mxu_dot.def_vmap
def _mxu_dot_vmap(axis_size, in_batched, a, b):
    a_b, b_b = in_batched
    if a_b and not b_b:
        flat = mxu_dot(a.reshape(-1, a.shape[-1]), b)
        return flat.reshape(axis_size, -1, b.shape[-1]), True
    outs = [
        mxu_dot(a[i] if a_b else a, b[i] if b_b else b)
        for i in range(axis_size)
    ]
    return jnp.stack(outs), True


@jax.custom_batching.custom_vmap
def mxu_dot_c0(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(k, m) x (k, n) -> (m, n) bf16 dot contracting BOTH dim-0 axes
    (the one-hot-transposed reduce orientation) with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@mxu_dot_c0.def_vmap
def _mxu_dot_c0_vmap(axis_size, in_batched, a, b):
    a_b, b_b = in_batched
    outs = [
        mxu_dot_c0(a[i] if a_b else a, b[i] if b_b else b)
        for i in range(axis_size)
    ]
    return jnp.stack(outs), True


@jax.custom_batching.custom_vmap
def f32_dot_c0(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(k, m) x (k, n) -> (m, n) f32 HIGHEST-precision dot contracting both
    dim-0 axes — patch_reduce's reduce orientation. Wrapped so the chunked
    engine's vmap unrolls it into the exact per-device 2D dots the mesh path
    issues (a default batched contraction is not guaranteed the same
    accumulation order, and patch_reduce feeds plane-fit moments on the
    unfused per-shard path)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        precision=_PREC, preferred_element_type=jnp.float32,
    )


@f32_dot_c0.def_vmap
def _f32_dot_c0_vmap(axis_size, in_batched, a, b):
    a_b, b_b = in_batched
    outs = [
        f32_dot_c0(a[i] if a_b else a, b[i] if b_b else b)
        for i in range(axis_size)
    ]
    return jnp.stack(outs), True


def patch_onehot(patch_id: jnp.ndarray, width: int = SPAD) -> jnp.ndarray:
    """(P,) int32 -> (P, width) f32 one-hot. Stays fused into its consumer."""
    _SITE[0] += 1
    iota = jnp.arange(width, dtype=patch_id.dtype)
    iota = jax.lax.optimization_barrier(iota + jnp.int32(_SITE[0])) - jnp.int32(
        _SITE[0]
    )
    return (patch_id[:, None] == iota[None, :]).astype(jnp.float32)


def patch_lookup(table: jnp.ndarray, patch_id: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-patch values to points: result[i] = table[patch_id[i]].

    One DEFAULT-precision bf16 dot instead of a HIGHEST-precision f32 one
    (~6 bf16 passes, was 170 us/frame at P=131k, C=21): the f32 table is
    chop-split into three bf16 parts (8+8+8 significand bits) packed along
    the column axis, and the part slices are re-summed after the dot. A
    lookup row has exactly ONE contributing addend, so (hi+mid)+lo
    reconstructs every normal-range f32 bitwise (Dekker); out-of-range ids
    still produce an all-zero row.

    For NARROW tables over a 64-multiple S the one-hot is FACTORED:
    id = hi*64 + lo, and the lookup becomes a (P, 64) one-hot dot against
    the table regrouped as (64, S/64 * 3C), followed by an exact 0/1
    select of the hi block. Bitwise-identical output (every stage still
    has exactly one contributing addend); the one-hot compare build drops
    from P*S to P*(64 + S/64) VPU ops and the MXU contraction shrinks
    from ceil(S/128) passes to one. The hi-select epilogue costs
    ~2*(S/64)*3C VPU ops per point, so WIDE tables stay on the flat
    one-hot: at S=512 the crossover is C~9 (measured on-chip: the C=17
    label table is ~40 us/frame FASTER flat, the C<=3 gate/shift lookups
    are faster factored).

    Args:
      table: (S, C) float32 (S == SPAD).
      patch_id: (P,) int32 in [0, S).

    Returns:
      (P, C) float32.
    """
    # The split is _chop_table — the ONE chop implementation shared with
    # patch_lookup_cols, whose documented contract is bitwise equality with
    # this function's output (a drifted duplicate would break the invariant
    # with no compile error).
    packed = _chop_table(table)  # (S, 3C) bf16
    s = table.shape[0]
    c = table.shape[1]

    # Factored pays 2*nb*3C select ops/point to save (S - 64 - nb)
    # compares/point; require a clear margin before taking it.
    nb64 = s // 64
    if s % 64 == 0 and s > 64 and 6 * c * nb64 <= s - 64:
        # Factored path: regroup the packed table so that block b of the
        # column axis holds the rows with hi == b; the lo one-hot then
        # fetches ALL hi-candidate rows for each point in one dot, and an
        # exact 0/1 hi select keeps the right block. ids outside [0, S)
        # yield an all-zero row exactly as the flat path does (hi select
        # never fires; negative >> keeps the sign so hi < 0 too).
        nb = s // 64
        mat = packed.reshape(nb, 64, 3 * c).transpose(1, 0, 2).reshape(
            64, nb * 3 * c
        )
        hi_id = patch_id >> 6
        lo_id = jnp.where(patch_id >= 0, patch_id & 63, -1)
        _SITE[0] += 1
        iota = jnp.arange(64, dtype=patch_id.dtype)
        iota = jax.lax.optimization_barrier(
            iota + jnp.int32(_SITE[0])
        ) - jnp.int32(_SITE[0])
        oh = (lo_id[:, None] == iota[None, :]).astype(jnp.bfloat16)
        d = mxu_dot(oh, mat)
        d = d.reshape(patch_id.shape[0], nb, 3 * c)
        # The hi-select iota gets the same per-site barrier as the one-hot
        # iotas: several factored lookups per frame share the same patch_id
        # (e.g. the sorted-order gate/shift lookups), and a CSE-shared
        # (P, nb) select would be materialized to HBM and re-read per
        # consumer instead of fusing into each dot epilogue.
        _SITE[0] += 1
        hiota = jnp.arange(nb, dtype=patch_id.dtype)
        hiota = jax.lax.optimization_barrier(
            hiota + jnp.int32(_SITE[0])
        ) - jnp.int32(_SITE[0])
        sel = (hi_id[:, None] == hiota[None, :]).astype(jnp.float32)
        d = jnp.sum(d * sel[:, :, None], axis=1)  # (P, 3C)
    else:
        _SITE[0] += 1
        iota = jnp.arange(s, dtype=patch_id.dtype)
        iota = jax.lax.optimization_barrier(
            iota + jnp.int32(_SITE[0])
        ) - jnp.int32(_SITE[0])
        oh = (patch_id[:, None] == iota[None, :]).astype(jnp.bfloat16)
        d = mxu_dot(oh, packed)
    return d[:, :c] + d[:, c : 2 * c] + d[:, 2 * c :]


def _chop_table(table: jnp.ndarray):
    """f32 table -> (S, 3C) bf16 [hi | mid | lo] exact chop split.

    The chop-split is done with INTEGER bit ops, not float converts: XLA
    elides convert(convert(x, bf16), f32) round-trips as a no-op (verified
    on TPU — the residual parts silently became zero and the lookup
    returned bf16(x)), and its bf16-propagation pass demotes f32 arithmetic
    sandwiched between bf16 converts. A bf16 value is exactly the top 16
    bits of the f32 pattern, so truncation masks/shifts give the same exact
    8+8+8-significand-bit split with nothing to elide (the r2 residual fits
    8 significand bits, so the last truncation is exact). Shared by
    patch_lookup and patch_lookup_cols — both paths MUST use the same split
    (their documented contract is bitwise-equal outputs).
    """
    def _chop(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.int32)
        part = jax.lax.bitcast_convert_type(
            (bits >> 16).astype(jnp.int16), jnp.bfloat16
        )
        kept = jax.lax.bitcast_convert_type(
            bits & jnp.int32(-65536), jnp.float32
        )
        return part, x - kept

    hi, r1 = _chop(table)
    mid, r2 = _chop(r1)
    lo, _ = _chop(r2)
    return jnp.concatenate([hi, mid, lo], axis=1)


def patch_lookup_cols(table: jnp.ndarray, patch_id: jnp.ndarray) -> jnp.ndarray:
    """Transposed-output lookup: result[c, i] = table[patch_id[i], c].

    Bitwise-equal to ``patch_lookup(table, patch_id).T`` (same single-addend
    selections, same (hi + mid) + lo part order), but the dot is issued in
    the (C, P) orientation so each output row is a full-lane (P,) vector:
    downstream per-point replay math (plane distances, peel tests, A-GLE
    selects) consumes rows with 128/128 lane utilization instead of slicing
    a (P, C) array whose minor-dim ops run at C/128 utilization (CLAUDE.md:
    a single minor-dim-4 elementwise op measured 45 us/frame at P=131k).

    Always the flat (S, P)-oriented one-hot. A 128-block factored variant
    (regroup the table to one K tile + hi-select epilogue over (P,) rows)
    was built and measured on-chip 2026-08-19: 593 us/iter vs 212 flat-cols
    vs 279 for the (P, C) orientation at P=131k, C=17 — the (nb*3C, P)
    intermediate + per-block epilogue more than erase the saved K tiles, so
    the factored form was removed.

    Args:
      table: (S, C) float32 (S == SPAD or any lane multiple).
      patch_id: (P,) int32; ids outside [0, S) yield an all-zero column.

    Returns:
      (C, P) float32.
    """
    packed = _chop_table(table)  # (S, 3C)
    s = table.shape[0]
    c = table.shape[1]
    pdt = patch_id.dtype

    _SITE[0] += 1
    iota = jnp.arange(s, dtype=pdt)
    iota = jax.lax.optimization_barrier(
        iota + pdt.type(_SITE[0])
    ) - pdt.type(_SITE[0])
    oh_t = (iota[:, None] == patch_id[None, :]).astype(jnp.bfloat16)  # (S, P)
    d = mxu_dot_c0(packed, oh_t)  # (3C, P)
    return (d[:c] + d[c : 2 * c]) + d[2 * c :]


def patch_reduce(feats: jnp.ndarray, patch_id: jnp.ndarray, width: int = SPAD) -> jnp.ndarray:
    """Segment-sum per-point features into patches: the scatter-add replacement.

    Args:
      feats: (P, C) float32 (pre-masked).
      patch_id: (P,) int32 in [0, width).

    Returns:
      (width, C) float32 sums.
    """
    # f32_dot_c0(oh, feats) == oh.T @ feats; the custom_vmap wrapper pins the
    # chunked engine's batching to per-chunk 2D dots (the mesh path's shape).
    return f32_dot_c0(patch_onehot(patch_id, width), feats)
