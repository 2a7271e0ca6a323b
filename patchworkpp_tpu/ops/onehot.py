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

    Args:
      table: (S, C) float32 (S == SPAD).
      patch_id: (P,) int32 in [0, S).

    Returns:
      (P, C) float32.
    """
    return jnp.dot(patch_onehot(patch_id, table.shape[0]), table, precision=_PREC)


def patch_reduce(feats: jnp.ndarray, patch_id: jnp.ndarray, width: int = SPAD) -> jnp.ndarray:
    """Segment-sum per-point features into patches: the scatter-add replacement.

    Args:
      feats: (P, C) float32 (pre-masked).
      patch_id: (P,) int32 in [0, width).

    Returns:
      (width, C) float32 sums.
    """
    return jnp.dot(patch_onehot(patch_id, width).T, feats, precision=_PREC)
