"""Cross-tile data movement for the fused fit kernel: MXU dots, no rolls.

Mosaic compile pathologies found by bisection (round 1): an in-kernel
(NT, 512) one-hot build + dot compiles >9 min; a single backward segmented
fill via sublane rolls ~6.6 min; lane-axis rolls minutes. All cross-tile
movement therefore rides MXU dots against 0/1 bf16 matrices precomputed in
XLA from ``tile_patch``:

- per-tile -> per-patch totals: ``_seg_dots(oh, v, transpose=True)`` with
  ``oh`` the (NT, SPAD) tile->patch one-hot;
- per-patch -> per-tile broadcast: ``_seg_dots(oh, w, transpose=False)``;
- the LPR quota's exclusive tile prefix: ``_prior_exclusive(lb, m)`` with
  ``lb`` the (NT, NT) strict-lower same-segment matrix.

Movement is exact: the matrices are 0/1 (exact bf16) and f32 payloads ride
the bf16x3 chop split (`_split3`). Totals sum the split parts separately
(ordinary f32 accumulation, same addend positions along the contraction
axis as any segment-matrix form); broadcasts have exactly one contributing
addend per output row, and 8+8+8 significand bits reconstruct every
normal-range f32 bitwise (Dekker).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split3(x):
    """f32 -> three bf16 terms summing back to x (exact for one addend).

    The movement matrices are exactly bf16 (0/1), so three bf16 column
    groups move f32 values through them faithfully."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    return hi, mid, r2.astype(jnp.bfloat16)


def _seg_dots(lb, v, transpose: bool):
    """out[t] = sum_u L[t,u] * v[u] (or L[u,t] with transpose=True).

    The three split parts are PACKED along the lane axis into one
    (R, 3C) operand: an MXU dot costs the same for C=10 as for C=128 (one
    lane tile), so one packed dot is ~3x cheaper than three narrow dots
    while computing bit-identical column sums (each output column is an
    independent contraction; the part slices are added in the same
    hi+mid+lo order as the unpacked form).
    """
    contract = 0 if transpose else 1
    dims = (((contract,), (0,)), ((), ()))
    c = v.shape[1]
    packed = jnp.concatenate(_split3(v), axis=1)  # (R, 3C) bf16
    d = jax.lax.dot_general(
        lb, packed, dims, preferred_element_type=jnp.float32
    )
    return d[:, :c] + d[:, c : 2 * c] + d[:, 2 * c :]


def _prior_exclusive(lb, v):
    """Exclusive segmented prefix over tiles: prior[t] = sum_{u<t, same seg} v[u]."""
    return _seg_dots(lb, v, transpose=False)
