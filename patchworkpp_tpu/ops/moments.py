"""Masked per-patch second-order moments — the reduction behind every plane fit.

The reference runs a tiny 3x3 covariance + SVD per patch inside a sequential
loop (reference: cpp/patchworkpp/src/patchworkpp.cpp:47-75, invoked up to ~6x
per patch from :467-549). Here all 504 patches are reduced at once: one
masked segment-sum of the 10 monomials [1, x, y, z, xx, xy, xz, yy, yz, zz]
computed on *shifted* coordinates (a static per-patch center offset) so the
f32 E[xx] - E[x]E[x] cancellation stays far from the covariance magnitude.

Two implementations:
- jnp segment_sum (reference path, runs everywhere);
- Pallas one-hot MXU matmul kernel (ops/pallas/), validated against this one.

Known tolerance class (accepted; same family as the f32 binning boundary
note in ops/binning.py): the reference computes its covariance TWO-PASS
(subtract the data mean, then square — patchworkpp.cpp:56-58), while this
one-pass raw-moment form pays E[qq] - E[q]E[q] cancellation against the
offset of the patch centroid from the static shift point. On the golden
KITTI scans every label is exact (full-res, 12/12), but adversarially noisy
synthetic clouds can flip near-threshold patch decisions (~0.2-0.7% of
points measured on uniform-disk clouds with heavy z-noise). A two-pass form
would double the fused kernel's per-pass reduction work; fidelity is
validated where it matters: against the compiled reference on real scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moment_features(q: jnp.ndarray) -> jnp.ndarray:
    """(P,3) shifted coords -> (P,10) monomials [1,x,y,z,xx,xy,xz,yy,yz,zz]."""
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [one, x, y, z, x * x, x * y, x * z, y * y, y * z, z * z], axis=1
    )


def masked_moment_features_cols(
    qx: jnp.ndarray, qy: jnp.ndarray, qz: jnp.ndarray, mask_f: jnp.ndarray
) -> jnp.ndarray:
    """(P,) shifted coordinate columns + 0/1 f32 mask -> masked (P, 10) monomials.

    Bitwise-equal to ``moment_features(q) * mask_f[:, None]`` but built from
    full-lane (P,) columns with the mask FOLDED into the coordinates: for
    m in {0, 1}, (m*x)*(m*y) == (x*y)*m exactly (m=1: identical product;
    m=0: both are a zero of the same sign, sign(x)*sign(y)). The m=0 case
    assumes the monomials x*y / x*x are FINITE (inf * 0 would make the old
    form NaN and this form 0) — guaranteed upstream by _sanitize_nonfinite's
    |coord| < 1e9 gate (pipeline.py), whose squares stay < f32 max. The
    first column is m itself. This removes the (P, 10) minor-dim elementwise
    multiply (10/128 lane utilization) and keeps every monomial a full-lane
    op; only the final stack (the MXU dot operand) is (P, 10)-shaped.
    """
    mx = qx * mask_f
    my = qy * mask_f
    mz = qz * mask_f
    return jnp.stack(
        [
            mask_f, mx, my, mz,
            mx * mx, mx * my, mx * mz, my * my, my * mz, mz * mz,
        ],
        axis=1,
    )


def masked_patch_moments(
    q: jnp.ndarray,
    mask: jnp.ndarray,
    patch_id: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Per-patch masked moment sums.

    Args:
      q: (P, 3) float32 shifted coordinates.
      mask: (P,) bool — which points participate in the fit.
      patch_id: (P,) int32 segment ids.
      num_segments: number of buckets (num_patches + 1 incl. overflow).

    Returns:
      (num_segments, 10) float32 moment sums.
    """
    feats = moment_features(q) * mask[:, None].astype(q.dtype)
    return jax.ops.segment_sum(
        feats, patch_id, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def moments_to_mean_cov(moments: jnp.ndarray, shift: jnp.ndarray):
    """Convert moment sums to (n, mean, cov) with the C++ n-1 denominator.

    Returns n (S,), mean (S,3) in unshifted coordinates, cov (S,3,3).
    n == 1 yields a NaN covariance (0/0), matching the reference's float
    arithmetic whose NaNs then fail every downstream comparison.
    """
    n = moments[:, 0]
    safe_n = jnp.maximum(n, 1.0)
    mean_q = moments[:, 1:4] / safe_n[:, None]
    sxx, sxy, sxz = moments[:, 4], moments[:, 5], moments[:, 6]
    syy, syz, szz = moments[:, 7], moments[:, 8], moments[:, 9]
    mx, my, mz = mean_q[:, 0], mean_q[:, 1], mean_q[:, 2]
    denom = n - 1.0  # == 0 for n == 1 -> inf/nan, as in the reference
    cxx = (sxx - n * mx * mx) / denom
    cxy = (sxy - n * mx * my) / denom
    cxz = (sxz - n * mx * mz) / denom
    cyy = (syy - n * my * my) / denom
    cyz = (syz - n * my * mz) / denom
    czz = (szz - n * mz * mz) / denom
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], axis=-1),
            jnp.stack([cxy, cyy, cyz], axis=-1),
            jnp.stack([cxz, cyz, czz], axis=-1),
        ],
        axis=-2,
    )
    mean = mean_q + shift
    return n, mean, cov
