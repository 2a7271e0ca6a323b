"""Batched symmetric 3x3 eigendecomposition: Cardano + clustered deflation.

The reference runs one Eigen::JacobiSVD per plane fit inside its patch loop
(reference: cpp/patchworkpp/src/patchworkpp.cpp:62-66). Iterative Jacobi
sweeps are a poor fit for the TPU's vector unit, so this solves all 504
patches at once in closed form (Cardano / Smith): eigenvalues in descending
order and the eigenvector of the *smallest* eigenvalue (the plane normal).

The textbook eigenvector construction — largest cross product of rows of
(A - e2 I) — is accurate while the two small eigenvalues are separated
(measured median error 3e-5 rad vs LAPACK f64), but it loses sqrt(eps)
accuracy when they cluster (e1 ~ e2, a line-like patch): Cardano's
clustered roots carry O(sqrt(eps)*||A||) error that the eigenvector
amplifies by 1/(e1 - e2). Measured consequence (scan 000004, patch 343:
6 near-collinear points, e = {5.85, 0.0100, 0.0082}): 1-ulp covariance
differences between backends rotated the computed normal by DEGREES and
flipped its uprightness decision, while the true (f64) normal had a 0.023
margin.

So the vector path is a branchless HYBRID:

- (e1 - e2) > 1% of ||A||_F: the original cross-product-at-e2 form in
  the kernels' component formulation (the stacked jnp.cross variant the
  old XLA path used fuses differently by up to an ulp — the two original
  forms were never bitwise-equal to EACH OTHER; fused == unfused was
  always a label-level invariant);
- clustered pair: DEFLATION — eigenvector v0 of the isolated largest root
  from cross products of (A - e0 I) rows (if e0 ~ e1 instead, v0's
  in-cluster rotation is harmless: v2 is orthogonal to the whole cluster
  plane), then project A onto span{u1, u2} = v0-perp and solve the stable
  2x2 closed form. Error is O(eps * ||A|| / gap) — the intrinsic
  conditioning, same class as Eigen's Jacobi iterations — instead of
  O(sqrt(eps)) luck. (Measured: max 4.5e-4 rad over random PSD batches vs
  the old form's unbounded tail.)

Eigenvalues are the ORIGINAL Cardano expressions in all cases (bit-identical
flatness/line_variable to every previously validated run).

All math is elementwise over the batch — add/mul/sqrt/select plus the
shared trig polynomials (ops/trig.py), Mosaic-compatible: the fused kernels
execute THIS file's arithmetic via eig3_plane_columns, so every engine
resolves every eigenproblem identically. NaN covariances (the reference's
n==1 quirk) propagate to NaN outputs so downstream comparisons fail exactly
like the C++ float arithmetic.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from patchworkpp_tpu.ops.trig import cardano_cos_pair

_EPS = 1e-12
_TINY = 1e-30
# Relative (e1 - e2) gap below which the deflated construction takes over.
# At the boundary both forms agree to ~2e-3 rad; above it the original form
# is the more accurate one (and bit-preserves all previously locked
# behavior), below it the original form's error diverges as 1/gap.
_CLUSTER_REL_GAP = 1e-2


def _cross3(px, py, pz, qx, qy, qz):
    return (
        py * qz - pz * qy,
        pz * qx - px * qz,
        px * qy - py * qx,
    )


def _best_row_cross(
    d00, a01, a02, d11, a12, d22
):
    """Largest cross product of two rows of the symmetric matrix with
    diagonal (d00, d11, d22) and off-diagonals (a01, a02, a12).
    Returns (vx, vy, vz, nbest)."""
    ax, ay, az = _cross3(d00, a01, a02, a01, d11, a12)
    bx, by, bz = _cross3(d00, a01, a02, a02, a12, d22)
    cx, cy, cz = _cross3(a01, d11, a12, a02, a12, d22)
    na = ax * ax + ay * ay + az * az
    nb = bx * bx + by * by + bz * bz
    nc = cx * cx + cy * cy + cz * cz
    use_a = na >= nb
    vx = jnp.where(use_a, ax, bx)
    vy = jnp.where(use_a, ay, by)
    vz = jnp.where(use_a, az, bz)
    nab = jnp.maximum(na, nb)
    use_ab = nab >= nc
    vx = jnp.where(use_ab, vx, cx)
    vy = jnp.where(use_ab, vy, cy)
    vz = jnp.where(use_ab, vz, cz)
    return vx, vy, vz, jnp.maximum(nab, nc)


def eig3_plane_columns(a00, a01, a02, a11, a12, a22):
    """Column-form core shared by the XLA paths and the Pallas kernels.

    Args: the six distinct entries of symmetric 3x3 batches, any
      broadcast-compatible elementwise shape (the kernels pass (S, 1)
      columns, eigh3x3_descending passes (...,) arrays).

    Returns:
      (e0, e1, e2, vx, vy, vz): eigenvalues descending and the UNFLIPPED
      unit eigenvector of e2 (callers apply the nz >= 0 sign fix).
      Degenerate pencils (rank <= 1, isotropic) resolve to +z
      deterministically; non-finite input propagates NaN.
    """
    off_sq = a01 * a01 + a02 * a02 + a12 * a12
    fro2 = a00 * a00 + a11 * a11 + a22 * a22 + 2.0 * off_sq
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * off_sq
    p = jnp.sqrt(p2 / 6.0)

    # r = det(B/p) / 2, clipped into acos domain.
    safe_p = jnp.where(p > _EPS, p, 1.0)
    c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
    c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    # Polynomial trig (ops/trig.py) instead of jnp.arccos/cos: Mosaic cannot
    # lower acos, and the fused kernels must execute byte-identical
    # arithmetic to this path.
    cos_lo, cos_hi = cardano_cos_pair(r)

    two_p = 2.0 * p
    e0 = q + two_p * cos_lo
    e2 = q + two_p * cos_hi
    e1 = 3.0 * q - e0 - e2

    isotropic = p2 <= _EPS
    e0v = jnp.where(isotropic, q, e0)
    e1v = jnp.where(isotropic, q, e1)
    e2v = jnp.where(isotropic, q, e2)

    # ---- separated-pair construction (the original kernel-form
    # construction, op-for-op): eigenvector of e2 from the largest cross
    # product of (A - e2 I) rows.
    sx, sy, sz, nbest_s = _best_row_cross(
        a00 - e2, a01, a02, a11 - e2, a12, a22 - e2
    )
    # Scale-relative degeneracy (rank <= 1, e.g. a 2-point fit): the cross
    # products are rounding noise of magnitude (ulp * ||A||^2)^2 — test
    # RELATIVE to ||A||_F^4 and resolve the free choice deterministically
    # with +z (the reference's JacobiSVD makes its own arbitrary pick here,
    # patchworkpp.cpp:62-66, equally meaningless for rank-deficient fits).
    degen_s = nbest_s <= jnp.float32(1e-12) * fro2 * fro2
    sx = jnp.where(degen_s, 0.0, sx)
    sy = jnp.where(degen_s, 0.0, sy)
    sz = jnp.where(degen_s, 1.0, sz)
    norm_s = jnp.sqrt(sx * sx + sy * sy + sz * sz)
    sx, sy, sz = sx / norm_s, sy / norm_s, sz / norm_s

    # ---- clustered-pair construction: deflation from the isolated end.
    vx0, vy0, vz0, nbest0 = _best_row_cross(
        a00 - e0, a01, a02, a11 - e0, a12, a22 - e0
    )
    degen0 = nbest0 <= jnp.float32(1e-12) * fro2 * fro2
    inv0 = 1.0 / jnp.sqrt(jnp.maximum(nbest0, jnp.float32(_TINY)))
    vx0, vy0, vz0 = vx0 * inv0, vy0 * inv0, vz0 * inv0

    # u1, u2: orthonormal basis of v0-perp — branchless pick of the larger
    # of cross(v0, x-hat) = (0, vz, -vy) and cross(v0, y-hat) = (-vz, 0, vx)
    # (at least one has squared norm >= 1/2 for unit v0), then u2 = v0 x u1.
    nux = vy0 * vy0 + vz0 * vz0
    nuy = vx0 * vx0 + vz0 * vz0
    use_x = nux >= nuy
    u1x = jnp.where(use_x, 0.0, -vz0)
    u1y = jnp.where(use_x, vz0, 0.0)
    u1z = jnp.where(use_x, -vy0, vx0)
    inv1 = 1.0 / jnp.sqrt(
        jnp.maximum(jnp.maximum(nux, nuy), jnp.float32(_TINY))
    )
    u1x, u1y, u1z = u1x * inv1, u1y * inv1, u1z * inv1
    u2x, u2y, u2z = _cross3(vx0, vy0, vz0, u1x, u1y, u1z)

    # B = [u1 u2]^T A [u1 u2] (2x2 symmetric), via w_i = A u_i.
    w1x = a00 * u1x + a01 * u1y + a02 * u1z
    w1y = a01 * u1x + a11 * u1y + a12 * u1z
    w1z = a02 * u1x + a12 * u1y + a22 * u1z
    w2x = a00 * u2x + a01 * u2y + a02 * u2z
    w2y = a01 * u2x + a11 * u2y + a12 * u2z
    w2z = a02 * u2x + a12 * u2y + a22 * u2z
    t11 = u1x * w1x + u1y * w1y + u1z * w1z
    t12 = u1x * w2x + u1y * w2y + u1z * w2z
    t22 = u2x * w2x + u2y * w2y + u2z * w2z

    # Stable 2x2: smaller root mean - s; its eigenvector from the larger of
    # the two row-null candidates.
    mean2 = 0.5 * (t11 + t22)
    dd = 0.5 * (t11 - t22)
    s2x2 = jnp.sqrt(dd * dd + t12 * t12)
    lam = mean2 - s2x2
    ca1, ca2 = t12, lam - t11
    cb1, cb2 = lam - t22, t12
    na2 = ca1 * ca1 + ca2 * ca2
    nb2 = cb1 * cb1 + cb2 * cb2
    use_ca = na2 >= nb2
    g1 = jnp.where(use_ca, ca1, cb1)
    g2 = jnp.where(use_ca, ca2, cb2)
    wn2 = jnp.maximum(na2, nb2)
    # Pair degeneracy at f32 resolution (incl. rank-1, where B is pure
    # noise): wn2 ~ gap^2, so test relative to ||A||_F^2.
    degen2 = wn2 <= jnp.float32(1e-12) * fro2
    invw = 1.0 / jnp.sqrt(jnp.maximum(wn2, jnp.float32(_TINY)))
    g1, g2 = g1 * invw, g2 * invw

    dx = g1 * u1x + g2 * u2x
    dy = g1 * u1y + g2 * u2y
    dz = g1 * u1z + g2 * u2z
    invn = 1.0 / jnp.sqrt(
        jnp.maximum(dx * dx + dy * dy + dz * dz, jnp.float32(_TINY))
    )
    dx, dy, dz = dx * invn, dy * invn, dz * invn

    # Deflated-path degenerate resolution (+z), mirroring the old rule.
    degen_d = degen0 | degen2
    dx = jnp.where(degen_d, 0.0, dx)
    dy = jnp.where(degen_d, 0.0, dy)
    dz = jnp.where(degen_d, 1.0, dz)

    # ---- hybrid select between the two finished unit vectors.
    fro = jnp.sqrt(fro2)
    clustered = (e1 - e2) <= jnp.float32(_CLUSTER_REL_GAP) * fro
    vx = jnp.where(clustered, dx, sx)
    vy = jnp.where(clustered, dy, sy)
    vz = jnp.where(clustered, dz, sz)

    # NaN propagation: any non-finite covariance -> NaN outputs (reference:
    # JacobiSVD of a NaN matrix yields NaN, failing all comparisons).
    bad = ~jnp.isfinite(a00 + a11 + a22 + off_sq)
    nanv = jnp.float32(jnp.nan)
    vx = jnp.where(bad, nanv, vx)
    vy = jnp.where(bad, nanv, vy)
    vz = jnp.where(bad, nanv, vz)
    e0v = jnp.where(bad, nanv, e0v)
    e1v = jnp.where(bad, nanv, e1v)
    e2v = jnp.where(bad, nanv, e2v)
    return e0v, e1v, e2v, vx, vy, vz


def eigh3x3_descending(cov: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigen-decompose a batch of symmetric 3x3 matrices.

    Args:
      cov: (..., 3, 3) float32 symmetric matrices.

    Returns:
      evals: (..., 3) eigenvalues, descending (evals[...,2] is the smallest —
        the reference's "flatness"; evals[...,0]/evals[...,1] its
        "line_variable" numerator/denominator).
      vmin: (..., 3) unit eigenvector of the smallest eigenvalue, sign-fixed
        so vmin[..., 2] >= 0 (reference sign flip at patchworkpp.cpp:68).
    """
    e0, e1, e2, vx, vy, vz = eig3_plane_columns(
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
    )
    evals = jnp.stack([e0, e1, e2], axis=-1)
    vmin = jnp.stack([vx, vy, vz], axis=-1)
    flip = vmin[..., 2] < 0
    vmin = jnp.where(flip[..., None], -vmin, vmin)
    return evals, vmin
