"""Batched closed-form symmetric 3x3 eigendecomposition.

The reference runs one Eigen::JacobiSVD per plane fit inside its patch loop
(reference: cpp/patchworkpp/src/patchworkpp.cpp:62-66). Iterative Jacobi
sweeps are a poor fit for the TPU's vector unit, so this solves all 504
patches at once with the trigonometric closed form (Cardano / Smith's
algorithm): eigenvalues in descending order and the eigenvector of the
*smallest* eigenvalue (the plane normal), which is what the pipeline needs.

All math is elementwise over the batch — pure VPU work, fusable by XLA.
NaN covariances (the reference's n==1 quirk) propagate to NaN outputs so the
downstream comparisons fail exactly like the C++ float arithmetic.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from patchworkpp_tpu.ops.trig import cardano_cos_pair

_EPS = 1e-12


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
    a00 = cov[..., 0, 0]
    a01 = cov[..., 0, 1]
    a02 = cov[..., 0, 2]
    a11 = cov[..., 1, 1]
    a12 = cov[..., 1, 2]
    a22 = cov[..., 2, 2]

    off_sq = a01 * a01 + a02 * a02 + a12 * a12
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
    # lower acos, and the fused kernel must execute byte-identical arithmetic
    # to this path so both resolve every eigenproblem the same way.
    cos_lo, cos_hi = cardano_cos_pair(r)

    two_p = 2.0 * p
    e0 = q + two_p * cos_lo
    e2 = q + two_p * cos_hi
    e1 = 3.0 * q - e0 - e2

    isotropic = p2 <= _EPS
    e0 = jnp.where(isotropic, q, e0)
    e1 = jnp.where(isotropic, q, e1)
    e2 = jnp.where(isotropic, q, e2)
    # NaN input must propagate (isotropic test is False for NaN, so it does).
    evals = jnp.stack([e0, e1, e2], axis=-1)

    # Eigenvector of e2: rows of (A - e2 I) span the orthogonal complement;
    # the largest cross product of two rows is the most robust choice.
    r0 = jnp.stack([a00 - e2, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - e2, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - e2], axis=-1)
    c_a = jnp.cross(r0, r1)
    c_b = jnp.cross(r0, r2)
    c_c = jnp.cross(r1, r2)
    n_a = jnp.sum(c_a * c_a, axis=-1)
    n_b = jnp.sum(c_b * c_b, axis=-1)
    n_c = jnp.sum(c_c * c_c, axis=-1)

    best_ab = jnp.where((n_a >= n_b)[..., None], c_a, c_b)
    nbest_ab = jnp.maximum(n_a, n_b)
    best = jnp.where((nbest_ab >= n_c)[..., None], best_ab, c_c)
    nbest = jnp.maximum(nbest_ab, n_c)

    # Degenerate (e1 == e2 or rank <= 1, e.g. a 2-point fit): the smallest
    # eigenvector is underdetermined — cross products are pure rounding noise
    # whose magnitude scales as (ulp * ||A||^2)^2, so the test must be
    # RELATIVE to ||A||_F^4. (An absolute 1e-12 let noise vectors through for
    # patches with ||A|| >~ 1, making the answer depend on summation order.)
    # Resolve the free choice deterministically with +z; the reference's
    # JacobiSVD makes its own arbitrary pick here (patchworkpp.cpp:62-66),
    # equally meaningless for rank-deficient fits.
    fro2 = a00 * a00 + a11 * a11 + a22 * a22 + 2.0 * off_sq
    degenerate = nbest <= jnp.float32(1e-12) * fro2 * fro2
    zhat = jnp.zeros_like(best).at[..., 2].set(1.0)
    vec = jnp.where(degenerate[..., None], zhat, best)
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
    vmin = vec / norm

    # NaN propagation: any non-finite covariance -> NaN normal (reference
    # behavior: JacobiSVD of a NaN matrix yields NaN, failing all comparisons).
    bad = ~jnp.isfinite(a00 + a11 + a22 + off_sq)
    vmin = jnp.where(bad[..., None], jnp.float32(jnp.nan), vmin)
    evals = jnp.where(bad[..., None], jnp.float32(jnp.nan), evals)

    flip = vmin[..., 2] < 0
    vmin = jnp.where(flip[..., None], -vmin, vmin)
    return evals, vmin
