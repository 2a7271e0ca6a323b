"""Polynomial trig for the Cardano 3x3 eigensolver, Mosaic-compatible.

Mosaic (Pallas TPU) has no lowering for ``acos`` (and its ``cos``/``sin``
may differ from XLA's at the last ulp), so the closed-form eigensolver
cannot call the jnp transcendentals inside a kernel. These helpers build the
three quantities the solver needs from add/mul/sqrt only:

- ``acos(r)`` on [-1, 1]: Hastings' approximation (Abramowitz & Stegun
  4.4.45, 8-term), |err| < 2e-8 — below f32 evaluation noise.
- ``sin``/``cos`` on the NARROW range [0, pi/3] that ``acos(r)/3`` spans:
  Taylor series (truncation error < 4e-9 at pi/3), no range reduction.

Both ops/eigen3.py (the unfused XLA path) and ops/pallas/fit_kernel.py (the
fused kernels) call these same functions so the two engine paths execute
identical arithmetic and resolve every eigenproblem the same way.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.14159265358979323846

# Hastings / A&S 4.4.45: acos(x) = sqrt(1-x) * poly(x) for x in [0, 1].
_ACOS_COEF = (
    1.5707963050,
    -0.2145988016,
    0.0889789874,
    -0.0501743046,
    0.0308918810,
    -0.0170881256,
    0.0066700901,
    -0.0012624911,
)


def acos_poly(x: jnp.ndarray) -> jnp.ndarray:
    """acos on [-1, 1] via Hastings' polynomial (reflected for x < 0)."""
    ax = jnp.abs(x)
    poly = jnp.float32(_ACOS_COEF[-1])
    for c in _ACOS_COEF[-2::-1]:
        poly = poly * ax + jnp.float32(c)
    pos = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * poly
    return jnp.where(x >= 0, pos, jnp.float32(_PI) - pos)


def sin_narrow(phi: jnp.ndarray) -> jnp.ndarray:
    """sin(phi) for phi in [0, pi/3], Taylor to phi^11."""
    p2 = phi * phi
    s = jnp.float32(-1.0 / 39916800.0)
    for c in (1.0 / 362880.0, -1.0 / 5040.0, 1.0 / 120.0, -1.0 / 6.0, 1.0):
        s = s * p2 + jnp.float32(c)
    return s * phi


def cos_narrow(phi: jnp.ndarray) -> jnp.ndarray:
    """cos(phi) for phi in [0, pi/3], Taylor to phi^12."""
    p2 = phi * phi
    s = jnp.float32(1.0 / 479001600.0)
    for c in (-1.0 / 3628800.0, 1.0 / 40320.0, -1.0 / 720.0, 1.0 / 24.0,
              -1.0 / 2.0, 1.0):
        s = s * p2 + jnp.float32(c)
    return s


def cardano_cos_pair(r: jnp.ndarray):
    """(cos(phi), cos(phi + 2pi/3)) for phi = acos(r)/3, r in [-1, 1].

    These are the two Cardano multipliers the 3x3 eigensolver needs for the
    largest (e0) and smallest (e2) eigenvalues.
    """
    phi = acos_poly(r) * jnp.float32(1.0 / 3.0)
    c, s = cos_narrow(phi), sin_narrow(phi)
    # cos(phi + 2pi/3) = -cos(phi)/2 - sqrt(3)/2 * sin(phi)
    c_hi = jnp.float32(-0.5) * c - jnp.float32(0.8660254037844386) * s
    return c, c_hi
