"""Closed-form batched small-matrix linear algebra (3x3 symmetric eig, inverse,
damped 6x6 solves).

On TPU, LAPACK-style factorizations of tiny matrices are grossly inefficient;
every op here is branch-free closed form over arbitrary leading batch dims, so
XLA fuses them into the surrounding residual kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3(a: jax.Array) -> jax.Array:
    """Inverse of [..., 3, 3] via adjugate."""
    m00, m01, m02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    m10, m11, m12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    m20, m21, m22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c01 + m02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def sym3_eigvalsh(a: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric [..., 3, 3], ascending [..., 3].

    Trigonometric closed form (Smith's algorithm), safe for repeated roots.
    """
    dtype = a.dtype
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    d = a - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(d * d, axis=(-2, -1))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, jnp.asarray(1e-30, dtype))
    b = d / safe_p[..., None, None]
    r = jnp.clip(jnp.linalg.det(b) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    lam0 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam2 = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    lams = jnp.stack([lam2, lam1, lam0], axis=-1)
    diag = jnp.stack([q, q, q], axis=-1)
    return jnp.where((p2 < 1e-30)[..., None], diag, lams)


def sym3_principal_eigvec(a: jax.Array, iters: int = 12) -> jax.Array:
    """Unit eigenvector of the largest eigenvalue of symmetric [..., 3, 3].

    Shifted power iteration (shift makes the target eigenvalue dominant even
    for indefinite inputs); deterministic start from the largest-diagonal
    axis plus a tiny fixed perturbation to escape orthogonal starts.
    """
    dtype = a.dtype
    # shift so that all eigenvalues are >= 0: a + (|max eig bound|) I
    bound = jnp.sum(jnp.abs(a), axis=(-1,))  # row sums [..., 3] (Gershgorin)
    shift = jnp.max(bound, axis=-1)
    m = a + shift[..., None, None] * jnp.eye(3, dtype=dtype)
    v = jnp.broadcast_to(
        jnp.asarray([0.577350269, 0.577350269, 0.577350269], dtype), a.shape[:-1]
    )
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", m, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def solve6_damped(h: jax.Array, g: jax.Array, damping: float = 1e-6) -> jax.Array:
    """Solve (H + damping*diag_scale*I) dx = g for 6x6 normal equations.

    The damping is scaled by the mean diagonal so it adapts to the problem's
    conditioning (replaces the reference's det==0 skip, icp_optimized.h:130).
    """
    diag_scale = jnp.maximum(jnp.trace(h, axis1=-2, axis2=-1) / 6.0, 1.0)
    hd = h + (damping * diag_scale)[..., None, None] * jnp.eye(6, dtype=h.dtype)
    return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(hd), g)
