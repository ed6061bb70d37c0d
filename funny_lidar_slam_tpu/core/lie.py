"""Lie-group math for SO(3)/SE(3) — the L0 layer of the TPU-native SLAM engine.

Functional JAX re-design of the reference math library
(reference: include/common/math_function.h:52-470). Everything here is

  * batched: every function accepts arbitrary leading batch dimensions,
  * jit-safe: no data-dependent Python control flow (small-angle branches are
    `jnp.where` with safe denominators so both branches are NaN-free),
  * dtype-polymorphic: float32 on the TPU hot path, float64 on CPU for
    golden-value tests (preintegration covariance parity).

Conventions follow the reference:
  * `se3_exp` takes tangent vectors ordered [translation, rotation]
    (math_function.h:95-130), `se3_log` returns the same ordering.
  * `rotation_to_rpy` is the fixed-axis Rz*Ry*Rx euler extraction
    (math_function.h:133-151).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "so3_hat",
    "so3_vee",
    "so3_exp",
    "so3_log",
    "so3_jl",
    "so3_jr",
    "so3_jl_inv",
    "so3_jr_inv",
    "se3_exp",
    "se3_log",
    "se3_adj",
    "se3_jl",
    "se3_jr",
    "se3_inv",
    "make_se3",
    "rotation_to_rpy",
    "quat_mul",
    "quat_conj",
    "quat_to_mat",
    "mat_to_quat",
    "quat_nlerp",
    "quat_slerp",
    "marginalize",
]

_EPS = {jnp.float32: 1e-7, jnp.float64: 1e-12}


def _eps(dtype) -> float:
    return _EPS.get(jnp.dtype(dtype).type, 1e-7)


def _eye(n, like):
    return jnp.eye(n, dtype=like.dtype)


def so3_hat(v: jax.Array) -> jax.Array:
    """[..., 3] -> skew-symmetric [..., 3, 3]. (math_function.h:51-64)"""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(m: jax.Array) -> jax.Array:
    """Inverse of `so3_hat`: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _theta(v: jax.Array):
    """Return (theta, safe_theta) with safe_theta bounded away from 0."""
    theta_sq = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(theta_sq)
    eps = _eps(v.dtype)
    safe = jnp.maximum(theta, eps)
    return theta, safe, theta_sq


def so3_exp(v: jax.Array) -> jax.Array:
    """so(3) -> SO(3) via Rodrigues. [..., 3] -> [..., 3, 3].

    (math_function.h:66-89; small-angle limit -> 2nd order Taylor.)
    """
    theta, safe, theta_sq = _theta(v)
    small = theta < _eps(v.dtype) ** 0.5
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    vx = so3_hat(v)
    vx2 = vx @ vx
    return (
        _eye(3, v)
        + a[..., None, None] * vx
        + b[..., None, None] * vx2
    )


def mat_to_quat(r: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion [w, x, y, z], w >= 0.

    Branch-free Shepperd-style extraction: compute all four candidate columns
    and select the best-conditioned one with `where` masks.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (unnormalized), each valid where its pivot is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    sel = jax.nn.one_hot(best, 4, dtype=r.dtype)
    q = (
        sel[..., 0, None] * qw
        + sel[..., 1, None] * qx
        + sel[..., 2, None] * qy
        + sel[..., 3, None] * qz
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion [w, x, y, z] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, [w, x, y, z] convention."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_nlerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Normalized linear interpolation with shortest-path sign flip.

    (reference: include/common/motion_interpolator.h lerp path)
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    t = jnp.asarray(t, dtype=q0.dtype)[..., None] if jnp.ndim(t) == q0.ndim - 1 else t
    q = q0 + (q1 - q0) * t
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _eps(q0.dtype))


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation, nlerp fallback for nearly-parallel quats.

    (reference: include/common/motion_interpolator.h slerp path)
    """
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot[..., None] < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - _eps(q0.dtype)))
    sin_theta = jnp.maximum(jnp.sin(theta), _eps(q0.dtype))
    t = jnp.asarray(t, dtype=q0.dtype)
    w0 = jnp.sin((1.0 - t) * theta) / sin_theta
    w1 = jnp.sin(t * theta) / sin_theta
    close = dot > 1.0 - 1e-6
    q_slerp = w0[..., None] * q0 + w1[..., None] * q1
    q_nlerp = q0 + (q1 - q0) * t[..., None]
    q = jnp.where(close[..., None], q_nlerp, q_slerp)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _eps(q0.dtype))


def so3_log(r: jax.Array) -> jax.Array:
    """SO(3) -> so(3). [..., 3, 3] -> [..., 3].

    Quaternion-based like the reference (math_function.h:315-344): robust at
    theta = pi where the trace formula degenerates.
    """
    q = mat_to_quat(r)
    w = q[..., 0]
    vec = q[..., 1:]
    norm_vec = jnp.linalg.norm(vec, axis=-1)
    eps = _eps(r.dtype)
    small = norm_vec < eps
    phi = 2.0 * jnp.arctan2(norm_vec, w)
    u = vec / jnp.maximum(norm_vec, eps)[..., None]
    # small-angle: log ~= 2*vec/w (vec -> 0)
    small_log = 2.0 * vec / jnp.maximum(w, eps)[..., None]
    return jnp.where(small[..., None], small_log, phi[..., None] * u)


def so3_jl(v: jax.Array) -> jax.Array:
    """Left Jacobian of SO(3). (math_function.h:189-206)"""
    theta, safe, theta_sq = _theta(v)
    small = theta < _eps(v.dtype) ** 0.5
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (safe - jnp.sin(safe)) / (safe * safe * safe))
    vx = so3_hat(v)
    return _eye(3, v) + a[..., None, None] * vx + b[..., None, None] * (vx @ vx)


def so3_jr(v: jax.Array) -> jax.Array:
    """Right Jacobian of SO(3): Jr(v) = Jl(-v). (math_function.h:208-231)"""
    return so3_jl(-v)


def so3_jl_inv(v: jax.Array) -> jax.Array:
    """Inverse left Jacobian (closed form, Taylor-safe)."""
    theta, safe, theta_sq = _theta(v)
    small = theta < _eps(v.dtype) ** 0.5
    half = safe / 2.0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / (safe * safe)) - (jnp.cos(half) / (2.0 * safe * jnp.sin(half))),
    )
    vx = so3_hat(v)
    return _eye(3, v) - 0.5 * vx + cot_term[..., None, None] * (vx @ vx)


def so3_jr_inv(v: jax.Array) -> jax.Array:
    """Inverse right Jacobian: Jr_inv(v) = Jl_inv(-v)."""
    return so3_jl_inv(-v)


def _se3_q_block(rho: jax.Array, phi: jax.Array) -> jax.Array:
    """Upper-right Q block of the SE(3) left Jacobian.

    (math_function.h:233-289, Barfoot's closed form.)
    """
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq)
    eps = _eps(phi.dtype)
    small = theta_sq < eps
    safe = jnp.maximum(theta, eps)
    st, ct = jnp.sin(safe), jnp.cos(safe)
    it = 1.0 / safe
    it2 = it * it
    it4 = it2 * it2
    c1 = jnp.where(small, 1.0 / 6.0, it2 - st * it2 * it)
    c2 = jnp.where(small, 1.0 / 24.0, 0.5 * it2 + ct * it4 - it4)
    c3 = jnp.where(small, 1.0 / 120.0, it4 + 0.5 * ct * it4 - 1.5 * st * it * it4)

    U = so3_hat(rho)
    W = so3_hat(phi)
    WU = W @ U
    WUW = WU @ W
    UW = U @ W
    Q = (
        0.5 * U
        + c1[..., None, None] * (WU + UW + WUW)
        - c2[..., None, None] * (theta_sq[..., None, None] * U + 2.0 * WUW)
        + c3[..., None, None] * (WUW @ W + W @ WUW)
    )
    return Q


def se3_exp(v: jax.Array) -> jax.Array:
    """se(3) -> SE(3). v = [..., 6] ordered [translation, rotation].

    (math_function.h:91-131)
    """
    rho, phi = v[..., :3], v[..., 3:]
    r = so3_exp(phi)
    jl = so3_jl(phi)
    t = jnp.einsum("...ij,...j->...i", jl, rho)
    out = jnp.zeros(v.shape[:-1] + (4, 4), dtype=v.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_log(t_mat: jax.Array) -> jax.Array:
    """SE(3) -> se(3), [translation, rotation] ordering. (math_function.h:346-392)"""
    phi = so3_log(t_mat[..., :3, :3])
    jl_inv = so3_jl_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", jl_inv, t_mat[..., :3, 3])
    return jnp.concatenate([rho, phi], axis=-1)


def se3_adj(t_mat: jax.Array) -> jax.Array:
    """Adjoint of SE(3) for the [translation, rotation] tangent ordering.

    (math_function.h:300-313)
    """
    r = t_mat[..., :3, :3]
    p = t_mat[..., :3, 3]
    top = jnp.concatenate([r, so3_hat(p) @ r], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(r), r], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_jl(v: jax.Array) -> jax.Array:
    """Left Jacobian of SE(3), 6x6, [translation, rotation] ordering."""
    rho, phi = v[..., :3], v[..., 3:]
    j = so3_jl(phi)
    q = _se3_q_block(rho, phi)
    top = jnp.concatenate([j, q], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(j), j], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_jr(v: jax.Array) -> jax.Array:
    """Right Jacobian of SE(3): Jr(v) = Jl(-v). (math_function.h:291-298)"""
    return se3_jl(-v)


def se3_inv(t_mat: jax.Array) -> jax.Array:
    """Fast SE(3) inverse (no general 4x4 solve)."""
    r = t_mat[..., :3, :3]
    p = t_mat[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    out = jnp.zeros_like(t_mat)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rt, p))
    out = out.at[..., 3, 3].set(1.0)
    return out


def make_se3(r: jax.Array, p: jax.Array) -> jax.Array:
    """Assemble a 4x4 homogeneous transform from R [..., 3, 3] and p [..., 3]."""
    out = jnp.zeros(r.shape[:-2] + (4, 4), dtype=r.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(p)
    out = out.at[..., 3, 3].set(1.0)
    return out


def rotation_to_rpy(r: jax.Array) -> jax.Array:
    """Fixed-axis roll/pitch/yaw from R = Rz*Ry*Rx. (math_function.h:133-151)"""
    roll = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(-r[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def marginalize(h: jax.Array, start: int, end: int, sv_thresh: float = 1e-6) -> jax.Array:
    """Schur-marginalize the block [start, end] (inclusive) out of the square
    information matrix `h`, returning a same-shaped matrix whose marginalized
    rows/cols are zero.

    Mirrors the reference semantics (math_function.h:395-470, taken there from
    ORB-SLAM3): the pseudo-inverse of the marginalized block uses an SVD with
    singular values below `sv_thresh` zeroed. `start`/`end` must be static ints.
    """
    n = h.shape[-1]
    a = start
    b = end - start + 1
    c = n - (end + 1)

    idx_keep = list(range(0, a)) + list(range(end + 1, n))
    idx_marg = list(range(a, end + 1))
    perm = jnp.asarray(idx_keep + idx_marg)

    hp = h[..., perm, :][..., :, perm]
    k = a + c
    h_kk = hp[..., :k, :k]
    h_km = hp[..., :k, k:]
    h_mk = hp[..., k:, :k]
    h_mm = hp[..., k:, k:]

    # Jacobi-scale the marginalized block before the SVD pseudo-inverse:
    # information magnitudes span ~1e2..1e12, and an f32 SVD of the raw block
    # loses the small directions entirely (the reference runs this in f64,
    # math_function.h:395-470). The scaled threshold is relative, which is
    # what the absolute 1e-6 threshold means for a well-scaled double matrix.
    d_inv = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(h_mm, axis1=-2, axis2=-1), 1e-24))
    h_mm_s = h_mm * d_inv[..., :, None] * d_inv[..., None, :]
    u, s, vt = jnp.linalg.svd(h_mm_s, hermitian=False)
    s_inv = jnp.where(s > sv_thresh, 1.0 / jnp.maximum(s, sv_thresh), 0.0)
    pinv_s = jnp.swapaxes(vt, -1, -2) @ (s_inv[..., :, None] * jnp.swapaxes(u, -1, -2))
    h_mm_pinv = pinv_s * d_inv[..., :, None] * d_inv[..., None, :]

    h_marg = h_kk - h_km @ h_mm_pinv @ h_mk

    out = jnp.zeros_like(hp)
    out = out.at[..., :k, :k].set(h_marg)
    inv_perm = jnp.argsort(perm)
    return out[..., inv_perm, :][..., :, inv_perm]
