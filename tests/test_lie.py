"""Lie-group unit tests mirroring the reference's math_function_ut.cpp cases
(SO3 hat/exp/log edge cases at 0, pi/2, pi/4, 3*pi, negatives; SE3 exp; RPY;
left/right Jacobians) plus batched round-trip and finite-difference checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from funny_lidar_slam_tpu.core import lie


def rodrigues_np(v):
    theta = np.linalg.norm(v)
    if theta < 1e-12:
        return np.eye(3)
    u = v / theta
    ux = np.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])
    return np.cos(theta) * np.eye(3) + (1 - np.cos(theta)) * np.outer(u, u) + np.sin(theta) * ux


def test_hat_zero():
    assert np.allclose(lie.so3_hat(jnp.zeros(3)), np.zeros((3, 3)))


def test_hat_values():
    m = np.asarray(lie.so3_hat(jnp.asarray([1.0, 2.0, 3.0])))
    expect = np.array([[0, -3, 2], [3, 0, -1], [-2, 1, 0]], dtype=float)
    assert np.allclose(m, expect)


@pytest.mark.parametrize(
    "v",
    [
        np.zeros(3),
        np.array([np.pi / 2, 0.0, 0.0]),
        np.array([np.pi / 4, 0.0, 0.0]),
        np.array([3.0 * np.pi, 0.0, 0.0]),
        np.array([-3.0 * np.pi, 0.0, 0.0]),
        np.array([0.1, -0.2, 0.3]),
        np.array([2.0 * np.pi, 0.0, 0.0]),
        np.array([1e-9, -1e-9, 1e-10]),
    ],
)
def test_so3_exp_matches_rodrigues(v):
    r = np.asarray(lie.so3_exp(jnp.asarray(v)))
    assert np.allclose(r, rodrigues_np(v), atol=1e-9)


def test_so3_exp_log_roundtrip_batched():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64, 3))
    # keep |v| < pi so log is unique
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1.0) * 3.0
    v = np.where(np.linalg.norm(v, axis=-1, keepdims=True) > 3.1, v * 0.5, v)
    r = lie.so3_exp(jnp.asarray(v))
    v2 = np.asarray(lie.so3_log(r))
    assert np.allclose(v, v2, atol=1e-8)


def test_so3_log_near_pi():
    v = np.array([np.pi - 1e-7, 0.0, 0.0])
    r = lie.so3_exp(jnp.asarray(v))
    v2 = np.asarray(lie.so3_log(r))
    assert np.allclose(v, v2, atol=1e-6)


def test_so3_jacobians_inverse_consistency():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(16, 3)))
    jl = lie.so3_jl(v)
    jl_inv = lie.so3_jl_inv(v)
    prod = np.asarray(jl @ jl_inv)
    assert np.allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-9)
    jr = np.asarray(lie.so3_jr(v))
    jl_neg = np.asarray(lie.so3_jl(-v))
    assert np.allclose(jr, jl_neg)


def test_so3_jr_finite_difference():
    # Exp(v + Jr(v) dv) ~= Exp(v) Exp(dv) for small dv
    rng = np.random.default_rng(2)
    v = rng.normal(size=3)
    dv = rng.normal(size=3) * 1e-6
    jr = np.asarray(lie.so3_jr(jnp.asarray(v)))
    lhs = np.asarray(lie.so3_exp(jnp.asarray(v) + jnp.asarray(jr @ dv)))
    rhs = np.asarray(lie.so3_exp(jnp.asarray(v))) @ np.asarray(lie.so3_exp(jnp.asarray(dv)))
    assert np.allclose(lhs, rhs, atol=1e-10)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(32, 6))
    # rotation magnitude must stay below pi for log to be the exact inverse
    rot_norm = np.linalg.norm(v[:, 3:], axis=-1, keepdims=True)
    v[:, 3:] *= np.minimum(1.0, 3.0 / np.maximum(rot_norm, 1e-9))
    t = lie.se3_exp(jnp.asarray(v))
    v2 = np.asarray(lie.se3_log(t))
    assert np.allclose(v, v2, atol=1e-8)


def test_se3_exp_zero_rotation():
    v = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    t = np.asarray(lie.se3_exp(v))
    assert np.allclose(t[:3, :3], np.eye(3))
    assert np.allclose(t[:3, 3], [1.0, 2.0, 3.0])


def test_se3_inv():
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.normal(size=(8, 6)))
    t = lie.se3_exp(v)
    prod = np.asarray(t @ lie.se3_inv(t))
    assert np.allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-12)


def test_se3_adjoint_identity():
    # Adj(T) * log(X) == log(T X T^-1)
    rng = np.random.default_rng(5)
    t = lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.5))
    x = jnp.asarray(rng.normal(size=6) * 0.3)
    lhs = np.asarray(lie.se3_adj(t) @ x)
    rhs = np.asarray(lie.se3_log(t @ lie.se3_exp(x) @ lie.se3_inv(t)))
    assert np.allclose(lhs, rhs, atol=1e-9)


def test_se3_jr_finite_difference():
    rng = np.random.default_rng(6)
    v = rng.normal(size=6) * 0.7
    dv = rng.normal(size=6) * 1e-6
    jr = np.asarray(lie.se3_jr(jnp.asarray(v)))
    lhs = np.asarray(lie.se3_exp(jnp.asarray(v + jr @ dv)))
    rhs = np.asarray(lie.se3_exp(jnp.asarray(v)) @ lie.se3_exp(jnp.asarray(dv)))
    assert np.allclose(lhs, rhs, atol=1e-9)


def test_rpy():
    roll, pitch, yaw = 0.1, -0.2, 0.3

    def rot_x(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def rot_y(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rot_z(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    r = rot_z(yaw) @ rot_y(pitch) @ rot_x(roll)
    rpy = np.asarray(lie.rotation_to_rpy(jnp.asarray(r)))
    assert np.allclose(rpy, [roll, pitch, yaw], atol=1e-12)


def test_quat_roundtrip():
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(size=(32, 3)))
    r = lie.so3_exp(v)
    q = lie.mat_to_quat(r)
    r2 = np.asarray(lie.quat_to_mat(q))
    assert np.allclose(np.asarray(r), r2, atol=1e-12)


def test_quat_mul_matches_mat_mul():
    rng = np.random.default_rng(8)
    ra = lie.so3_exp(jnp.asarray(rng.normal(size=(4, 3))))
    rb = lie.so3_exp(jnp.asarray(rng.normal(size=(4, 3))))
    qa, qb = lie.mat_to_quat(ra), lie.mat_to_quat(rb)
    lhs = np.asarray(lie.quat_to_mat(lie.quat_mul(qa, qb)))
    rhs = np.asarray(ra @ rb)
    assert np.allclose(lhs, rhs, atol=1e-12)


def test_slerp_endpoints_and_midpoint():
    qa = lie.mat_to_quat(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.0])))
    qb = lie.mat_to_quat(lie.so3_exp(jnp.asarray([np.pi / 2, 0.0, 0.0])))
    q0 = np.asarray(lie.quat_slerp(qa, qb, jnp.asarray(0.0)))
    q1 = np.asarray(lie.quat_slerp(qa, qb, jnp.asarray(1.0)))
    qm = lie.quat_slerp(qa, qb, jnp.asarray(0.5))
    assert np.allclose(q0, np.asarray(qa), atol=1e-9)
    assert np.allclose(q1, np.asarray(qb), atol=1e-9)
    rm = np.asarray(lie.quat_to_mat(qm))
    assert np.allclose(rm, rodrigues_np(np.array([np.pi / 4, 0, 0])), atol=1e-9)


def test_marginalize_schur():
    # Marginalizing block [3, 5] of a PD matrix == classic Schur complement.
    rng = np.random.default_rng(9)
    a = rng.normal(size=(9, 9))
    h = a @ a.T + 9 * np.eye(9)
    out = np.asarray(lie.marginalize(jnp.asarray(h), 3, 5))
    keep = [0, 1, 2, 6, 7, 8]
    marg = [3, 4, 5]
    h_kk = h[np.ix_(keep, keep)]
    h_km = h[np.ix_(keep, marg)]
    h_mm = h[np.ix_(marg, marg)]
    expect = h_kk - h_km @ np.linalg.inv(h_mm) @ h_km.T
    assert np.allclose(out[np.ix_(keep, keep)], expect, atol=1e-8)
    assert np.allclose(out[np.ix_(marg, marg)], 0.0)
    assert np.allclose(out[np.ix_(keep, marg)], 0.0)


def test_marginalize_leading_block():
    # The frontend marginalizes [0, 14] out of the 30x30 posterior
    # (reference: src/slam/frontend.cpp:425).
    rng = np.random.default_rng(10)
    a = rng.normal(size=(30, 30))
    h = a @ a.T + 30 * np.eye(30)
    out = np.asarray(lie.marginalize(jnp.asarray(h), 0, 14))
    h_kk = h[15:, 15:]
    h_km = h[15:, :15]
    h_mm = h[:15, :15]
    expect = h_kk - h_km @ np.linalg.inv(h_mm) @ h_km.T
    assert np.allclose(out[15:, 15:], expect, atol=1e-8)
