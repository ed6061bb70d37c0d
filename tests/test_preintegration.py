"""Golden-value preintegration tests.

The expected matrices are the hard-coded ground truths of the reference's
test/preintegration_ut.cpp:37-93 (101 constant IMU samples at 100 Hz),
re-used verbatim as golden vectors for the JAX implementation.
"""

import numpy as np
import jax.numpy as jnp

from funny_lidar_slam_tpu.core.state import ImuSegment, NavState
from funny_lidar_slam_tpu.imu.preintegration import (
    PreintParams,
    PreintState,
    predict,
    preintegrate,
)

DEG2RAD = np.pi / 180.0


def make_constant_segment(n=102, dt=0.01, pad_to=None):
    pi_100 = np.pi / 100.0
    t = np.arange(n) * dt
    gyro = np.tile([pi_100, 3 * pi_100, 2 * pi_100], (n, 1))
    accel = np.tile([0.05, 0.09, 0.01], (n, 1))
    mask = np.ones(n, dtype=bool)
    if pad_to is not None:
        pad = pad_to - n
        t = np.concatenate([t, np.zeros(pad)])
        gyro = np.concatenate([gyro, np.zeros((pad, 3))])
        accel = np.concatenate([accel, np.full((pad, 3), 1e9)])  # poison padding
        mask = np.concatenate([mask, np.zeros(pad, dtype=bool)])
    quat = np.tile([1.0, 0, 0, 0], (len(t), 1))
    return ImuSegment(
        t=jnp.asarray(t, jnp.float64),
        gyro=jnp.asarray(gyro, jnp.float64),
        accel=jnp.asarray(accel, jnp.float64),
        quat=jnp.asarray(quat, jnp.float64),
        mask=jnp.asarray(mask),
    )


GYRO_SIGMA = 0.5 * DEG2RAD / 60.0
ACCEL_SIGMA = 0.1 / 60.0

DR_DBG_TRUE = np.array(
    [
        [-1.0078, -0.0325178, 0.0476759],
        [0.0315017, -1.00915, -0.017021],
        [-0.0483534, 0.0149887, -1.00831],
    ]
)
DP_DBA_TRUE = np.array(
    [
        [-0.509505, 0.0104964, -0.0160171],
        [-0.010748, -0.50984, 0.00505947],
        [0.0158494, -0.00556269, -0.509631],
    ]
)
DP_DBG_TRUE = np.array(
    [
        [-0.000389658, -0.00141794, 0.0154636],
        [0.00173211, -8.89504e-05, -0.00800937],
        [-0.0153229, 0.00828978, -0.000429069],
    ]
)
DV_DBA_TRUE = np.array(
    [
        [-1.00783, 0.0311926, -0.0478735],
        [-0.0321938, -1.00917, 0.0148455],
        [0.0472061, -0.0168477, -1.00833],
    ]
)
DV_DBG_TRUE = np.array(
    [
        [-0.00155298, -0.00396709, 0.0463807],
        [0.00521088, -0.000349525, -0.0234532],
        [-0.0458268, 0.0245691, -0.00170903],
    ]
)
COV_TRUE = np.array(
    [
        [2.136552508e-08, 5.272344755e-16, 3.514515723e-16, 9.832204912e-11, -1.411053378e-10, 9.42229404e-10, 3.284769798e-11, -4.847497497e-11, 3.138622159e-10],
        [5.272344755e-16, 2.136552648e-08, 1.054455785e-15, 6.053876664e-11, 2.317724315e-11, -5.588727736e-10, 2.126788336e-11, 7.924201899e-12, -1.900603586e-10],
        [3.514515723e-16, 1.054455785e-15, 2.13655256e-08, -9.788012618e-10, 4.878899472e-10, 1.084557875e-10, -3.263289837e-10, 1.662832065e-10, 3.626305183e-11],
        [9.832204912e-11, 6.053876664e-11, -9.788012618e-10, 2.80561634e-06, -3.082951384e-11, -3.005102462e-12, 1.416828348e-06, -1.180303206e-11, -1.156453233e-12],
        [-1.411053378e-10, 2.317724315e-11, 4.878899472e-10, -3.082951384e-11, 2.805571915e-06, -5.867706837e-12, -1.159484795e-11, 1.416811843e-06, -2.210844833e-12],
        [9.42229404e-10, -5.588727736e-10, 1.084557875e-10, -3.005102462e-12, -5.867706837e-12, 2.805631556e-06, -1.167211764e-12, -2.271471233e-12, 1.41683419e-06],
        [3.284769798e-11, 2.126788336e-11, -3.263289837e-10, 1.416828348e-06, -1.159484795e-11, -1.167211764e-12, 9.539681453e-07, -4.73368856e-12, -4.787299343e-13],
        [-4.847497497e-11, 7.924201899e-12, 1.662832065e-10, -1.180303206e-11, 1.416811843e-06, -2.271471233e-12, -4.73368856e-12, 9.539616032e-07, -9.125261858e-13],
        [3.138622159e-10, -1.900603586e-10, 3.626305183e-11, -1.156453233e-12, -2.210844833e-12, 1.41683419e-06, -4.787299343e-13, -9.125261858e-13, 9.539705362e-07],
    ]
)


def run_preintegration(pad_to=None):
    seg = make_constant_segment(pad_to=pad_to)
    # the reference golden test leaves integration_noise_cov_ at its zero
    # default (test/preintegration_ut.cpp:19-26)
    params = PreintParams.from_std(GYRO_SIGMA, ACCEL_SIGMA, 0.0, dtype=jnp.float64)
    zero = jnp.zeros(3, jnp.float64)
    return preintegrate(seg, params, bg=zero, ba=zero)


def rel_close(a, b, tol):
    # Eigen isApprox semantics: ||a - b|| <= tol * min(||a||, ||b||)
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) <= tol * min(np.linalg.norm(a), np.linalg.norm(b))


def test_bias_jacobians_golden():
    out = run_preintegration()
    assert rel_close(out.dr_dbg, DR_DBG_TRUE, 1e-3)
    assert rel_close(out.dp_dba, DP_DBA_TRUE, 1e-3)
    assert rel_close(out.dp_dbg, DP_DBG_TRUE, 1e-3)
    assert rel_close(out.dv_dba, DV_DBA_TRUE, 1e-3)
    assert rel_close(out.dv_dbg, DV_DBG_TRUE, 1e-3)


def test_covariance_golden():
    out = run_preintegration()
    assert rel_close(out.cov, COV_TRUE, 1e-9)
    assert abs(float(out.dt) - 1.01) < 1e-12


def test_padding_is_ignored():
    # poisoned padded rows (mask False) must not change any output
    ref = run_preintegration()
    padded = run_preintegration(pad_to=160)
    for a, b in zip(ref, padded):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)


def test_predict_constant_gyro_only():
    # pure rotation at constant rate, zero accel+gravity: P stays, R integrates
    n, dt = 101, 0.01
    w = np.array([0.0, 0.0, 0.5])
    t = np.arange(n) * dt
    seg = ImuSegment(
        t=jnp.asarray(t, jnp.float64),
        gyro=jnp.asarray(np.tile(w, (n, 1)), jnp.float64),
        accel=jnp.zeros((n, 3), jnp.float64),
        quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float64), (n, 1)),
        mask=jnp.ones(n, dtype=bool),
    )
    params = PreintParams.from_std(1e-4, 1e-3, dtype=jnp.float64)
    out = preintegrate(seg, params, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64))
    nav = NavState.identity(jnp.float64)
    pred = predict(out, nav, jnp.zeros(3, jnp.float64))
    theta = 0.5 * 1.0  # rate * total time
    expect_r = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    assert np.allclose(np.asarray(pred.r), expect_r, atol=1e-10)
    assert np.allclose(np.asarray(pred.p), 0.0, atol=1e-12)


def test_predict_gravity_freefall():
    # zero IMU readings, gravity only: p = 0.5 g t^2, v = g t
    n, dt = 11, 0.1
    t = np.arange(n) * dt
    seg = ImuSegment(
        t=jnp.asarray(t, jnp.float64),
        gyro=jnp.zeros((n, 3), jnp.float64),
        accel=jnp.zeros((n, 3), jnp.float64),
        quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float64), (n, 1)),
        mask=jnp.ones(n, dtype=bool),
    )
    params = PreintParams.from_std(1e-4, 1e-3, dtype=jnp.float64)
    out = preintegrate(seg, params, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64))
    g = jnp.asarray([0.0, 0.0, -9.8], jnp.float64)
    pred = predict(out, NavState.identity(jnp.float64), g)
    assert np.allclose(np.asarray(pred.v), [0, 0, -9.8], atol=1e-12)
    assert np.allclose(np.asarray(pred.p), [0, 0, -0.5 * 9.8], atol=1e-12)
