"""Tight-coupling fusion tests.

Simulation-based, mirroring the reference's
test/preintegration_optimization_ut.cpp: a circular trajectory with biased,
noisy IMU plus noisy pose measurements; the rolling fusion must track the
trajectory and recover the IMU biases.
"""

import numpy as np
import jax.numpy as jnp

from funny_lidar_slam_tpu.core.state import ImuSegment, NavState
from funny_lidar_slam_tpu.imu.preintegration import PreintParams, PreintState, predict, preintegrate
from funny_lidar_slam_tpu.fusion.tight import TightFusionConfig, fuse

G = np.array([0.0, 0.0, -9.81])


def rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def circle_truth(t, radius=50.0, omega=0.1):
    p = radius * np.array([np.cos(omega * t), np.sin(omega * t), 0.0])
    v = radius * omega * np.array([-np.sin(omega * t), np.cos(omega * t), 0.0])
    a = -radius * omega**2 * np.array([np.cos(omega * t), np.sin(omega * t), 0.0])
    r = rz(omega * t + np.pi / 2)
    return r, v, p, a


def simulate(n_frames=40, imu_hz=100, frame_hz=10, gyro_bias=0.02, acc_bias=0.05,
             gyro_noise=1e-4, acc_noise=1e-3, meas_rot_noise=1e-3, meas_pos_noise=1e-2,
             omega=0.1, seed=0):
    rng = np.random.default_rng(seed)
    spf = imu_hz // frame_hz  # samples per frame
    bg = np.full(3, gyro_bias)
    ba = np.full(3, acc_bias)

    frames = []
    for k in range(n_frames):
        ts = (np.arange(spf + 1) + k * spf) / imu_hz
        gyro = np.zeros((spf + 1, 3))
        accel = np.zeros((spf + 1, 3))
        for i, t in enumerate(ts):
            r, v, p, a = circle_truth(t, omega=omega)
            gyro[i] = np.array([0, 0, omega]) + bg + rng.normal(0, gyro_noise, 3)
            accel[i] = r.T @ (a - G) + ba + rng.normal(0, acc_noise, 3)
        r, v, p, _ = circle_truth(ts[-1], omega=omega)
        meas_r = r @ np.asarray(
            np.linalg.matrix_power(rz(rng.normal(0, meas_rot_noise)), 1)
        )
        meas_p = p + rng.normal(0, meas_pos_noise, 3)
        frames.append((ts, gyro, accel, meas_r, meas_p, (r, v, p)))
    return frames


import functools
import jax


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fused_step(last, seg, lidar_pose, g, cfg, params):
    pre = preintegrate(seg, params, last.bg, last.ba)
    pred = predict(pre, last, g)
    return fuse(last, pre, lidar_pose, pred, g, cfg)


def run_fusion(frames, cfg, params, dtype=jnp.float64):
    r0, v0, p0, _ = circle_truth(0.0)
    info0 = np.zeros((15, 15))
    info0[0:3, 0:3] = np.eye(3) / 1e-12
    info0[3:6, 3:6] = np.eye(3) / 1e-4
    info0[6:9, 6:9] = np.eye(3) / 1e-12
    info0[9:12, 9:12] = np.eye(3) / (np.deg2rad(0.1) ** 2)
    info0[12:15, 12:15] = np.eye(3) / 0.01
    last = NavState(
        r=jnp.asarray(r0, dtype), v=jnp.asarray(v0, dtype), p=jnp.asarray(p0, dtype),
        bg=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype),
        info=jnp.asarray(info0, dtype), t=jnp.zeros((), dtype),
    )
    g = jnp.asarray(G, dtype)
    for ts, gyro, accel, meas_r, meas_p, truth in frames:
        seg = ImuSegment(
            t=jnp.asarray(ts, dtype), gyro=jnp.asarray(gyro, dtype),
            accel=jnp.asarray(accel, dtype),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (len(ts), 1)),
            mask=jnp.ones(len(ts), bool),
        )
        lidar_pose = jnp.eye(4, dtype=dtype)
        lidar_pose = lidar_pose.at[:3, :3].set(jnp.asarray(meas_r, dtype))
        lidar_pose = lidar_pose.at[:3, 3].set(jnp.asarray(meas_p, dtype))
        last = _fused_step(last, seg, lidar_pose, g, cfg, params)
    return last, truth


def test_fusion_tracks_and_recovers_biases():
    frames = simulate(n_frames=40)
    cfg = TightFusionConfig(iterations=15, lidar_rotation_std=1e-3, lidar_position_std=1e-2,
                            gyro_rw_std=1e-4, acc_rw_std=1e-4)
    params = PreintParams.from_std(1e-4, 1e-3, 1e-8, dtype=jnp.float64)
    last, truth = run_fusion(frames, cfg, params)
    r_t, v_t, p_t = truth
    # 4 s in: biases still converging; |v| = 5 m/s, radius 50 m
    assert np.linalg.norm(np.asarray(last.p) - p_t) < 0.15
    assert np.linalg.norm(np.asarray(last.v) - v_t) < 0.5
    assert np.linalg.norm(np.asarray(last.r) - r_t) < 0.05
    # bias recovery (true bg=0.02, ba=0.05 on each axis)
    bg = np.asarray(last.bg)
    assert np.allclose(bg, 0.02, atol=0.005), bg
    ba = np.asarray(last.ba)
    # z-accel bias is observable against gravity; x/y couple with attitude
    assert abs(ba[2] - 0.05) < 0.02, ba


def test_fusion_perfect_measurements_zero_bias():
    frames = simulate(n_frames=5, gyro_bias=0.0, acc_bias=0.0, gyro_noise=0.0,
                      acc_noise=0.0, meas_rot_noise=0.0, meas_pos_noise=0.0)
    cfg = TightFusionConfig(iterations=10, lidar_rotation_std=1e-3, lidar_position_std=1e-2)
    params = PreintParams.from_std(1e-4, 1e-3, 1e-8, dtype=jnp.float64)
    last, truth = run_fusion(frames, cfg, params)
    r_t, v_t, p_t = truth
    assert np.linalg.norm(np.asarray(last.p) - p_t) < 1e-3
    assert np.linalg.norm(np.asarray(last.v) - v_t) < 1e-3
    assert np.allclose(np.asarray(last.bg), 0.0, atol=1e-4)
    # posterior info stays symmetric PSD
    info = np.asarray(last.info)
    assert np.allclose(info, info.T, atol=1e-6 * np.abs(info).max())
    assert np.linalg.eigvalsh(info).min() > -1e-3


def test_loose_coupling_passthrough():
    from funny_lidar_slam_tpu.fusion.loose import fuse as loose_fuse

    nav = NavState.identity(jnp.float64)
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    out = loose_fuse(nav, jnp.asarray(pose))
    assert np.allclose(np.asarray(out.p), [1, 2, 3])
