"""Backend tests: pose-graph GN (mirroring the reference's
loopclosure_optimization_ut.cpp 60-pose noisy circle) and loop-closure
detection/verification."""

import numpy as np
import jax.numpy as jnp

from funny_lidar_slam_tpu.backend.pose_graph import PoseGraphBuilder, optimize
from funny_lidar_slam_tpu.backend import loop_closure as lc
from funny_lidar_slam_tpu.pipeline.keyframes import KeyFrame


def rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def circle_poses(n=60, radius=10.0):
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        t = np.eye(4)
        t[:3, :3] = rz(a)
        t[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0]
        poses.append(t)
    return np.asarray(poses)


def test_pose_graph_recovers_circle():
    # (reference: test/loopclosure_optimization_ut.cpp:50-90)
    rng = np.random.default_rng(0)
    gt = circle_poses(60)
    b = PoseGraphBuilder(k_cap=64, e_cap=128)

    # accumulate noisy odometry -> drifting vertex initial values
    acc = gt[0].copy()
    b.add_vertex(acc)
    for k in range(1, 60):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.eye(4)
        noise[:3, 3] = rng.normal(0, 0.02, 3)
        noise[:3, :3] = rz(rng.normal(0, 0.005))
        rel_noisy = rel @ noise
        acc = acc @ rel_noisy
        b.add_vertex(acc)  # also adds the odometry edge with this drift

    drift_before = np.linalg.norm(b.poses[59][:3, 3] - gt[59][:3, 3])

    # one loop edge with the true relative pose, strong information
    loop_rel = np.linalg.inv(gt[59]) @ gt[0]
    b.add_edge(59, 0, loop_rel, (1e4, 1e4, 1e4, 1e6, 1e6, 1e6))

    g = optimize(b.to_device(jnp.float64), iterations=25)
    out = np.asarray(g.poses)[:60]

    err_end = np.linalg.norm(out[59][:3, 3] - gt[59][:3, 3])
    assert err_end < drift_before * 0.5
    # the loop constraint must be satisfied tightly
    rel_after = np.linalg.inv(out[59]) @ out[0]
    assert np.linalg.norm(rel_after[:3, 3] - loop_rel[:3, 3]) < 1e-2
    # trajectory stays near the circle
    mean_err = np.mean(np.linalg.norm(out[:, :3, 3] - gt[:, :3, 3], axis=1))
    assert mean_err < 0.5, mean_err


def test_detect_by_distance_gap_and_radius():
    cfg = lc.LoopClosureConfig(skip_near_loopclosure=10, skip_near_keyframe=100)
    # 130 keyframes around a loop; kf 125 is near kf 5
    poses = circle_poses(126, radius=20.0)
    poses = np.concatenate([poses, poses[:10]])  # revisit
    cand = lc.detect_by_distance(poses, 130, last_loop_id=-100, cfg=cfg)
    assert cand is not None and 130 - cand > 100
    # throttle: recent loop -> no detection
    assert lc.detect_by_distance(poses, 130, last_loop_id=125, cfg=cfg) is None
    # far from everything: no candidate
    far = poses.copy()
    far[130, :3, 3] = [500, 500, 0]
    assert lc.detect_by_distance(far, 130, last_loop_id=-100, cfg=cfg) is None


def room(seed=0):
    g = np.arange(0.1, 12.0, 0.2, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = np.concatenate([
        np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], 1),
        np.stack([xx.ravel(), np.zeros(xx.size), yy.ravel()], 1),
        np.stack([np.zeros(xx.size), xx.ravel(), yy.ravel()], 1),
    ]).astype(np.float32) + np.float32([2, 3, 4])
    return pts


def test_verify_candidate_recovers_drift():
    """Current keyframe pose has drifted; verification must recover the true
    world pose against the candidate submap."""
    world = room()
    true_pose = np.eye(4)
    true_pose[:3, 3] = [1.0, 0.5, 0.2]
    true_pose[:3, :3] = rz(0.05)

    # candidate keyframe at identity holding the world cloud (world frame)
    kf0 = KeyFrame(0, 0.0, np.eye(4), world)
    # current keyframe: cloud in its own (true) frame
    inv_t = np.linalg.inv(true_pose)
    cloud_local = world @ inv_t[:3, :3].T + inv_t[:3, 3]
    kf1 = KeyFrame(1, 1.0, true_pose, cloud_local.astype(np.float32))

    frames = [kf0, kf1]
    drifted = true_pose.copy()
    drifted[:3, 3] += [0.6, -0.4, 0.1]  # simulated accumulated drift
    poses = np.stack([np.eye(4), drifted])

    cfg = lc.LoopClosureConfig(
        candidate_left=0, candidate_right=0, current_left=0,
        submap_capacity=16384, source_capacity=8192, map_capacity=32768,
        ndt_resolutions=(4.0, 2.0), fitness_threshold=1.5,
    )
    res = lc.verify_candidate(frames, poses, current_id=1, candidate_id=0, cfg=cfg)
    assert res is not None, "loop verification rejected a true loop"
    t_corr = poses[0] @ res.delta_pose
    assert np.linalg.norm(t_corr[:3, 3] - true_pose[:3, 3]) < 0.1, t_corr
    assert res.fitness < 0.5
