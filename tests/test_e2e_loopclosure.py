"""End-to-end mapping with loop closure: a small fast circuit that revisits
its start; the system must detect and accept a loop and keep the keyframe
trajectory consistent after pose-graph optimization. The figure-8 variant
adds the harder acceptance scenario (aggressive yaw reversals and a
self-crossing revisit at a different heading — the stand-in for the
reference's multi-sequence validation, README.md:100-172)."""

import numpy as np

from funny_lidar_slam_tpu.backend.loop_closure import LoopClosureConfig
from funny_lidar_slam_tpu.io.simulator import (
    Figure8Trajectory, SimConfig, Trajectory, simulate)
from funny_lidar_slam_tpu.io.trajectory import ate_rmse
from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_TIGHT_OPT
from funny_lidar_slam_tpu.pipeline.system import SlamSystem, SystemConfig
from funny_lidar_slam_tpu.registration import matchers


def test_mapping_with_loopclosure():
    traj = Trajectory(radius=6.0, omega=0.7)  # ~9 s per revolution
    ds = simulate(
        SimConfig(duration=17.0, points_per_scan=4096, max_range=30.0, seed=5),
        traj=traj,
    )
    mcfg = matchers.IcpConfig(
        source_capacity=4096, cloud_capacity=4096, merged_capacity=16384,
        map_capacity=16384, source_filter_size=0.4, map_filter_size=0.4,
        local_map_size=20,
    )
    cfg = SystemConfig(
        registration_mode="IcpOptimized",
        matcher_config=mcfg,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        scan_capacity=4096,
        keyframe_delta_dist=0.8,
        enable_loopclosure=True,
        loopclosure=LoopClosureConfig(
            skip_near_loopclosure=10,
            skip_near_keyframe=15,
            near_neighbor_distance=4.0,
            candidate_left=3, candidate_right=3, current_left=3,
            submap_capacity=16384, source_capacity=8192, map_capacity=32768,
            ndt_resolutions=(4.0, 2.0),
            fitness_threshold=1.5,
        ),
        pose_graph_vertex_capacity=128,
        pose_graph_edge_capacity=256,
    )
    slam = SlamSystem(cfg)
    out = slam.run_dataset(ds)

    assert len(out["poses"]) > 80
    assert slam.graph.n_vertices >= 20
    # the circuit revisits its start: at least one accepted loop closure
    assert len(slam.loop_results) >= 1, "no loop closures accepted"
    for r in slam.loop_results:
        assert r.fitness < cfg.loopclosure.fitness_threshold
        assert r.current_id - r.candidate_id > cfg.loopclosure.skip_near_keyframe

    # keyframe trajectory (post-optimization) must match ground truth
    kf_times = [f.timestamp for f in slam.keyframes.frames]
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in kf_times])
    est = slam.keyframes.poses()
    ate = ate_rmse(est, gt, align=True)
    assert ate < 0.3, f"keyframe ATE {ate:.3f} m"


def test_mapping_with_loopclosure_figure8():
    """Self-crossing figure-8: the revisit happens at a ~90-degree heading
    difference (unlike the circle's tangential revisit), which exercises the
    coarse-to-fine NDT verification under real initial-rotation error."""
    traj = Figure8Trajectory(amp_x=10.0, amp_y=5.0, omega=0.45)  # ~14 s cycle
    ds = simulate(
        SimConfig(duration=17.0, points_per_scan=4096, max_range=30.0, seed=8),
        traj=traj,
    )
    mcfg = matchers.IcpConfig(
        source_capacity=4096, cloud_capacity=4096, merged_capacity=16384,
        map_capacity=16384, source_filter_size=0.4, map_filter_size=0.4,
        local_map_size=20,
    )
    cfg = SystemConfig(
        registration_mode="IcpOptimized",
        matcher_config=mcfg,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        scan_capacity=4096,
        keyframe_delta_dist=0.8,
        enable_loopclosure=True,
        loopclosure=LoopClosureConfig(
            skip_near_loopclosure=10,
            skip_near_keyframe=15,
            near_neighbor_distance=4.0,
            candidate_left=3, candidate_right=3, current_left=3,
            submap_capacity=16384, source_capacity=8192, map_capacity=32768,
            ndt_resolutions=(4.0, 2.0),
            fitness_threshold=1.5,
        ),
        pose_graph_vertex_capacity=128,
        pose_graph_edge_capacity=256,
    )
    slam = SlamSystem(cfg)
    out = slam.run_dataset(ds)

    assert len(out["poses"]) > 80
    # the center crossing must produce at least one accepted loop closure
    assert len(slam.loop_results) >= 1, "no loop closures accepted on the figure-8"
    for r in slam.loop_results:
        assert r.fitness < cfg.loopclosure.fitness_threshold
        assert r.current_id - r.candidate_id > cfg.loopclosure.skip_near_keyframe

    kf_times = [f.timestamp for f in slam.keyframes.frames]
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in kf_times])
    est = slam.keyframes.poses()
    ate = ate_rmse(est, gt, align=True)
    assert ate < 0.3, f"figure-8 keyframe ATE {ate:.3f} m"
