"""End-to-end mapping test on the synthetic dataset: the full pipeline
(IMU static init -> deskew -> preintegration -> ICP odometry -> tight fusion
-> keyframing) must track the simulated trajectory within an ATE gate.

This is the PR1 minimum slice of SURVEY.md §7 (M2DGR-style config:
Optimized-ICP frontend, no loop closure) running on the simulator."""

import numpy as np

from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate
from funny_lidar_slam_tpu.io.trajectory import ate_rmse
from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_LOOSE, FUSION_TIGHT_OPT
from funny_lidar_slam_tpu.pipeline.system import SlamSystem, SystemConfig
from funny_lidar_slam_tpu.registration import matchers


def small_dataset():
    cfg = SimConfig(
        duration=10.0,
        points_per_scan=4096,
        max_range=35.0,
        seed=3,
    )
    return simulate(cfg)


ICP_CFG = matchers.IcpConfig(
    source_capacity=4096,
    cloud_capacity=4096,
    merged_capacity=16384,
    map_capacity=16384,
    max_correspond_distance=1.0,
    source_filter_size=0.4,
    map_filter_size=0.4,
    nn_voxel_size=1.0,
    local_map_size=20,
)


def run(fusion_method):
    ds = small_dataset()
    sys_cfg = SystemConfig(
        registration_mode="IcpOptimized",
        matcher_config=ICP_CFG,
        frontend=FrontendConfig(fusion_method=fusion_method),
        scan_capacity=4096,
    )
    slam = SlamSystem(sys_cfg)
    out = slam.run_dataset(ds)
    est = out["poses"]
    assert len(est) >= 40, f"too few tracked scans: {len(est)}"
    # match gt by timestamps
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in out["times"]])
    ate = ate_rmse(est, gt, align=True)
    return ate, out


def test_mapping_tight_coupling_ate():
    ate, out = run(FUSION_TIGHT_OPT)
    assert ate < 0.3, f"ATE {ate:.3f} m"
    assert out["n_keyframes"] >= 3


def test_mapping_loose_coupling_ate():
    ate, out = run(FUSION_LOOSE)
    assert ate < 0.3, f"ATE {ate:.3f} m"
