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


def test_mapping_eskf_ate():
    # the fusion mode the reference stubbed (TightCouplingKF) — BASELINE PR1
    from funny_lidar_slam_tpu.pipeline.frontend import FUSION_TIGHT_KF

    ate, out = run(FUSION_TIGHT_KF)
    assert ate < 0.3, f"ATE {ate:.3f} m"


def _run_loam_mode(registration_mode, matcher_cfg):
    from funny_lidar_slam_tpu.loam.features import FeatureConfig
    from funny_lidar_slam_tpu.loam.projection import LidarGeometry

    ds = small_dataset()
    geom = LidarGeometry(n_rows=16, n_cols=900,
                        horizontal_resolution=2 * np.pi / 900,
                        min_distance=1.5, max_distance=40.0)
    sys_cfg = SystemConfig(
        registration_mode=registration_mode,
        matcher_config=matcher_cfg,
        frontend=FrontendConfig(
            fusion_method=FUSION_TIGHT_OPT,
            lidar_geometry=geom,
            feature=FeatureConfig(corner_capacity=1024, planar_capacity=4096),
            planar_voxel_filter_size=0.4,
        ),
        scan_capacity=4096,
    )
    slam = SlamSystem(sys_cfg)
    out = slam.run_dataset(ds)
    est = out["poses"]
    assert len(est) >= 40, f"too few tracked scans: {len(est)}"
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in out["times"]])
    return ate_rmse(est, gt, align=True)


def test_mapping_p2plane_ivox_loam_features():
    # the M2DGR-style config: PointToPlane_IVOX frontend on LOAM planar cloud
    cfg = matchers.PointToPlaneConfig(
        mode="ivox", source_capacity=4096, map_capacity=65536, bucket_size=8,
        ivox_voxel_size=0.5, stencil="nearby18", min_valid_planar=50,
    )
    ate = _run_loam_mode("PointToPlane_IVOX", cfg)
    assert ate < 0.3, f"ATE {ate:.3f} m"


def test_mapping_loam_full():
    # the NCLT-style config: full LOAM (corner + planar) over window maps
    cfg = matchers.LoamFullConfig(
        corner_capacity=1024, planar_capacity=4096, merged_capacity=16384,
        map_capacity=16384, nn_voxel_size=1.0, corner_filter_size=0.2,
        planar_filter_size=0.4, point_search_thresh=1.0,
        corner_map_size=20, planar_map_size=20,
    )
    ate = _run_loam_mode("LoamFull_KdTree", cfg)
    assert ate < 0.4, f"ATE {ate:.3f} m"


def test_mapping_incremental_ndt():
    # sim scans (4k pts) are sparser than the reference's 32-beam data, so
    # voxels are 2 m (vs the reference's 1 m at 57k pts/scan) to keep several
    # points per voxel for covariance estimation
    ds = simulate(SimConfig(duration=10.0, points_per_scan=8192, max_range=30.0, seed=3))
    cfg = matchers.NdtConfig(
        voxel_size=2.0, source_filter_size=0.3, source_capacity=8192,
        map_capacity=65536, min_points_in_voxel=4, min_effective_pts=50,
        res_outlier_thresh=30.0,
    )
    sys_cfg = SystemConfig(
        registration_mode="IncrementalNDT",
        matcher_config=cfg,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        scan_capacity=8192,
    )
    slam = SlamSystem(sys_cfg)
    out = slam.run_dataset(ds)
    assert len(out["poses"]) >= 40
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in out["times"]])
    ate = ate_rmse(out["poses"], gt, align=True)
    assert ate < 0.4, f"ATE {ate:.3f} m"
