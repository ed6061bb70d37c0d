"""Mapping resume from the persisted keyframe store (SURVEY.md §5.4 — a
capability the reference lacks: its keyframe PCDs, keyframe.h:59-94, only
feed loop closure and save-map, never a restart).

Kill-and-resume must track the same trajectory as an uninterrupted run."""

import numpy as np

from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate
from funny_lidar_slam_tpu.io.trajectory import ate_rmse
from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_TIGHT_OPT
from funny_lidar_slam_tpu.pipeline.system import SlamSystem, SystemConfig
from funny_lidar_slam_tpu.registration import matchers

ICP_CFG = matchers.IcpConfig(
    source_capacity=4096, cloud_capacity=4096, merged_capacity=16384,
    map_capacity=16384, max_correspond_distance=1.0, source_filter_size=0.4,
    map_filter_size=0.4, nn_voxel_size=1.0, local_map_size=20,
)


def _sys_cfg(tmp_path):
    return SystemConfig(
        registration_mode="IcpOptimized",
        matcher_config=ICP_CFG,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        scan_capacity=4096,
        keyframe_save_dir=str(tmp_path / "keyframes"),
    )


def _feed(slam, ds, scan_lo, scan_hi):
    period = ds.scans[1].t - ds.scans[0].t
    t_hi = ds.scans[scan_hi - 1].t + period + 0.05 if scan_hi < len(ds.scans) else np.inf
    for k in range(len(ds.imu_t)):
        t = ds.imu_t[k]
        if t > t_hi:
            break
        slam.push_imu(t, ds.imu_gyro[k], ds.imu_accel[k])
    for scan in ds.scans[scan_lo:scan_hi]:
        slam.process_scan(scan.t, scan.t + period, scan.points, scan.rel_times)


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    ds = simulate(SimConfig(duration=10.0, points_per_scan=4096,
                            max_range=35.0, seed=3))
    n = len(ds.scans)
    half = n // 2

    # uninterrupted reference run
    ref = SlamSystem(_sys_cfg(tmp_path / "ref"))
    out_ref = ref.run_dataset(ds)
    assert len(out_ref["poses"]) >= 40

    # interrupted run: first half, then a brand-new process resumes
    cfg_a = _sys_cfg(tmp_path / "ab")
    a = SlamSystem(cfg_a)
    _feed(a, ds, 0, half)
    n_kf_a = len(a.keyframes)
    assert n_kf_a >= 2, "first half produced too few keyframes"
    poses_a = np.asarray(a.trajectory)
    del a  # "kill"

    b = SlamSystem.resume(_sys_cfg(tmp_path / "ab"))
    assert len(b.keyframes) == n_kf_a
    assert b.graph.n_vertices == n_kf_a
    _feed(b, ds, half, n)
    assert len(b.trajectory) >= 10, "resumed run tracked too few scans"

    # combined trajectory must match ground truth like the uninterrupted run
    times = np.concatenate([np.asarray(ref.trajectory_t)[: len(poses_a)],
                            np.asarray(b.trajectory_t)])
    poses = np.concatenate([poses_a, np.asarray(b.trajectory)])
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(float(t), 4)] for t in times if round(float(t), 4) in gt_map])
    est = np.asarray([p for t, p in zip(times, poses) if round(float(t), 4) in gt_map])
    ate = ate_rmse(est, gt, align=True)
    assert ate < 0.4, f"kill-and-resume ATE {ate:.3f} m"

    # the resumed trajectory must be CONTINUOUS with the saved keyframes (no
    # re-zeroing): its first pose is near the last persisted keyframe pose
    d0 = np.linalg.norm(np.asarray(b.trajectory)[0][:3, 3]
                        - b.keyframes.frames[n_kf_a - 1].pose[:3, 3])
    assert d0 < 2.5, f"resume jumped {d0:.2f} m from the last keyframe"
