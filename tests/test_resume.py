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


def _loam_sys_cfg(tmp_path, mode):
    """LOAM-geometry configs for the map-carrying feature modes (round-4
    VERDICT #4: LOAM resume was unreachable/arity-broken and corner/planar
    were never persisted)."""
    from funny_lidar_slam_tpu.loam.features import FeatureConfig
    from funny_lidar_slam_tpu.loam.projection import LidarGeometry

    geom = LidarGeometry(n_rows=16, n_cols=900,
                         horizontal_resolution=2 * np.pi / 900,
                         min_distance=1.5, max_distance=40.0)
    if mode == "LoamFull_KdTree":
        mcfg = matchers.LoamFullConfig(
            corner_capacity=1024, planar_capacity=4096, merged_capacity=16384,
            map_capacity=16384, nn_voxel_size=1.0, corner_filter_size=0.2,
            planar_filter_size=0.4, point_search_thresh=1.0,
            corner_map_size=20, planar_map_size=20,
        )
    else:
        mcfg = matchers.PointToPlaneConfig(
            mode="ivox", source_capacity=4096, map_capacity=65536,
            bucket_size=8, ivox_voxel_size=0.5, stencil="nearby18",
            min_valid_planar=50,
        )
    return SystemConfig(
        registration_mode=mode,
        matcher_config=mcfg,
        frontend=FrontendConfig(
            fusion_method=FUSION_TIGHT_OPT,
            lidar_geometry=geom,
            feature=FeatureConfig(corner_capacity=1024, planar_capacity=4096),
            planar_voxel_filter_size=0.4,
        ),
        scan_capacity=4096,
        keyframe_save_dir=str(tmp_path / "keyframes"),
    )


def _kill_and_resume(tmp_path, mode, ate_gate):
    ds = simulate(SimConfig(duration=8.0, points_per_scan=4096,
                            max_range=35.0, seed=3))
    n = len(ds.scans)
    half = n // 2

    a = SlamSystem(_loam_sys_cfg(tmp_path, mode))
    _feed(a, ds, 0, half)
    n_kf_a = len(a.keyframes)
    assert n_kf_a >= 2
    # feature persistence: LOAM-geometry keyframes carry planar (+corner)
    kf_last = a.keyframes.frames[-1]
    assert kf_last.planar is not None and len(kf_last.planar) > 0
    if mode == "LoamFull_KdTree":
        assert kf_last.corner is not None and len(kf_last.corner) > 0
    poses_a = np.asarray(a.trajectory)
    times_a = np.asarray(a.trajectory_t)
    del a  # "kill"

    b = SlamSystem.resume(_loam_sys_cfg(tmp_path, mode))
    assert len(b.keyframes) == n_kf_a
    # persisted features must round-trip through the npz store
    assert b.keyframes.frames[-1].planar is not None
    # resume contract (SlamSystem.resume docstring): feed data from after
    # the LAST KEYFRAME's timestamp — the scans between that keyframe and
    # the kill point re-play, so the init pose matches the first fed scan
    # (the LOAM near-point gates assume a small initial pose error)
    t_kf = b.keyframes.frames[-1].timestamp
    resume_idx = next(i for i, s in enumerate(ds.scans)
                      if s.t + (ds.scans[1].t - ds.scans[0].t) > t_kf)
    _feed(b, ds, resume_idx, n)
    assert len(b.trajectory) >= 10, "resumed run tracked too few scans"

    times = np.concatenate([times_a, np.asarray(b.trajectory_t)])
    poses = np.concatenate([poses_a, np.asarray(b.trajectory)])
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(float(t), 4)] for t in times
                     if round(float(t), 4) in gt_map])
    est = np.asarray([p for t, p in zip(times, poses)
                      if round(float(t), 4) in gt_map])
    ate = ate_rmse(est, gt, align=True)
    assert ate < ate_gate, f"{mode} kill-and-resume ATE {ate:.3f} m"


def test_kill_and_resume_loam_full(tmp_path):
    _kill_and_resume(tmp_path, "LoamFull_KdTree", 0.5)


def test_kill_and_resume_p2plane_ivox(tmp_path):
    _kill_and_resume(tmp_path, "PointToPlane_IVOX", 0.4)
