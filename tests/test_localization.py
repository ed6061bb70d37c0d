"""End-to-end localization mode (src/slam/localization.cpp semantics):
map with the mapping pipeline -> save map products -> re-localize on the
same sequence against the frozen map, via both the crop-box local map and
the 100 m tile-map path; plus the fitness-gated init.

Localization runs in the MAP frame (like the reference: the RViz init pose
is given in the map frame), so the mapping trajectory is the ground truth
for the localization run."""

import numpy as np
import pytest

from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate
from funny_lidar_slam_tpu.io.trajectory import ate_rmse
from funny_lidar_slam_tpu.localization import LocalizationConfig, Localizer
from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_TIGHT_OPT
from funny_lidar_slam_tpu.pipeline.system import SlamSystem, SystemConfig
from funny_lidar_slam_tpu.registration import matchers

ICP_CFG = matchers.IcpConfig(
    source_capacity=4096, cloud_capacity=4096, merged_capacity=16384,
    map_capacity=16384, local_map_size=20, source_filter_size=0.4,
    map_filter_size=0.4,
)


@pytest.fixture(scope="module")
def mapped(tmp_path_factory):
    """Run mapping once, save map.pcd + tiles, return (dataset, map_dir,
    mapping trajectory)."""
    ds = simulate(SimConfig(duration=10.0, points_per_scan=4096, max_range=35.0, seed=3))
    slam = SlamSystem(SystemConfig(
        registration_mode="IcpOptimized", matcher_config=ICP_CFG,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        scan_capacity=4096,
    ))
    out = slam.run_dataset(ds)
    assert len(out["poses"]) >= 40
    map_dir = str(tmp_path_factory.mktemp("map"))
    slam.save_map(map_dir, voxel_size=0.3, split=True, tile_size=40.0)
    return ds, map_dir, out


def _localize(ds, map_dir, tile_mode, init_pose):
    cfg = LocalizationConfig(
        registration_mode="IcpOptimized",
        matcher_config=ICP_CFG,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        map_path=None if tile_mode else f"{map_dir}/map.pcd",
        tile_map_dir=map_dir if tile_mode else None,
        local_map_size=80.0,
        local_map_boundary=20.0,
        local_map_capacity=65536,
        scan_capacity=4096,
    )
    loc = Localizer(cfg)
    if tile_mode:
        loc.tiles.tile_size = 40.0
    out = loc.run_dataset(ds, init_pose)
    return loc, out


def _map_frame_gt(map_out, times):
    ref = {round(t, 4): p for t, p in zip(map_out["times"], map_out["poses"])}
    return np.asarray([ref[round(t, 4)] for t in times])


def test_localization_cropbox(mapped):
    ds, map_dir, map_out = mapped
    init_pose = map_out["poses"][0].copy()
    loc, out = _localize(ds, map_dir, tile_mode=False, init_pose=init_pose)
    assert loc.initialized
    assert len(out["poses"]) >= 35
    ate = ate_rmse(out["poses"], _map_frame_gt(map_out, out["times"]), align=False)
    assert ate < 0.3, f"localization ATE {ate:.3f} m"


def test_localization_tilemap(mapped):
    ds, map_dir, map_out = mapped
    init_pose = map_out["poses"][0].copy()
    loc, out = _localize(ds, map_dir, tile_mode=True, init_pose=init_pose)
    assert loc.initialized
    assert len(out["poses"]) >= 35
    ate = ate_rmse(out["poses"], _map_frame_gt(map_out, out["times"]), align=False)
    assert ate < 0.3, f"tile localization ATE {ate:.3f} m"


def test_localization_init_gate_rejects_bad_pose(mapped):
    """A far-off init pose must fail the fitness gate
    (localization.cpp:138-140: fitness < 1.0 at 2 m)."""
    ds, map_dir, map_out = mapped
    bad = map_out["poses"][0].copy()
    bad[:3, 3] += np.array([150.0, 150.0, 0.0])  # outside the mapped area
    cfg = LocalizationConfig(
        registration_mode="IcpOptimized", matcher_config=ICP_CFG,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        map_path=f"{map_dir}/map.pcd", local_map_size=80.0,
        local_map_capacity=16384, scan_capacity=4096,
    )
    loc = Localizer(cfg)
    # feed IMU until initialized, then try the bad init on the first scans
    imu_idx = 0
    scan_period = ds.scans[1].t - ds.scans[0].t
    ok = False
    for scan in ds.scans[:20]:
        scan_end = scan.t + scan_period
        while imu_idx < len(ds.imu_t) and ds.imu_t[imu_idx] <= scan_end + 0.05:
            loc.push_imu(ds.imu_t[imu_idx], ds.imu_gyro[imu_idx], ds.imu_accel[imu_idx])
            imu_idx += 1
        ok = loc.try_init(bad, scan.t, scan_end, scan.points, scan.rel_times)
        if ok:
            break
    assert not ok and not loc.initialized
