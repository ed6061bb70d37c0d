"""ROS1 bag ingestion path, end to end.

The reference's acceptance runs are recorded bags (README.md:94-218); no
public bags ship in this image, so these tests synthesize a bag with the
native writer (io.bag_format.BagWriter) and prove:

  1. message round-trips (Imu / PointCloud2 / Livox CustomMsg),
  2. read_bag event stream parity with the in-memory dataset,
  3. the full CLI: run_slam --config ... --dataset test.bag -> TUM
     trajectory + map.pcd products with a sane ATE.
"""

import json
import os

import numpy as np
import pytest

from funny_lidar_slam_tpu.io import bag_export, bag_format, rosbag
from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate


@pytest.fixture(scope="module")
def dataset():
    return simulate(SimConfig(duration=8.0, points_per_scan=4096,
                              max_range=35.0, seed=3))


@pytest.fixture(scope="module")
def bag_path(dataset, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bags") / "synth.bag")
    bag_export.dataset_to_bag(dataset, path, lidar_topic="/velodyne_points",
                              imu_topic="/imu/data")
    return path


def test_imu_roundtrip():
    msg = bag_format.ImuMsg(
        stamp=1234.5678,
        quat=np.array([0.9, 0.1, -0.2, 0.3]),
        gyro=np.array([0.01, -0.02, 0.03]),
        accel=np.array([0.1, 0.2, 9.8]),
    )
    out = bag_format.deserialize_imu(bag_format.serialize_imu(msg))
    assert abs(out.stamp - msg.stamp) < 1e-6
    np.testing.assert_allclose(out.quat, msg.quat)
    np.testing.assert_allclose(out.gyro, msg.gyro)
    np.testing.assert_allclose(out.accel, msg.accel)
    # 6-axis: zero quaternion decodes to None (system.cpp:143 has_orientation)
    msg6 = bag_format.ImuMsg(1.0, None, msg.gyro, msg.accel)
    assert bag_format.deserialize_imu(bag_format.serialize_imu(msg6)).quat is None


def test_pointcloud2_roundtrip():
    arr = np.zeros(5, np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                ("intensity", "<f4"), ("ring", "<u2"),
                                ("time", "<f4")]))
    arr["x"] = np.arange(5)
    arr["ring"] = [0, 1, 2, 3, 4]
    arr["time"] = np.linspace(0, 0.1, 5)
    msg = bag_format.pointcloud2_from_structured(arr, 42.0)
    out = bag_format.deserialize_pointcloud2(bag_format.serialize_pointcloud2(msg))
    assert out.stamp == 42.0 and out.width == 5
    assert out.point_step == arr.dtype.itemsize
    from funny_lidar_slam_tpu.io import pointcloud2

    dec = pointcloud2.decode(out.fields, out.point_step, out.data)
    np.testing.assert_allclose(dec["x"], arr["x"])
    np.testing.assert_array_equal(dec["ring"], arr["ring"])


def test_livox_roundtrip():
    pts = np.zeros(4, bag_format._LIVOX_POINT)
    pts["x"] = [1, 2, 3, 4]
    pts["offset_time"] = [0, 1000, 2000, 3000]
    pts["line"] = [0, 1, 5, 7]
    pts["tag"] = [0x00, 0x10, 0x20, 0x00]
    msg = bag_format.LivoxCustomMsg(10.5, 123456789, pts)
    out = bag_format.deserialize_livox(bag_format.serialize_livox(msg))
    assert out.stamp == pytest.approx(10.5)
    assert out.timebase == 123456789
    np.testing.assert_allclose(out.points["x"], pts["x"])
    np.testing.assert_array_equal(out.points["tag"], pts["tag"])


def test_read_bag_event_parity(dataset, bag_path):
    """The bag replay must reproduce the in-memory dataset's streams."""
    n_imu = n_scan = 0
    scan_sizes = []
    for ev in rosbag.read_bag(bag_path, "/velodyne_points", "/imu/data",
                              "Velodyne_16"):
        if ev[0] == "imu":
            _, t, gyro, accel, quat = ev
            k = n_imu
            assert abs(t - dataset.imu_t[k]) < 1e-6
            np.testing.assert_allclose(gyro, dataset.imu_gyro[k], atol=1e-12)
            np.testing.assert_allclose(accel, dataset.imu_accel[k], atol=1e-12)
            assert quat is None
            n_imu += 1
        else:
            scan = ev[1]
            k = n_scan
            src = dataset.scans[k]
            assert abs(scan.stamp - src.t) < 1e-6
            np.testing.assert_allclose(scan.points, src.points, atol=1e-6)
            np.testing.assert_allclose(scan.rel_times, src.rel_times, atol=1e-6)
            scan_sizes.append(len(scan.points))
            n_scan += 1
    assert n_imu == len(dataset.imu_t)
    assert n_scan == len(dataset.scans)


def test_run_slam_cli_on_bag(dataset, bag_path, tmp_path):
    """The acceptance path: CLI mapping run over a bag file -> TUM + map.pcd
    (System::SaveMap products, system.cpp:299-340)."""
    from funny_lidar_slam_tpu.io.trajectory import ate_rmse, read_tum
    from funny_lidar_slam_tpu.pipeline import run_slam

    cfg_yaml = tmp_path / "config_bag_test.yaml"
    cfg_yaml.write_text(
        """
sensor_topic:
    lidar_topic: "/velodyne_points"
    imu_topic: "/imu/data"
slam_mode: 1
lidar:
    lidar_sensor_type: Velodyne_16
    lidar_point_jump_span: 1
    lidar_point_time_scale: 1.0
    lidar_use_min_distance: 1.0
    lidar_use_max_distance: 100.0
    lidar_rotation_noise_std: 0.005
    lidar_position_noise_std: 0.01
imu:
    has_orientation: false
    acc_noise_std: 0.1
    gyro_noise_std: 0.01
    acc_rw_noise_std: 1.0e-4
    gyro_rw_noise_std: 1.0e-4
    data_searcher_buffer_size: 2000
gravity: 9.81
calibration:
    lidar_to_imu: [ 1., 0., 0., 0.,
                    0., 1., 0., 0.,
                    0., 0., 1., 0.,
                    0., 0., 0., 1. ]
frontend:
    fusion_method: TightCouplingOptimization
    registration_and_searcher_mode: IcpOptimized
    registration:
        optimization_iter_num: 30
        max_correspond_distance: 1.0
        source_filter_size: 0.4
        map_filter_size: 0.4
        local_map_size: 20
        position_converge_thres: 0.01
        rotation_converge_thres: 0.05
system:
    keyframe_delta_distance: 1.0
    keyframe_delta_rotation: 0.2
loopclosure:
    skip_near_loopclosure_threshold: 100
tpu:
    scan_capacity: 4096
    source_capacity: 4096
    cloud_capacity: 4096
    merged_capacity: 16384
    map_capacity: 16384
"""
    )
    out_dir = tmp_path / "out"
    run_slam.main([
        "--config", str(cfg_yaml), "--dataset", bag_path,
        "--output", str(out_dir), "--save-map",
    ])

    tum_path = out_dir / "trajectory_tum.txt"
    assert tum_path.exists(), "TUM trajectory not written"
    times, poses = read_tum(str(tum_path))
    assert len(poses) >= 40, f"too few tracked scans: {len(poses)}"

    # bag replay stamps the pose at scan.stamp + rel_times.max(), which need
    # not equal the simulator's gt grid — match by nearest timestamp
    idx = np.abs(np.asarray(dataset.gt_times)[None, :] - times[:, None]).argmin(1)
    assert np.abs(dataset.gt_times[idx] - times).max() < 0.06
    gt = np.asarray(dataset.gt_poses)[idx]
    ate = ate_rmse(poses, gt, align=True)
    assert ate < 0.3, f"bag-replay ATE {ate:.3f} m"

    assert (out_dir / "map" / "map.pcd").exists(), "map.pcd not written"
    assert (out_dir / "pose_graph.g2o").exists()
