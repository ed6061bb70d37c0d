"""PointCloud2 binary decoding and host preprocessing filters
(pcl::fromROSMsg + the non-LOAM filter branch of preprocessing.cpp:181-225)."""

import numpy as np

from funny_lidar_slam_tpu.io import pointcloud2
from funny_lidar_slam_tpu.io.formats import RawScan
from funny_lidar_slam_tpu.pipeline.preprocess import range_and_jump_filter


def _pc2_buffer(n=10):
    """Hand-build a velodyne-style PointCloud2 buffer with padding holes."""
    fields = [
        pointcloud2.PointField("x", 0, 7),
        pointcloud2.PointField("y", 4, 7),
        pointcloud2.PointField("z", 8, 7),
        pointcloud2.PointField("intensity", 12, 7),
        pointcloud2.PointField("ring", 16, 4),
        pointcloud2.PointField("time", 18, 7),
    ]
    point_step = 24  # 2 trailing pad bytes
    buf = bytearray(n * point_step)
    for i in range(n):
        o = i * point_step
        buf[o:o + 4] = np.float32(i).tobytes()
        buf[o + 4:o + 8] = np.float32(2 * i).tobytes()
        buf[o + 8:o + 12] = np.float32(-i).tobytes()
        buf[o + 12:o + 16] = np.float32(0.5).tobytes()
        buf[o + 16:o + 18] = np.uint16(i % 16).tobytes()
        buf[o + 18:o + 22] = np.float32(i * 1e-3).tobytes()
    return fields, point_step, bytes(buf)


def test_decode_structured():
    fields, step, data = _pc2_buffer(10)
    arr = pointcloud2.decode(fields, step, data)
    assert len(arr) == 10
    np.testing.assert_allclose(arr["x"], np.arange(10))
    np.testing.assert_allclose(arr["y"], 2 * np.arange(10))
    assert arr["ring"].tolist() == [i % 16 for i in range(10)]
    np.testing.assert_allclose(arr["time"], np.arange(10) * 1e-3, atol=1e-9)


def test_decode_feeds_convert():
    from funny_lidar_slam_tpu.io.formats import convert

    fields, step, data = _pc2_buffer(10)
    arr = pointcloud2.decode(fields, step, data)
    scan = convert("Velodyne_16", arr, stamp=1.0)
    assert len(scan.points) == 10


def test_range_and_jump_filter():
    n = 100
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.linspace(0.1, 50.0, n)
    scan = RawScan(0.0, pts, np.zeros(n, np.float32), np.zeros(n, np.int32),
                   np.zeros(n, np.float32))
    out = range_and_jump_filter(scan, min_distance=2.0, max_distance=40.0,
                                jump_span=3)
    r = np.linalg.norm(out.points, axis=1)
    assert (r >= 2.0).all() and (r <= 40.0).all()
    # every 3rd of the in-range points
    n_in = ((np.linalg.norm(pts, axis=1) >= 2.0) & (np.linalg.norm(pts, axis=1) <= 40.0)).sum()
    assert len(out.points) == (n_in + 2) // 3
