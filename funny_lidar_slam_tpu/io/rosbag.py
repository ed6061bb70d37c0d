"""ROS1 bag reading (optional dependency: `rosbags`).

Offline replacement for the reference's live ROS subscribers
(System::InitSubscriber, src/slam/system.cpp:276-293 — standard
PointCloud2 vs Livox CustomMsg, plus sensor_msgs/Imu): iterates a bag in
time order yielding ("imu", t, gyro, accel, quat|None) and ("scan", RawScan)
events ready for SlamSystem.push_imu / process_scan.

The `rosbags` package is not bundled in every image; import errors surface
lazily with a clear message. All decoding beyond message framing lives in
io.pointcloud2 + io.formats, which are dependency-free.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..lidar.model import LidarModel
from . import formats, pointcloud2


def _require_rosbags():
    try:
        from rosbags.highlevel import AnyReader  # type: ignore

        return AnyReader
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "bag reading requires the `rosbags` package "
            "(pip install rosbags); offline datasets can instead be fed "
            "through SlamSystem.process_scan directly"
        ) from e


def _decode_livox_custom(msg) -> np.ndarray:
    """livox_ros_driver/CustomMsg -> structured array with the avia fields
    (include/3rd/livox_ros_driver CustomMsg/CustomPoint)."""
    n = len(msg.points)
    arr = np.zeros(n, np.dtype([
        ("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4"),
        ("line", "u1"), ("tag", "u1"), ("time", "f8"),
    ]))
    for i, p in enumerate(msg.points):
        arr[i] = (p.x, p.y, p.z, p.reflectivity, p.line, p.tag, p.offset_time)
    return arr


def read_bag(path: str, lidar_topic: str, imu_topic: str, lidar_type: str,
             time_scale: float = 1.0, model: LidarModel | None = None,
             lidar_rate: float = 10.0) -> Iterator[tuple]:
    """Yield ("imu", t, gyro, accel, quat) and ("scan", RawScan) in time order."""
    AnyReader = _require_rosbags()
    from pathlib import Path

    with AnyReader([Path(path)]) as reader:
        conns = [c for c in reader.connections if c.topic in (lidar_topic, imu_topic)]
        for conn, timestamp, raw in reader.messages(connections=conns):
            msg = reader.deserialize(raw, conn.msgtype)
            t = timestamp * 1e-9
            if conn.topic == imu_topic:
                quat = None
                o = getattr(msg, "orientation", None)
                if o is not None and (o.w, o.x, o.y, o.z) != (0.0, 0.0, 0.0, 0.0):
                    quat = np.array([o.w, o.x, o.y, o.z])
                yield (
                    "imu", t,
                    np.array([msg.angular_velocity.x, msg.angular_velocity.y,
                              msg.angular_velocity.z]),
                    np.array([msg.linear_acceleration.x, msg.linear_acceleration.y,
                              msg.linear_acceleration.z]),
                    quat,
                )
            else:
                stamp = msg.header.stamp.sec + msg.header.stamp.nanosec * 1e-9
                if conn.msgtype.endswith("CustomMsg"):
                    arr = _decode_livox_custom(msg)
                else:
                    arr = pointcloud2.decode(
                        msg.fields, msg.point_step, bytes(msg.data),
                        is_bigendian=bool(msg.is_bigendian),
                    )
                scan = formats.convert(lidar_type, arr, stamp, time_scale,
                                       model, lidar_rate)
                yield ("scan", scan)
