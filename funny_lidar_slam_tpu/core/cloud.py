"""Padded point-cloud containers.

TPU equivalent of the reference's PointcloudCluster
(include/lidar/pointcloud_cluster.h:12-28): every scan is a bundle of
fixed-capacity padded tensors (points + masks) instead of variable-length PCL
clouds, so the whole per-scan pipeline is one static-shape jit program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .state import ImuSegment


class Cloud(NamedTuple):
    points: jax.Array  # [N, 3]
    mask: jax.Array  # [N] bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "Cloud":
        return Cloud(jnp.zeros((capacity, 3), dtype), jnp.zeros(capacity, bool))


def transform_cloud(t_mat: jax.Array, c: Cloud) -> Cloud:
    """Rigid transform (common/pointcloud_utility.h TransformPointCloud)."""
    return Cloud(c.points @ t_mat[:3, :3].T + t_mat[:3, 3], c.mask)


class ScanBundle(NamedTuple):
    """One preprocessed scan: deskewed clouds + the covering IMU segment.

    `ordered` is the deskewed full cloud (downsampled for ICP/NDT modes);
    `planar`/`corner` are LOAM feature clouds (empty in non-LOAM modes).
    """

    timestamp: jax.Array  # [] seconds
    ordered: Cloud
    planar: Cloud
    corner: Cloud
    imu: ImuSegment
