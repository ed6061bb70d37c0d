"""Range-image projection: scatter-based re-design of
loam::PointcloudProjector (src/loam/pointcloud_projector.cpp:32-133).

The reference walks points sequentially, keeps the FIRST point landing in
each (ring, column) cell of a V x H range image, then compacts valid cells
row-major into an ordered cloud with per-row start/end indices. Here the
first-wins rule becomes a scatter-min of point indices and the compaction one
argsort by cell id — all static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LidarGeometry(NamedTuple):
    """Scan geometry (reference LidarModel, src/lidar/lidar_model.cpp:9-81)."""

    n_rows: int  # vertical scans (rings)
    n_cols: int  # horizontal resolution
    horizontal_resolution: float  # radians per column
    min_distance: float = 1.0
    max_distance: float = 100.0

    @staticmethod
    def velodyne16():
        return LidarGeometry(16, 1800, 2.0 * jnp.pi / 1800)

    @staticmethod
    def velodyne32():
        return LidarGeometry(32, 1800, 2.0 * jnp.pi / 1800)

    @staticmethod
    def velodyne64():
        return LidarGeometry(64, 1800, 2.0 * jnp.pi / 1800)

    @staticmethod
    def ouster128():
        return LidarGeometry(128, 1024, 2.0 * jnp.pi / 1024)


class OrderedScan(NamedTuple):
    """Row-major compacted projection (PointcloudCluster's ordered_cloud_ +
    depth/col vectors + row start/end, pointcloud_cluster.h:12-28)."""

    points: jax.Array  # [N, 3] compacted, row-major
    depth: jax.Array  # [N]
    col: jax.Array  # [N] int32 column index
    row: jax.Array  # [N] int32 ring index
    rel_time: jax.Array  # [N]
    mask: jax.Array  # [N]
    row_start: jax.Array  # [R] int32 first packed index of each row
    row_end: jax.Array  # [R] int32 one-past-last packed index


def project(
    points: jax.Array,  # [N, 3] (deskewed) lidar-frame points
    ring: jax.Array,  # [N] int32
    rel_times: jax.Array,  # [N]
    mask: jax.Array,  # [N]
    geom: LidarGeometry,
) -> OrderedScan:
    n = points.shape[0]
    r_rows, r_cols = geom.n_rows, geom.n_cols
    depth = jnp.linalg.norm(points, axis=-1)

    col = jnp.round(
        jnp.arctan2(points[:, 1], points[:, 0]) / geom.horizontal_resolution
    ).astype(jnp.int32) + r_cols // 2
    col = jnp.where(col >= r_cols, col - r_cols, col)

    valid = (
        mask
        & (depth >= geom.min_distance)
        & (depth <= geom.max_distance)
        & (ring >= 0)
        & (ring < r_rows)
        & (col >= 0)
        & (col < r_cols)
    )

    cell = ring * r_cols + col
    n_cells = r_rows * r_cols

    # first-point-wins: the reference keeps the first point (in scan order)
    # per cell (pointcloud_projector.cpp:91-93) -> scatter-min of the index
    idx = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(valid, cell, n_cells)
    winner = jnp.full(n_cells + 1, n, jnp.int32).at[tgt].min(idx)
    is_winner = valid & (winner[jnp.minimum(cell, n_cells - 1)] == idx)

    # row-major compaction: sort winning points by cell id
    big = jnp.int32(n_cells + 1)
    key = jnp.where(is_winner, cell, big)
    order = jnp.argsort(key)
    packed_mask = is_winner[order]
    packed_cell = jnp.where(packed_mask, cell[order], big)
    packed_row = packed_cell // r_cols

    row_ids = jnp.arange(r_rows, dtype=jnp.int32)
    row_start = jnp.searchsorted(packed_row, row_ids, side="left").astype(jnp.int32)
    row_end = jnp.searchsorted(packed_row, row_ids, side="right").astype(jnp.int32)

    return OrderedScan(
        points=points[order],
        depth=jnp.where(packed_mask, depth[order], 0.0),
        col=jnp.where(packed_mask, packed_cell % r_cols, 0),
        row=jnp.where(packed_mask, packed_row, 0).astype(jnp.int32),
        rel_time=rel_times[order],
        mask=packed_mask,
        row_start=row_start,
        row_end=row_end,
    )


def synth_rings(points: jax.Array, n_rows: int, lower_deg: float = -25.0,
                upper_deg: float = 15.0) -> jax.Array:
    """Ring index from elevation angle for sources without a ring channel
    (LidarModel::RowIndex semantics, include/lidar/lidar_model.h:50-81)."""
    elev = jnp.degrees(
        jnp.arctan2(points[..., 2], jnp.linalg.norm(points[..., :2], axis=-1))
    )
    step = (upper_deg - lower_deg) / n_rows
    ring = jnp.floor((elev - lower_deg) / step).astype(jnp.int32)
    return jnp.clip(ring, 0, n_rows - 1)
