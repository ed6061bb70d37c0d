"""Voxel grouping primitives: hashing, sorting-based grouping, downsampling.

These are the TPU-native replacements for the reference's per-point hash-map
and PCL VoxelGrid operations:

  * `spatial_hash` mirrors the reference hash (include/common/hash_function.h:10-15)
    but maps into a power-of-two table with `&` instead of `%`.
  * `voxel_downsample` replaces pcl::VoxelGrid (centroid per voxel,
    common/pointcloud_utility.h VoxelGridCloud) as one sort + segment-mean.
  * `group_by_voxel` is the shared sort/grouping kernel used by map insertion
    and NDT statistics.

All outputs are fixed-capacity padded arrays with masks (static shapes only).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Large-prime XOR hash, same constants as the reference spatial hash
# (include/common/hash_function.h:10-15).
_P1 = jnp.uint32(73856093)
_P2 = jnp.uint32(471943)
_P3 = jnp.uint32(83492791)


def voxel_coords(points: jax.Array, inv_voxel_size) -> jax.Array:
    """Points [..., 3] -> integer voxel coords [..., 3] (floor convention).

    Note: the reference NDT uses C-style truncation (`cast<int>`,
    incremental_ndt.h:196); we use floor everywhere for consistency — the
    grouping is equivalent up to a half-voxel shift around the origin.
    """
    return jnp.floor(points * inv_voxel_size).astype(jnp.int32)


def spatial_hash(coords: jax.Array, table_size: int) -> jax.Array:
    """Voxel coords [..., 3] -> slot index [...] in a power-of-2 table.

    Deviation from the reference's plain prime-XOR (hash_function.h:10-15):
    that scheme has structured collisions for small +/- coordinates, so the
    combined value is passed through the murmur3 fmix32 finalizer before
    masking — same buckets semantics, far better slot distribution."""
    assert table_size & (table_size - 1) == 0, "table_size must be a power of 2"
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


class VoxelGroups(NamedTuple):
    """Result of sorting points by voxel (all shapes static).

    order       [n]    permutation sorting valid points by voxel, invalid last
    sorted_pts  [n,3]  points[order]
    sorted_mask [n]    mask[order]
    group_id    [n]    0-based contiguous id of each sorted point's voxel
                       (invalid points share the id of the last group; mask!)
    rank        [n]    index of the point within its voxel group
    group_coords[n,3]  voxel coords of each sorted point
    num_groups  []     number of distinct valid voxels
    """

    order: jax.Array
    sorted_pts: jax.Array
    sorted_mask: jax.Array
    group_id: jax.Array
    rank: jax.Array
    group_coords: jax.Array
    num_groups: jax.Array


def group_by_voxel(points: jax.Array, mask: jax.Array, inv_voxel_size) -> VoxelGroups:
    """Sort points so same-voxel points are adjacent; compute group ids/ranks.

    One XLA sort over a single PACKED 32-bit key (invalid points pushed to
    the end), replacing the reference's per-point `unordered_map` insertion
    loops. A multi-operand lexsort is ~300x slower on TPU than a single-key
    sort, so the voxel coords are packed relative to the batch minimum into
    (x:10, y:11, z:10) bit fields — a 1024 x 2048 x 1024 voxel extent per
    batch. Batches larger than that (kilometers at 0.5 m voxels) saturate at
    the boundary, which merely merges the outermost voxels' groups.
    """
    coords = voxel_coords(points, inv_voxel_size)
    big = jnp.int32(2**30)
    cmin = jnp.min(jnp.where(mask[:, None], coords, big), axis=0)
    rel = coords - cmin
    rx = jnp.clip(rel[:, 0], 0, 1023).astype(jnp.uint32)
    ry = jnp.clip(rel[:, 1], 0, 2047).astype(jnp.uint32)
    rz = jnp.clip(rel[:, 2], 0, 1023).astype(jnp.uint32)
    key = (rx << 21) | (ry << 10) | rz
    key = jnp.where(mask, key, jnp.uint32(0xFFFFFFFF))

    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    key_sorted, order = jax.lax.sort((key, idx), num_keys=1)
    sorted_pts = points[order]
    sorted_mask = mask[order]
    sorted_coords = coords[order]

    changed = key_sorted != jnp.roll(key_sorted, 1)
    is_new = changed & sorted_mask
    is_new = is_new.at[0].set(sorted_mask[0])

    group_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    group_id = jnp.maximum(group_id, 0)

    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    seg_start = jnp.where(is_new, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = idx - seg_start

    num_groups = jnp.sum(is_new.astype(jnp.int32))
    return VoxelGroups(order, sorted_pts, sorted_mask, group_id, rank, sorted_coords, num_groups)


class PaddedCloud(NamedTuple):
    points: jax.Array  # [capacity, 3]
    mask: jax.Array  # [capacity] bool


def voxel_downsample(
    points: jax.Array,
    mask: jax.Array,
    voxel_size,
    capacity: int,
    extra: jax.Array | None = None,
):
    """Centroid voxel-grid filter (pcl::VoxelGrid semantics) on device.

    Returns a PaddedCloud of at most `capacity` voxel centroids (one per
    occupied voxel, in voxel-sorted order). If `extra` [n, d] is given, its
    per-voxel mean is returned as well (used for intensity / timestamps).
    """
    inv = 1.0 / voxel_size
    g = group_by_voxel(points, mask, inv)

    seg_id = jnp.where(g.sorted_mask, g.group_id, capacity)  # dump invalid
    w = g.sorted_mask.astype(points.dtype)
    sums = jax.ops.segment_sum(g.sorted_pts * w[:, None], seg_id, num_segments=capacity + 1)
    counts = jax.ops.segment_sum(w, seg_id, num_segments=capacity + 1)
    centroids = sums[:capacity] / jnp.maximum(counts[:capacity], 1.0)[:, None]
    out_mask = counts[:capacity] > 0

    if extra is not None:
        ex = jax.ops.segment_sum(extra[g.order] * w[:, None], seg_id, num_segments=capacity + 1)
        ex = ex[:capacity] / jnp.maximum(counts[:capacity], 1.0)[:, None]
        return PaddedCloud(centroids, out_mask), ex
    return PaddedCloud(centroids, out_mask)
