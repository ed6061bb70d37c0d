"""LOAM corner/planar feature extraction, vectorized.

Re-design of loam::FeatureExtractor (src/loam/feature_extractor.cpp):

  * roughness = (sum of 10 packed neighbors - 10*depth)^2
    (feature_extractor.cpp:46-61) -> shifted adds over the compacted array.
  * invalid marks: occlusion (col-diff < 10 & depth jump > 0.3 masks 5-6
    neighbors) and parallel-beam points (feature_extractor.cpp:64-118)
    -> vectorized shifts + max-pool dilation.
  * per row, 6 angular blocks; corners = up to 20 highest-roughness valid
    points above the corner threshold, picked greedily with +-5 neighbor
    suppression (feature_extractor.cpp:120-222) -> batched iterative masked
    argmax over a [rows*6, L] block lattice (20 sequential picks, all blocks
    in parallel).
  * planar cloud = every valid non-corner packed point (the reference adds
    all non-corners and voxel-filters downstream, feature_extractor.cpp:204-208).

Deviation: corner suppression masks a flat +-5 window inside the block
(the reference walks outward breaking at column jumps > 10 and crosses block
bounds); the difference touches only a handful of boundary points per ring.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cloud import Cloud
from .projection import OrderedScan


class FeatureConfig(NamedTuple):
    corner_threshold: float = 1.0
    planar_threshold: float = 0.1
    max_corners_per_block: int = 20
    blocks_per_row: int = 6
    occlusion_depth_jump: float = 0.3
    occlusion_col_diff: int = 10
    parallel_ratio: float = 0.02
    corner_capacity: int = 2048
    planar_capacity: int = 16384


def compute_roughness(scan: OrderedScan) -> jax.Array:
    """10-neighbor second difference squared over the packed sequence."""
    d = jnp.where(scan.mask, scan.depth, 0.0)
    acc = -10.0 * d
    for k in range(1, 6):
        acc = acc + jnp.roll(d, k) + jnp.roll(d, -k)
    return acc * acc


def mark_valid(scan: OrderedScan, cfg: FeatureConfig) -> jax.Array:
    """Occlusion + parallel-beam invalidation (feature_extractor.cpp:64-118)."""
    n = scan.depth.shape[0]
    d = scan.depth
    col = scan.col
    valid = scan.mask

    d_next = jnp.roll(d, -1)
    col_diff = jnp.abs(jnp.roll(col, -1) - col)
    near_cols = col_diff < cfg.occlusion_col_diff

    # occlusion: d[i] - d[i+1] > jump -> mask i-5..i ; d[i+1]-d[i] > jump ->
    # mask i+1..i+6. Implemented as seed masks dilated by rolls.
    occ_a = near_cols & (d - d_next > cfg.occlusion_depth_jump) & scan.mask
    occ_b = near_cols & (d_next - d > cfg.occlusion_depth_jump) & scan.mask
    kill = jnp.zeros(n, bool)
    for k in range(0, 6):
        kill = kill | jnp.roll(occ_a, -k)  # occ_a at i masks i-5..i
    for k in range(1, 7):
        kill = kill | jnp.roll(occ_b, k)  # occ_b at i masks i+1..i+6
    # parallel beams: both side diffs exceed 2% of depth
    diff1 = jnp.abs(jnp.roll(d, 1) - d)
    diff2 = jnp.abs(jnp.roll(d, -1) - d)
    parallel = (diff1 > cfg.parallel_ratio * d) & (diff2 > cfg.parallel_ratio * d)

    valid = valid & ~kill & ~parallel
    return valid


def extract_features(scan: OrderedScan, cfg: FeatureConfig):
    """Returns (corner Cloud, planar Cloud)."""
    n = scan.depth.shape[0]
    r_rows = scan.row_start.shape[0]
    nb = cfg.blocks_per_row

    rough = compute_roughness(scan)
    valid = mark_valid(scan, cfg)

    # row edge guard: first 5 / last 6 packed points of each row are not
    # usable (reference bakes +5/-6 into row start/end indices)
    idx = jnp.arange(n, dtype=jnp.int32)
    rs = scan.row_start[scan.row]
    re = scan.row_end[scan.row]
    valid = valid & (idx >= rs + 5) & (idx < re - 6)

    # --- block lattice ---
    # block b of row r spans [start + i*len6, start + (i+1)*len6), with
    # len6 = (end-start)/6 (integer division like the reference)
    len6 = (scan.row_end - scan.row_start - 11) // nb  # usable span / 6
    base = scan.row_start + 5
    block_row = jnp.repeat(jnp.arange(r_rows, dtype=jnp.int32), nb)
    block_i = jnp.tile(jnp.arange(nb, dtype=jnp.int32), r_rows)
    b_start = base[block_row] + block_i * len6[block_row]
    b_len = len6[block_row]

    l_max = max(int(n // (r_rows * nb)) + 2, 8)
    offs = jnp.arange(l_max, dtype=jnp.int32)
    gidx = b_start[:, None] + offs[None, :]  # [B, L] global packed indices
    in_block = (offs[None, :] < b_len[:, None]) & (gidx < n)
    gidx_safe = jnp.clip(gidx, 0, n - 1)

    b_rough = jnp.where(in_block, rough[gidx_safe], -1.0)
    b_valid = in_block & valid[gidx_safe]

    # --- corner picking: 20 sequential masked-argmax picks, blocks batched ---
    def pick(carry, _):
        pickable, corners = carry
        score = jnp.where(pickable, b_rough, -1.0)
        p = jnp.argmax(score, axis=1)  # [B]
        ok = jnp.take_along_axis(score, p[:, None], axis=1)[:, 0] > cfg.corner_threshold
        onehot = jax.nn.one_hot(p, l_max, dtype=bool) & ok[:, None]
        corners = corners | onehot
        # suppress picked +-5 neighborhood
        window = jnp.abs(offs[None, :] - p[:, None]) <= 5
        pickable = pickable & ~(window & ok[:, None])
        return (pickable, corners), None

    init = (b_valid, jnp.zeros_like(b_valid))
    (pickable, corners), _ = jax.lax.scan(pick, init, None, length=cfg.max_corners_per_block)

    # map back to packed indices
    corner_mask = jnp.zeros(n, bool)
    corner_mask = corner_mask.at[jnp.where(corners, gidx_safe, n - 1)].max(
        corners, mode="drop"
    )
    corner_mask = corner_mask & scan.mask

    planar_mask = scan.mask & ~corner_mask

    corner_cloud = _compact(scan.points, corner_mask, cfg.corner_capacity)
    planar_cloud = _compact(scan.points, planar_mask, cfg.planar_capacity)
    return corner_cloud, planar_cloud


def _compact(points: jax.Array, mask: jax.Array, capacity: int) -> Cloud:
    """Pack masked points to the front of a fixed-capacity buffer."""
    n = points.shape[0]
    order = jnp.argsort(~mask)  # valid first, stable
    pts = points[order][:capacity]
    msk = mask[order][:capacity]
    return Cloud(jnp.where(msk[:, None], pts, 0.0), msk)
