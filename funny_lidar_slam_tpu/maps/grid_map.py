"""Dense modulo-addressed grid map — the probe-free, claim-free layout.

EXPERIMENTAL alternative to `block_map` for the scan-matching local map.
The roofline accounting (docs/ROOFLINE.md kernel 1/3) shows the hashed
block table pays two structural costs the dense grid eliminates:

  * the PROBE gather: resolving 8 cover blocks per unique query voxel
    costs a [G, 8] row gather of fingerprint windows (~half of
    gather_cover's row budget) — here slots are pure modulo arithmetic;
  * CLAIM ROUNDS on insert: each round is a full-table scatter+gather
    (~1.7 ms) — here the slot of a block is deterministic, so insertion
    is one bucket scatter.

Layout: a fixed (Dx, Dy, Dz) grid of 2x2x2-voxel blocks, slot =
((bx mod Dx)*Dy + (by mod Dy))*Dz + (bz mod Dz). Rows use the SAME
plane layout as BlockMap ([x(8S) | y(8S) | z(8S)]), so `gather_cover`
output feeds the unmodified Pallas fused_select kernel.

Aliasing semantics (the modulo wrap): two blocks whose coordinates differ
by a multiple of the grid dims share a slot. Within one insert batch that
requires a scan wider than dims*2*voxel_size — size the grid above the
local-map diameter and it cannot happen. ACROSS time, a revisit after the
window moved re-claims the slot (newest writer wins, like the LRU
eviction it replaces). Stale points that survive in an aliased slot are
self-filtering: their distance to any query is >= dims*2*voxel, orders of
magnitude past every consumer's correspondence gate (max_corr^2, the
5-NN plane gate, NDT outlier gate, fitness max_range) — the same
argument that lets the stencil mask skip a coordinate check.

Reference semantics replaced: the same iVox/KdTree NN structures as
block_map (src/ivox_map/ivox_map.cpp), with eviction by age.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .block_map import _COVER, _MISS, _group_block_major

_EMPTY = jnp.int32(-(2**30))  # owner coord sentinel for unclaimed slots


class GridMap(NamedTuple):
    """Dense grid state. `bc` keeps the (Dx, Dy, Dz) shape so the grid
    dims are static-by-shape — no config threading needed."""

    bc: jax.Array  # [Dx, Dy, Dz, 3] int32 owner block coord (EMPTY = unclaimed)
    counts: jax.Array  # [S, 8] int32 per-voxel occupancy
    tab: jax.Array  # [S + 1, 3*8*bucket] plane rows; row S = _MISS
    age: jax.Array  # [S] int32 epoch of last touch
    epoch: jax.Array  # [] int32

    @property
    def dims(self) -> tuple:
        return self.bc.shape[:3]

    @property
    def num_slots(self) -> int:
        d = self.bc.shape
        return d[0] * d[1] * d[2]

    @property
    def bucket_size(self) -> int:
        return self.tab.shape[1] // 24

    @property
    def plane(self) -> int:
        return self.tab.shape[1] // 3


def create(dims: tuple, bucket_size: int, dtype=jnp.float32) -> GridMap:
    s = dims[0] * dims[1] * dims[2]
    row = 3 * 8 * bucket_size
    return GridMap(
        bc=jnp.full(tuple(dims) + (3,), _EMPTY, jnp.int32),
        counts=jnp.zeros((s, 8), jnp.int32),
        tab=jnp.full((s + 1, row), _MISS, dtype),
        age=jnp.zeros(s, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def slot_of(bc: jax.Array, dims: tuple) -> jax.Array:
    """Block coords [..., 3] -> slot [...] by per-axis modulo (exact for
    negatives)."""
    mx = jnp.remainder(bc[..., 0], dims[0])
    my = jnp.remainder(bc[..., 1], dims[1])
    mz = jnp.remainder(bc[..., 2], dims[2])
    return (mx * dims[1] + my) * dims[2] + mz


@functools.partial(jax.jit, static_argnames=("max_age", "center_policy"))
def insert(
    m: GridMap,
    points: jax.Array,
    mask: jax.Array,
    inv_voxel_size,
    max_age: int = 0,
    center_policy: bool = False,
) -> GridMap:
    """Scatter-insert a padded point batch. No probing, no claim rounds:
    the slot of each block is modulo arithmetic; a slot owned by a
    DIFFERENT block coord is re-claimed by the newest writer (counts
    reset, stale rows wiped)."""
    n = points.shape[0]
    dims = m.dims
    s_cap = m.num_slots
    s = m.bucket_size
    plane = m.plane
    row_w = 3 * plane
    bc_flat = m.bc.reshape(-1, 3)

    epoch = m.epoch + 1
    if max_age > 0:
        # Eager eviction MUST wipe tab rows: unlike the hashed block map
        # (whose gather consults fingerprints), the grid gather reads rows
        # directly, and evicted points are NEARBY old geometry — not the
        # far-away aliases the distance gates filter. The wipe is a bounded
        # scatter (4096 slots/insert ≈ 3 MB); slots beyond the bound keep
        # bc set and are wiped by later inserts (expired stays true).
        expired = (bc_flat[:, 0] != _EMPTY) & ((epoch - m.age) > max_age)
        wipe_idx = jnp.nonzero(expired, size=4096, fill_value=s_cap + 1)[0]
        m = m._replace(tab=m.tab.at[wipe_idx].set(_MISS, mode="drop"))
        wiped = jnp.zeros(s_cap, bool).at[wipe_idx].set(True, mode="drop")
        bc_flat = jnp.where(wiped[:, None], _EMPTY, bc_flat)
        m = m._replace(counts=jnp.where(wiped[:, None], 0, m.counts))

    g = _group_block_major(points, mask, inv_voxel_size)

    rep_idx = jnp.nonzero(g.blk_is_rep, size=n, fill_value=n - 1)[0]
    rep_bc = (g.sorted_coords >> 1)[rep_idx]  # [n, 3]
    rep_valid = jnp.arange(n) < g.num_blocks

    rep_slot = slot_of(rep_bc, dims)  # [n]
    owner = bc_flat[rep_slot]  # [n, 3]
    same = jnp.all(owner == rep_bc, axis=-1)
    fresh = rep_valid & ~same  # empty OR aliased: re-claim

    tgt = jnp.where(rep_valid, rep_slot, s_cap)
    bc_new = bc_flat.at[tgt].set(rep_bc, mode="drop").reshape(m.bc.shape)
    age_new = m.age.at[tgt].set(epoch, mode="drop")
    fresh_tgt = jnp.where(fresh, rep_slot, s_cap + 1)
    tab_w = m.tab.at[fresh_tgt].set(_MISS, mode="drop")
    counts_base = m.counts.at[jnp.where(fresh, rep_slot, s_cap)].set(
        0, mode="drop")

    # per-point slot + in-bucket position (identical to block_map.insert)
    pt_slot = rep_slot[g.blk_id]
    pt_on = g.sorted_mask
    base_cnt = counts_base[pt_slot, g.local]
    pos = base_cnt + g.vox_rank
    pt_ok = pt_on & (pos < s)

    if center_policy:
        centers = (g.sorted_coords.astype(points.dtype) + 0.5) / inv_voxel_size
        d_new = jnp.linalg.norm(g.sorted_pts - centers, axis=-1)
        rows = tab_w[pt_slot]
        lane = jnp.arange(plane, dtype=jnp.int32)
        own = (lane[None, :] // s) == g.local[:, None]
        dx = rows[:, 0:plane] - centers[:, 0:1]
        dy = rows[:, plane:2 * plane] - centers[:, 1:2]
        dz = rows[:, 2 * plane:3 * plane] - centers[:, 2:3]
        d_old2 = jnp.where(own, dx * dx + dy * dy + dz * dz, jnp.inf)
        closer_exists = jnp.min(d_old2, axis=-1) <= d_new * d_new
        fresh_pt = fresh[g.blk_id]
        pt_ok = pt_ok & (fresh_pt | ~closer_exists)
        keep = pt_ok.astype(jnp.int32)
        ex = jnp.cumsum(keep) - keep
        surv_rank = ex - ex[g.vox_start]
        pos = base_cnt + surv_rank
        pt_ok = pt_ok & (pos < s)

    lane0 = g.local * s + pos
    base_idx = pt_slot * row_w + lane0
    drop = (s_cap + 1) * row_w
    idx3 = jnp.concatenate(
        [jnp.where(pt_ok, base_idx + k * plane, drop) for k in range(3)])
    val3 = jnp.concatenate(
        [jnp.where(pt_ok, g.sorted_pts[:, k], 0.0) for k in range(3)])
    tab_new = (
        tab_w.reshape((s_cap + 1) * row_w).at[idx3].set(val3, mode="drop")
        .reshape(s_cap + 1, row_w)
    )

    seg = jnp.where(pt_ok, pt_slot * 8 + g.local, s_cap * 8)
    ins = jax.ops.segment_sum(
        pt_ok.astype(jnp.int32), seg, num_segments=s_cap * 8 + 1
    )[: s_cap * 8].reshape(s_cap, 8)
    counts_new = jnp.minimum(counts_base + ins, s)

    return GridMap(bc_new, counts_new, tab_new, age_new, epoch)


def gather_cover(m: GridMap, uniq_coords: jax.Array, num_probes: int = 0) -> jax.Array:
    """8-block stencil cover rows per unique query voxel — NO probe gather:
    slots come from modulo arithmetic, one data-row gather total.
    [G, 3] -> [G, 8*row]. Empty slots return _MISS rows by construction;
    aliased slots self-filter by distance (module docstring)."""
    del num_probes  # API parity with block_map.gather_cover
    b0 = (uniq_coords - 1) >> 1
    boffs = jnp.asarray(_COVER, jnp.int32)
    bc = b0[:, None, :] + boffs[None, :, :]  # [G, 8, 3]
    rows = m.tab[slot_of(bc, m.dims)]  # [G, 8, row]
    return rows.reshape(uniq_coords.shape[0], -1)


def build(dims: tuple, bucket_size: int, points, mask, inv_voxel_size,
          dtype=jnp.float32) -> GridMap:
    return insert(create(dims, bucket_size, dtype), points, mask,
                  inv_voxel_size)


def num_occupied(m: GridMap) -> jax.Array:
    return jnp.sum((m.counts > 0).astype(jnp.int32))


def stored_block_coords(m: GridMap):
    """Owner coords of live slots (oracle/test helper)."""
    flat = m.bc.reshape(-1, 3)
    return flat, flat[:, 0] != _EMPTY
