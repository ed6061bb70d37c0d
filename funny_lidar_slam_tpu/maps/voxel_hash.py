"""Device-resident voxel-hash point map — the single NN structure of the
framework.

Replaces all three of the reference's neighbor-search structures with one
TPU-friendly design:

  * pcl::KdTreeFLANN rebuilt per map insertion (icp_optimized.h:165-189,
    loam_*_kdtree.h) -> `build` (full scatter rebuild, cheap on TPU),
  * the iVox LRU voxel hash (src/ivox_map/ivox_map.cpp:122-143, stencils at
    ivox_map.cpp:43-66) -> `insert` (incremental claim-based scatter) with
    `query_knn` stencil gathers,
  * the NDT voxel hash lives in `ndt_map.py` on the same hashing scheme.

Layout: open-addressing hash table of `capacity` slots (power of two), each
slot owning a fixed `bucket_size` point bucket. Linear probing with
`num_probes` steps. LRU eviction becomes age-based eviction: each slot stores
the epoch of its last touch; `insert` may reclaim slots whose age exceeds a
horizon (the TPU-friendly equivalent of the reference's splice-to-front LRU
lists, ivox_map.cpp:122-143 / incremental_ndt.h:192-214).

Everything is jit-safe: static shapes, masked scatters/gathers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.voxel import group_by_voxel, spatial_hash, voxel_coords

# Stencil offsets mirroring the reference's NearbyType
# (src/ivox_map/ivox_map.cpp:43-66): CENTER, NEARBY6, NEARBY18, NEARBY26.
_CENTER = [(0, 0, 0)]
_N6 = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
_N18 = _N6 + [
    (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
    (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
    (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
]
_N26 = _N18 + [
    (1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1),
    (-1, -1, 1), (-1, 1, -1), (1, -1, -1), (-1, -1, -1),
]
STENCILS = {
    "center": _CENTER,
    "nearby6": _CENTER + _N6,
    "nearby18": _CENTER + _N18,
    "nearby26": _CENTER + _N26,
}


# second independent hash for the per-slot fingerprint (0 = empty slot)
_F1 = jnp.uint32(2654435761)
_F2 = jnp.uint32(805459861)
_F3 = jnp.uint32(3674653429)


def fingerprint(coords: jax.Array) -> jax.Array:
    """Nonzero 32-bit voxel fingerprint (probing compares ONE gathered u32
    per probe instead of 3 coords + occupancy — gathers on TPU pay per row,
    so this is the probe-bandwidth optimization). A fingerprint collision
    within one probe window (~2^-32 per lookup) merely adds a few wrong
    candidate points that the distance gates then reject.

    The combine must avalanche: a plain multiply-XOR of the three coords
    (the reference's hash_function.h scheme) collides for ~1/3 of small
    +/-coordinate pairs (e.g. (3,-1,1) vs (-3,-1,-1)), so the sum is passed
    through the murmur3 fmix32 finalizer."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * _F1 + c[..., 1] * _F2 + c[..., 2] * _F3
    # murmur3 fmix32
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h | jnp.uint32(1)


# Probe window width: probing reads `fpwin[base]` — ONE wide row gather —
# instead of `num_probes` scalar gathers of fp. XLA TPU gathers pay per ROW,
# so [N] row-gathers of a few u32 are ~15x faster than element-gathers
# (measured 36 ms -> 2.5 ms for the 16k x 27-stencil probe on v5e).
#
# Width 16 leaves headroom above the matchers' default num_probes=8: linear
# probing with an 8-probe cap silently drops inserts when clustering rises
# (measured 0.5% loss at 0.59 load with 8 probes); callers that see high
# load factors can raise num_probes up to 16 without a layout change. Query
# cost scales with num_probes (the row is sliced to [:num_probes]), not
# with the window width.
PROBE_WINDOW = 16


def _window(arr: jax.Array, width: int = PROBE_WINDOW) -> jax.Array:
    """[C] -> [C, W] with out[i, j] = arr[(i + j) mod C] (W cheap rolls)."""
    return jnp.stack([jnp.roll(arr, -j) for j in range(width)], axis=1)


class VoxelHashMap(NamedTuple):
    """Functional voxel-hash map state (all arrays device-resident)."""

    fp: jax.Array  # [C] uint32 voxel fingerprint of each slot (0 = empty)
    fpwin: jax.Array  # [C, W] probe-window view: fpwin[i, j] = fp[(i+j)%C]
    count: jax.Array  # [C] int32 valid points in bucket (<= S)
    points: jax.Array  # [C, S, 3] f32 bucket points (world frame)
    age: jax.Array  # [C] int32 epoch of last touch
    epoch: jax.Array  # [] int32 current epoch (bumped per insert)

    # static config (kept as aux fields via property helpers)
    @property
    def capacity(self) -> int:
        return self.fp.shape[0]

    @property
    def bucket_size(self) -> int:
        return self.points.shape[1]

    @property
    def occupied(self) -> jax.Array:
        return self.fp != 0


def create(capacity: int, bucket_size: int, dtype=jnp.float32) -> VoxelHashMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of 2"
    return VoxelHashMap(
        fp=jnp.zeros(capacity, jnp.uint32),
        fpwin=jnp.zeros((capacity, PROBE_WINDOW), jnp.uint32),
        count=jnp.zeros(capacity, jnp.int32),
        points=jnp.zeros((capacity, bucket_size, 3), dtype),
        age=jnp.zeros(capacity, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def _probe_slots(m: VoxelHashMap, coords: jax.Array, num_probes: int):
    """For voxel coords [..., 3], return ([..., P] candidate slots,
    [..., P] key-match mask, [..., P] empty mask) under LINEAR probing.
    One u32 fingerprint gather serves both match and empty tests (a probe
    compares one gathered u32 instead of 3 coords + occupancy — gathers on
    TPU pay per row, so this is the probe-bandwidth optimization).

    Linear (not double-hashed) probing is deliberate: the probe window is a
    contiguous row (one row gather of the precomputed `fpwin` view) and, with
    the fmix32 finalizer in `spatial_hash` avalanching the base slot,
    clustering at the load factors the matchers run at (<0.6) stays mild —
    measured insert loss <0.5% at 0.59 load with 8 probes."""
    assert num_probes <= PROBE_WINDOW, "num_probes exceeds the fpwin width"
    base = spatial_hash(coords, m.capacity)
    fp = fingerprint(coords)
    offs = jnp.arange(num_probes, dtype=jnp.int32)
    slots = (base[..., None] + offs) & (m.capacity - 1)
    slot_fp = m.fpwin[base][..., :num_probes]  # [..., P] one ROW gather
    match = slot_fp == fp[..., None]
    empty = slot_fp == 0
    return slots, match, empty


def find_slots(m: VoxelHashMap, coords: jax.Array, num_probes: int = 8):
    """Slot of each voxel coord (or -1). [..., 3] -> [...]."""
    slots, match, _ = _probe_slots(m, coords, num_probes)
    found = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1)
    return jnp.where(found, jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0], -1)


@functools.partial(jax.jit, static_argnames=("num_probes", "max_age", "center_policy"))
def insert(
    m: VoxelHashMap,
    points: jax.Array,
    mask: jax.Array,
    inv_voxel_size,
    num_probes: int = 8,
    max_age: int = 0,
    center_policy: bool = False,
) -> VoxelHashMap:
    """Scatter-insert a padded point batch into the map.

    Reformulates the reference's sequential hash-map insertion
    (loam_point_to_plane_ivox.h:90-128 selective insertion,
    ivox_map.cpp:107-143) as: sort points by voxel -> one representative per
    voxel claims a slot (existing match, else empty/expired slot via
    scatter-argmin rounds) -> points scatter into bucket positions
    `count + rank`, dropping overflow beyond the bucket size.

    `max_age > 0` enables age-based eviction: slots untouched for more than
    `max_age` epochs are PURGED up front (fp/count zeroed, one elementwise
    pass over the table — no gathers) so expired voxels neither match in
    queries nor block new claims (TPU equivalent of LRU capacity eviction,
    and of the sliding-window map dropping evicted scans,
    icp_optimized.h:173-186).

    `center_policy=True` applies the iVox selective-insert rule: a point is
    dropped when its voxel already holds a point closer to the voxel center
    (loam_point_to_plane_ivox.h:101-124 semantics, approximated per batch by
    inserting the batch's closest-to-center point first).
    """
    epoch = m.epoch + 1
    if max_age > 0:
        expired = (m.fp != 0) & ((epoch - m.age) > max_age)
        fp_purged = jnp.where(expired, jnp.uint32(0), m.fp)
        m = m._replace(
            fp=fp_purged,
            fpwin=_window(fp_purged),
            count=jnp.where(expired, 0, m.count),
        )
    g = group_by_voxel(points, mask, inv_voxel_size)
    n = points.shape[0]
    cap = m.capacity

    # representative (first point) of each group
    is_rep = (g.rank == 0) & g.sorted_mask
    rep_idx = jnp.nonzero(is_rep, size=n, fill_value=n - 1)[0]
    rep_coords = g.group_coords[rep_idx]  # [n, 3] (garbage beyond num_groups)
    rep_valid = jnp.arange(n) < g.num_groups

    slots, match, empty = _probe_slots(m, rep_coords, num_probes)

    has_match = jnp.any(match, axis=-1)
    match_slot = jnp.take_along_axis(
        slots, jnp.argmax(match, axis=-1)[..., None], axis=-1
    )[..., 0]

    # claim rounds for groups without an existing slot: winner per empty slot
    # is decided by scatter-min of the group index.
    need = rep_valid & ~has_match
    assigned = jnp.where(has_match, match_slot, -1)
    group_ids = jnp.arange(n, dtype=jnp.int32)

    # Each round, every unclaimed group tries its FIRST still-empty probe
    # slot (not probe position r as in the old 8-round positional loop):
    # round 1 resolves every non-contended group at once, later rounds only
    # mop up scatter-min losers moving to their next empty slot. 3 rounds
    # match the 8-round positional loop's insert-loss (<0.5% at 0.59 load)
    # while dropping the sequential full-table scatter count 8 -> 3 — the
    # claim loop dominated the insert kernel (docs/ROOFLINE.md kernel 3).
    for _ in range(min(3, num_probes)):
        first = jnp.argmax(empty, axis=-1)  # [n] first empty probe offset
        cand = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
        cand_ok = need & jnp.any(empty, axis=-1)
        tgt = jnp.where(cand_ok, cand, cap)
        claim = jnp.full(cap + 1, n, jnp.int32).at[tgt].min(group_ids)
        won = cand_ok & (claim[cand] == group_ids)
        assigned = jnp.where(won, cand, assigned)
        need = need & ~won
        # a claimed slot is no longer empty for later rounds
        taken = jnp.zeros(cap + 1, bool).at[jnp.where(won, cand, cap)].set(True)
        empty = empty & ~taken[slots]

    # update slot metadata for winners (fresh slots reset their bucket)
    fresh = (assigned >= 0) & ~has_match & rep_valid
    upd = (assigned >= 0) & rep_valid
    tgt = jnp.where(upd, assigned, cap)
    fp_new = m.fp.at[tgt].set(fingerprint(rep_coords), mode="drop")
    age_new = m.age.at[tgt].set(epoch, mode="drop")
    count_base = m.count.at[jnp.where(fresh, assigned, cap)].set(0, mode="drop")
    points_base = m.points

    # scatter points: position = count_base[slot] + rank
    pt_slot = assigned[g.group_id]  # [n]
    pt_ok = g.sorted_mask & (pt_slot >= 0)
    base_cnt = count_base[jnp.maximum(pt_slot, 0)]
    pos = base_cnt + g.rank
    s = m.bucket_size
    pt_ok = pt_ok & (pos < s)

    if center_policy:
        # iVox rule: only insert when the voxel is new (fresh) or the new
        # point is closer to the voxel center than the bucket's current best.
        centers = (g.group_coords.astype(points.dtype) + 0.5) / inv_voxel_size
        d_new = jnp.linalg.norm(g.sorted_pts - centers, axis=-1)
        slot_safe = jnp.maximum(pt_slot, 0)
        bucket = m.points[slot_safe]  # [n, S, 3]
        bcnt = count_base[slot_safe]
        bvalid = jnp.arange(s)[None, :] < bcnt[:, None]
        d_old = jnp.linalg.norm(bucket - centers[:, None, :], axis=-1)
        d_old = jnp.where(bvalid, d_old, jnp.inf)
        closer_exists = jnp.min(d_old, axis=-1) <= d_new
        fresh_pt = fresh[g.group_id]
        pt_ok = pt_ok & (fresh_pt | ~closer_exists)
        # recompute bucket positions among the surviving points of each group:
        # exclusive prefix sum of keep, re-based at each group start
        keep = pt_ok.astype(jnp.int32)
        ex = jnp.cumsum(keep) - keep
        idxs = jnp.arange(n, dtype=jnp.int32)
        seg_start = idxs - g.rank
        surv_rank = ex - ex[seg_start]
        pos = base_cnt + surv_rank
        pt_ok = pt_ok & (pos < s)

    flat_idx = jnp.where(pt_ok, jnp.maximum(pt_slot, 0) * s + pos, cap * s)
    points_flat = points_base.reshape(cap * s, 3)
    points_new = points_flat.at[flat_idx].set(
        jnp.where(pt_ok[:, None], g.sorted_pts, 0.0), mode="drop"
    ).reshape(cap, s, 3)

    # new counts: old + inserted per slot
    ins = jax.ops.segment_sum(
        pt_ok.astype(jnp.int32), jnp.where(pt_ok, pt_slot, cap), num_segments=cap + 1
    )[:cap]
    count_new = jnp.minimum(count_base + ins, s)

    return VoxelHashMap(fp_new, _window(fp_new), count_new, points_new, age_new, epoch)


def build(
    capacity: int,
    bucket_size: int,
    points: jax.Array,
    mask: jax.Array,
    inv_voxel_size,
    num_probes: int = 8,
) -> VoxelHashMap:
    """Fresh map from a padded cloud (the kdtree-rebuild equivalent)."""
    m = create(capacity, bucket_size, points.dtype)
    return insert(m, points, mask, inv_voxel_size, num_probes=num_probes)


@functools.partial(
    jax.jit, static_argnames=("k", "stencil", "num_probes", "group_capacity")
)
def query_knn(
    m: VoxelHashMap,
    queries: jax.Array,
    inv_voxel_size,
    k: int = 5,
    stencil: str = "nearby18",
    num_probes: int = 8,
    group_capacity: int | None = None,
):
    """Batched k-nearest-neighbors via stencil gather + top-k.

    Equivalent of IVoxMap::GetClosestPoint (src/ivox_map/ivox_map.cpp:6-37):
    probe the stencil voxels around each query's voxel, gather their buckets,
    take the k smallest distances.

    Default path is direct per-point (probing is one wide fpwin row gather
    per candidate, see _probe_slots). Passing `group_capacity` switches to a
    sort-deduplicated path that runs the stencil lookup once per UNIQUE query
    voxel — worth it only when queries are much denser than the voxel grid;
    points in groups beyond the capacity report no neighbors.

    Returns (neighbors [N,k,3], sq_dists [N,k], valid [N,k]).
    """
    n = queries.shape[0]
    offsets = jnp.asarray(STENCILS[stencil], jnp.int32)  # [V, 3]
    v = offsets.shape[0]
    s = m.bucket_size

    if group_capacity is None:
        qc = voxel_coords(queries, inv_voxel_size)  # [N, 3]
        cand = qc[:, None, :] + offsets[None, :, :]  # [N, V, 3]
        slot = find_slots(m, cand, num_probes)  # [N, V]
        slot_safe = jnp.maximum(slot, 0)
        cand_pts = m.points[slot_safe].reshape(n, v * s, 3)
        bcnt = jnp.where(slot >= 0, m.count[slot_safe], 0)  # [N, V]
        cand_valid = (jnp.arange(s)[None, None, :] < bcnt[:, :, None]).reshape(n, v * s)
        d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_valid, d2, jnp.inf)
        if k == 1:
            idx = jnp.argmin(d2, axis=1)[:, None]
            knn_d2 = jnp.take_along_axis(d2, idx, axis=1)
        else:
            neg, idx = jax.lax.top_k(-d2, k)
            knn_d2 = -neg
        nbrs = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
        return nbrs, knn_d2, jnp.isfinite(knn_d2)

    from ..ops.voxel import group_by_voxel

    gcap = group_capacity

    g = group_by_voxel(queries, jnp.ones(n, bool), inv_voxel_size)

    # one representative voxel coord per group
    rep_tgt = jnp.where((g.rank == 0) & (g.group_id < gcap), g.group_id, gcap)
    uniq = jnp.zeros((gcap, 3), jnp.int32).at[rep_tgt].set(
        g.group_coords, mode="drop"
    )

    # per-group stencil probe + bucket gather (wide rows)
    cand = uniq[:, None, :] + offsets[None, :, :]  # [G, V, 3]
    slot = find_slots(m, cand, num_probes)  # [G, V]
    slot_safe = jnp.maximum(slot, 0)
    bpts = m.points[slot_safe]  # [G, V, S, 3]
    bcnt = jnp.where(slot >= 0, m.count[slot_safe], 0)  # [G, V]
    bvalid = jnp.arange(s)[None, None, :] < bcnt[:, :, None]  # [G, V, S]
    flat_pts = bpts.reshape(gcap, v * s, 3)
    flat_valid = bvalid.reshape(gcap, v * s)

    # per-point candidate set: one wide row gather via the group id
    gid = jnp.minimum(g.group_id, gcap - 1)
    in_range = g.group_id < gcap
    cand_pts = flat_pts[gid]  # [N, V*S, 3]
    cand_valid = flat_valid[gid] & in_range[:, None]

    diff = cand_pts - g.sorted_pts[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # [N, V*S]
    d2 = jnp.where(cand_valid, d2, jnp.inf)

    if k == 1:
        idx = jnp.argmin(d2, axis=1)[:, None]
        knn_d2 = jnp.take_along_axis(d2, idx, axis=1)
    else:
        neg, idx = jax.lax.top_k(-d2, k)  # smallest distances
        knn_d2 = -neg
    nbrs = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
    ok = jnp.isfinite(knn_d2)

    # scatter back to the original query order
    nbrs_out = jnp.zeros((n, k, 3), queries.dtype).at[g.order].set(nbrs)
    d2_out = jnp.full((n, k), jnp.inf, knn_d2.dtype).at[g.order].set(knn_d2)
    ok_out = jnp.zeros((n, k), bool).at[g.order].set(ok)
    return nbrs_out, d2_out, ok_out


def num_occupied(m: VoxelHashMap) -> jax.Array:
    return jnp.sum(m.occupied.astype(jnp.int32))


def load_factor(m: VoxelHashMap) -> jax.Array:
    """Occupied fraction of the table. Above ~0.6, linear probing with the
    default num_probes=8 starts dropping inserts — size `capacity` so the
    steady-state map stays below that, or raise num_probes (<= PROBE_WINDOW)."""
    return num_occupied(m) / m.capacity
