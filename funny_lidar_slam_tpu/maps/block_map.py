"""Block-structured voxel map — the round-4 redesign of the NN structure.

Replaces the per-voxel open-addressing hash (`voxel_hash.py`) for the hot
scan-to-map path. Same role as the reference's three neighbor structures
(pcl::KdTreeFLANN rebuilds, the iVox LRU hash `src/ivox_map/ivox_map.cpp`,
and the NDT voxel hash), but laid out for how TPU gathers actually cost:
XLA dynamic gathers pay a ~15-30 ns FIXED cost PER ROW (docs/ROOFLINE.md
kernel 1), so the design minimises row count and keeps rows flat:

  * Voxels are grouped into 2x2x2 BLOCKS. The 3x3x3 stencil around any
    query voxel is covered by exactly 8 neighboring blocks (for axis index
    x, the span {x-1, x, x+1} covers exactly the two consecutive blocks
    (x-1)>>1 and ((x-1)>>1)+1), so a nearby26 lookup costs 8 probe rows +
    8 data rows per unique query voxel instead of 27 + 27.
  * Each block row stores its 8 voxel buckets as flat xyz PLANES:
    row = [x(8*S) | y(8*S) | z(8*S)] float32. No trailing dim of 3
    anywhere — a minor dim of 3 pads to the 128-lane tile and bloats
    both gather rows and elementwise traffic ~40x (measured: [G*V] rows
    of (8,3) = 23.4 ns/row vs (24,) = 14.6 ns/row; a [N,216,3] distance
    kernel = 13.3 ms vs ~0.1 ms on planes).
  * Empty bucket positions and missed lookups hold the sentinel _MISS
    (1e30): distances to them square to +inf and lose every top-k, so the
    query path needs NO occupancy gather and no validity mask at all.
    (`counts` exists for insertion bookkeeping only.)

The raw block cover is the full 4x4x4-voxel neighborhood; the select
kernel then masks candidate lanes back to the EXACT reference stencil
(NearbyType, src/ivox_map/ivox_map.cpp:43-66) via each lane's static
voxel offset and the query voxel's parity — the stencil doubles as the
reference's search-radius limiter, and a superset measurably admits junk
far correspondences (round-4 finding: LOAM ATE 0.051 vs 0.021 m).

Insertion keeps the voxel-hash scheme (sort -> representative claims ->
bucket scatter, cf. voxel_hash.insert) but runs it at BLOCK granularity:
one sort whose key is block-major (block bits above the 3 local-voxel
bits) yields both the per-voxel bucket ranks and the per-block claim
groups; distinct blocks are ~4x fewer than distinct voxels on scan-like
surfaces, so the scatter-claim rounds shrink accordingly. Age-based
eviction (the LRU equivalent, ivox_map.cpp:122-143) is per block.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.voxel import spatial_hash, voxel_coords, group_by_voxel
from .voxel_hash import PROBE_WINDOW, _window, fingerprint

# sentinel for "no point here": distances square to inf, so sentinel
# candidates lose every selection with no explicit validity mask
_MISS = jnp.float32(1e30)

# the 8 block offsets covering the 3x3x3 voxel stencil of any query voxel
_COVER = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


class BlockMap(NamedTuple):
    """Functional block-map state (all arrays device-resident).

    tab has Cb+1 rows: row Cb is the constant _MISS row returned for
    lookups that miss the table (so the gather index is always in range).
    """

    fp: jax.Array  # [Cb] uint32 block fingerprint (0 = empty)
    fpwin: jax.Array  # [Cb, W] probe-window view
    counts: jax.Array  # [Cb, 8] int32 per-voxel occupancy (insert-only)
    tab: jax.Array  # [Cb+1, 3*8*S] f32 plane rows: x(8S) | y(8S) | z(8S)
    age: jax.Array  # [Cb] int32 epoch of last touch
    epoch: jax.Array  # [] int32

    @property
    def block_capacity(self) -> int:
        return self.fp.shape[0]

    @property
    def bucket_size(self) -> int:
        return self.tab.shape[1] // 24

    @property
    def plane(self) -> int:
        """Lanes per coordinate plane in a row (= 8 voxels * S)."""
        return self.tab.shape[1] // 3

    @property
    def occupied(self) -> jax.Array:
        return self.fp != 0


def create(capacity: int, bucket_size: int, dtype=jnp.float32) -> BlockMap:
    """`capacity` is the VOXEL capacity (API-compatible with
    voxel_hash.create); the block table gets capacity//2 slots = capacity*4
    voxel slots. Surface-like scans occupy ~2-4 voxels per 2x2x2 block, so
    a full voxel load keeps the block table under ~0.5 where linear-probe
    claim loss stays negligible (measured: 5% block loss at 0.45 load vs
    <0.5% below 0.3)."""
    assert capacity & (capacity - 1) == 0, "capacity must be a power of 2"
    cb = max(capacity // 2, 16)
    row = 3 * 8 * bucket_size
    return BlockMap(
        fp=jnp.zeros(cb, jnp.uint32),
        fpwin=jnp.zeros((cb, PROBE_WINDOW), jnp.uint32),
        counts=jnp.zeros((cb, 8), jnp.int32),
        tab=jnp.full((cb + 1, row), _MISS, dtype),
        age=jnp.zeros(cb, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def _block_of(coords: jax.Array):
    """Voxel coords -> (block coords, local voxel index 0..7).
    Arithmetic >> floors negatives; & takes the true parity bit."""
    bc = coords >> 1
    lb = coords & 1
    l = (lb[..., 0] << 2) | (lb[..., 1] << 1) | lb[..., 2]
    return bc, l


def _probe_blocks(m: BlockMap, bcoords: jax.Array, num_probes: int):
    """Linear fingerprint probing at block granularity (same scheme and
    rationale as voxel_hash._probe_slots)."""
    assert num_probes <= PROBE_WINDOW
    cb = m.block_capacity
    base = spatial_hash(bcoords, cb)
    fp = fingerprint(bcoords)
    offs = jnp.arange(num_probes, dtype=jnp.int32)
    slots = (base[..., None] + offs) & (cb - 1)
    slot_fp = m.fpwin[base][..., :num_probes]
    return slots, slot_fp == fp[..., None], slot_fp == 0


def find_block_slots(m: BlockMap, bcoords: jax.Array, num_probes: int = 8):
    """Slot of each block coord (or -1). [..., 3] -> [...]."""
    slots, match, _ = _probe_blocks(m, bcoords, num_probes)
    found = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1)
    return jnp.where(
        found, jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0], -1
    )


class _BlockGroups(NamedTuple):
    """One block-major sort yielding voxel AND block runs (see insert)."""

    sorted_pts: jax.Array  # [n, 3]
    sorted_mask: jax.Array  # [n]
    sorted_coords: jax.Array  # [n, 3] voxel coords
    local: jax.Array  # [n] local voxel index 0..7
    vox_rank: jax.Array  # [n] rank within the voxel run
    vox_start: jax.Array  # [n] start index of the voxel run
    blk_id: jax.Array  # [n] contiguous block-group id
    blk_is_rep: jax.Array  # [n] first point of its block run
    num_blocks: jax.Array  # []


def _group_block_major(points, mask, inv_voxel_size) -> _BlockGroups:
    """Sort points by a block-major packed key: the 3 local-voxel bits sit
    BELOW the block bits, so equal-key runs are voxels and equal-(key>>3)
    runs are blocks — one sort serves both groupings (cf. the packing
    rationale in ops.voxel.group_by_voxel)."""
    coords = voxel_coords(points, inv_voxel_size)
    bc, l = _block_of(coords)
    big = jnp.int32(2**30)
    bmin = jnp.min(jnp.where(mask[:, None], bc, big), axis=0)
    rel = bc - bmin
    rx = jnp.clip(rel[:, 0], 0, 511).astype(jnp.uint32)
    ry = jnp.clip(rel[:, 1], 0, 1023).astype(jnp.uint32)
    rz = jnp.clip(rel[:, 2], 0, 511).astype(jnp.uint32)
    key = ((((rx << 10) | ry) << 9) | rz) << 3 | l.astype(jnp.uint32)
    key = jnp.where(mask, key, jnp.uint32(0xFFFFFFFF))

    n = points.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key_sorted, order = jax.lax.sort((key, idx), num_keys=1)
    sorted_pts = points[order]
    sorted_mask = mask[order]
    sorted_coords = coords[order]
    local = l[order]

    new_vox = (key_sorted != jnp.roll(key_sorted, 1)).at[0].set(True) & sorted_mask
    new_blk = ((key_sorted >> 3) != jnp.roll(key_sorted, 1) >> 3).at[0].set(
        True
    ) & sorted_mask

    vox_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_vox, idx, 0))
    blk_id = jnp.maximum(jnp.cumsum(new_blk.astype(jnp.int32)) - 1, 0)
    return _BlockGroups(
        sorted_pts=sorted_pts,
        sorted_mask=sorted_mask,
        sorted_coords=sorted_coords,
        local=local,
        vox_rank=idx - vox_start,
        vox_start=vox_start,
        blk_id=blk_id,
        blk_is_rep=new_blk,
        num_blocks=jnp.sum(new_blk.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_probes", "max_age", "center_policy", "claim_rounds"),
)
def insert(
    m: BlockMap,
    points: jax.Array,
    mask: jax.Array,
    inv_voxel_size,
    num_probes: int = 8,
    max_age: int = 0,
    center_policy: bool = False,
    claim_rounds: int = 3,
) -> BlockMap:
    """Scatter-insert a padded point batch (voxel_hash.insert semantics at
    block granularity; reference: ivox_map.cpp:107-143 insertion +
    loam_point_to_plane_ivox.h:90-128 selective insertion).

    `max_age > 0`: blocks untouched for more than max_age epochs are purged
    up front (fp/counts zeroed; stale rows are wiped lazily on reclaim).
    `center_policy`: iVox rule — drop a point whose voxel already holds a
    point closer to the voxel center."""
    n = points.shape[0]
    cb = m.block_capacity
    s = m.bucket_size
    plane = m.plane
    row_w = 3 * plane

    epoch = m.epoch + 1
    if max_age > 0:
        expired = (m.fp != 0) & ((epoch - m.age) > max_age)
        fp_purged = jnp.where(expired, jnp.uint32(0), m.fp)
        m = m._replace(
            fp=fp_purged,
            fpwin=_window(fp_purged),
            counts=jnp.where(expired[:, None], 0, m.counts),
        )

    g = _group_block_major(points, mask, inv_voxel_size)

    # one representative (first point) per block run
    rep_idx = jnp.nonzero(g.blk_is_rep, size=n, fill_value=n - 1)[0]
    rep_bc = (g.sorted_coords >> 1)[rep_idx]  # [n, 3]
    rep_valid = jnp.arange(n) < g.num_blocks

    slots, match, empty = _probe_blocks(m, rep_bc, num_probes)
    has_match = jnp.any(match, axis=-1)
    match_slot = jnp.take_along_axis(
        slots, jnp.argmax(match, axis=-1)[..., None], axis=-1
    )[..., 0]

    # first-empty claim rounds: round 1 resolves all non-contended groups;
    # later rounds mop up scatter-min losers moving to their next empty
    # slot. `claim_rounds` bounds loss under contention: the default 3
    # suffices for incremental scan batches (per-batch load << table load),
    # while dense one-shot builds pass num_probes rounds (`build`).
    need = rep_valid & ~has_match
    assigned = jnp.where(has_match, match_slot, -1)
    group_ids = jnp.arange(n, dtype=jnp.int32)
    for _ in range(min(claim_rounds, num_probes)):
        first = jnp.argmax(empty, axis=-1)
        cand = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
        cand_ok = need & jnp.any(empty, axis=-1)
        tgt = jnp.where(cand_ok, cand, cb)
        claim = jnp.full(cb + 1, n, jnp.int32).at[tgt].min(group_ids)
        won = cand_ok & (claim[cand] == group_ids)
        assigned = jnp.where(won, cand, assigned)
        need = need & ~won
        taken = jnp.zeros(cb + 1, bool).at[jnp.where(won, cand, cb)].set(True)
        empty = empty & ~taken[slots]

    fresh = (assigned >= 0) & ~has_match & rep_valid
    upd = (assigned >= 0) & rep_valid
    tgt = jnp.where(upd, assigned, cb)
    fp_new = m.fp.at[tgt].set(fingerprint(rep_bc), mode="drop")
    age_new = m.age.at[tgt].set(epoch, mode="drop")
    # fresh slots: wipe stale bucket data to _MISS and zero the counts
    # BEFORE scattering this batch's points into them
    fresh_tgt = jnp.where(fresh, assigned, cb + 1)
    tab_w = m.tab.at[fresh_tgt].set(_MISS, mode="drop")
    counts_base = m.counts.at[jnp.where(fresh, assigned, cb)].set(0, mode="drop")

    # per-point slot + in-bucket position
    pt_slot = assigned[g.blk_id]  # [n] (block-rep claim result)
    base_cnt = counts_base[jnp.maximum(pt_slot, 0), g.local]
    pos = base_cnt + g.vox_rank
    pt_ok = g.sorted_mask & (pt_slot >= 0) & (pos < s)

    if center_policy:
        # iVox selective insert (loam_point_to_plane_ivox.h:101-124): keep a
        # point only if its voxel is fresh or it is closer to the voxel
        # center than the bucket's current best.
        centers = (g.sorted_coords.astype(points.dtype) + 0.5) / inv_voxel_size
        d_new = jnp.linalg.norm(g.sorted_pts - centers, axis=-1)
        rows = tab_w[jnp.where(pt_slot >= 0, pt_slot, cb)]  # [n, row_w]
        lane = jnp.arange(plane, dtype=jnp.int32)
        own = (lane[None, :] // s) == g.local[:, None]  # [n, plane]
        dx = rows[:, 0:plane] - centers[:, 0:1]
        dy = rows[:, plane:2 * plane] - centers[:, 1:2]
        dz = rows[:, 2 * plane:3 * plane] - centers[:, 2:3]
        d_old2 = jnp.where(own, dx * dx + dy * dy + dz * dz, jnp.inf)
        closer_exists = jnp.min(d_old2, axis=-1) <= d_new * d_new
        fresh_pt = fresh[g.blk_id]
        pt_ok = pt_ok & (fresh_pt | ~closer_exists)
        # survivor rank within the voxel run (exclusive prefix sum re-based
        # at each voxel start)
        keep = pt_ok.astype(jnp.int32)
        ex = jnp.cumsum(keep) - keep
        surv_rank = ex - ex[g.vox_start]
        pos = base_cnt + surv_rank
        pt_ok = pt_ok & (pos < s)

    # scatter the three coordinate planes in one flat scatter
    slot_safe = jnp.maximum(pt_slot, 0)
    lane0 = g.local * s + pos  # lane within the x plane
    base_idx = slot_safe * row_w + lane0
    drop = (cb + 1) * row_w
    idx3 = jnp.concatenate(
        [jnp.where(pt_ok, base_idx + k * plane, drop) for k in range(3)]
    )
    val3 = jnp.concatenate(
        [jnp.where(pt_ok, g.sorted_pts[:, k], 0.0) for k in range(3)]
    )
    tab_new = (
        tab_w.reshape((cb + 1) * row_w).at[idx3].set(val3, mode="drop")
        .reshape(cb + 1, row_w)
    )

    # counts update per (slot, local voxel)
    seg = jnp.where(pt_ok, slot_safe * 8 + g.local, cb * 8)
    ins = jax.ops.segment_sum(
        pt_ok.astype(jnp.int32), seg, num_segments=cb * 8 + 1
    )[: cb * 8].reshape(cb, 8)
    counts_new = jnp.minimum(counts_base + ins, s)

    return BlockMap(fp_new, _window(fp_new), counts_new, tab_new, age_new, epoch)


def build(
    capacity: int,
    bucket_size: int,
    points: jax.Array,
    mask: jax.Array,
    inv_voxel_size,
    num_probes: int = 8,
) -> BlockMap:
    """Fresh map from a padded cloud (the kdtree-rebuild equivalent).
    One-shot builds put the whole load in a single batch, so claim
    contention is at its worst — use the full probe window of rounds."""
    m = create(capacity, bucket_size, points.dtype)
    return insert(m, points, mask, inv_voxel_size, num_probes=num_probes,
                  claim_rounds=num_probes)


def gather_cover(
    m: BlockMap,
    uniq_coords: jax.Array,
    num_probes: int = 8,
):
    """Gather the 8-block stencil cover rows for unique query voxel coords
    [G, 3] -> [G, 8*row] candidate window (plane layout per block).

    This is the whole gather: 8 probe rows + 8 data rows per unique voxel
    (vs 27 + 27 + a count gather in the per-voxel hash). Missed blocks
    return the constant _MISS row."""
    cb = m.block_capacity
    b0 = (uniq_coords - 1) >> 1
    boffs = jnp.asarray(_COVER, jnp.int32)  # [8, 3]
    bc = b0[:, None, :] + boffs[None, :, :]  # [G, 8, 3]
    slot = find_block_slots(m, bc, num_probes)  # [G, 8]
    rows = m.tab[jnp.where(slot >= 0, slot, cb)]  # [G, 8, row]
    return rows.reshape(uniq_coords.shape[0], -1)


def gather_cover_any(m, uniq_coords: jax.Array, num_probes: int = 8):
    """Cover gather dispatched by map type: hashed BlockMap (probe +
    data rows) or dense GridMap (modulo slots, data rows only)."""
    if isinstance(m, BlockMap):
        return gather_cover(m, uniq_coords, num_probes)
    from . import grid_map

    return grid_map.gather_cover(m, uniq_coords)


def _planes_from_window(wnd: jax.Array, plane: int):
    """[N, 8*3*plane] cover windows -> (x, y, z) planes [N, 8*plane]."""
    row_w = 3 * plane
    xs = [wnd[:, b * row_w + 0 * plane: b * row_w + 1 * plane] for b in range(8)]
    ys = [wnd[:, b * row_w + 1 * plane: b * row_w + 2 * plane] for b in range(8)]
    zs = [wnd[:, b * row_w + 2 * plane: b * row_w + 3 * plane] for b in range(8)]
    return (
        jnp.concatenate(xs, axis=1),
        jnp.concatenate(ys, axis=1),
        jnp.concatenate(zs, axis=1),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "stencil", "num_probes", "group_capacity")
)
def query_knn(
    m: BlockMap,
    queries: jax.Array,
    inv_voxel_size,
    k: int = 5,
    stencil: str = "nearby26",
    num_probes: int = 8,
    group_capacity: int | None = None,
):
    """Batched k-NN over the block cover (IVoxMap::GetClosestPoint
    equivalent, src/ivox_map/ivox_map.cpp:6-37).

    `stencil` selects the reference NearbyType search pattern, enforced
    exactly by per-lane masking in the select kernel (module docstring).

    Returns (neighbors [N,k,3], sq_dists [N,k], valid [N,k]).
    """
    px, py, pz, d2, valid, order = query_knn_planes(
        m, queries, inv_voxel_size, k, num_probes, group_capacity, stencil
    )
    nbrs = jnp.stack([px, py, pz], axis=-1)
    return nbrs, d2, valid


def query_knn_planes(
    m: BlockMap,
    queries: jax.Array,
    inv_voxel_size,
    k: int,
    num_probes: int = 8,
    group_capacity: int | None = None,
    stencil: str = "nearby26",
):
    """Plane-layout k-NN: returns (px, py, pz [N,k], d2 [N,k], valid [N,k],
    order) in the ORIGINAL query order. The [.., k, 3] assembly is left to
    callers that need it; the GN candidate cache consumes planes directly."""
    from ..ops import pallas_select

    n = queries.shape[0]
    plane = m.plane
    tq = pallas_select.TQ
    gcap = group_capacity or n
    gcap = -(-gcap // tq) * tq  # fused-select block alignment

    g = group_by_voxel(queries, jnp.ones(n, bool), inv_voxel_size)
    rep_tgt = jnp.where((g.rank == 0) & (g.group_id < gcap), g.group_id, gcap)
    uniq = jnp.zeros((gcap, 3), jnp.int32).at[rep_tgt].set(
        g.group_coords, mode="drop"
    )

    wnd = gather_cover_any(m, uniq, num_probes)  # [gcap, 8*row]

    gid = jnp.minimum(g.group_id, gcap - 1)
    in_range = g.group_id < gcap
    use_pallas = n % tq == 0 and jax.default_backend() not in ("cpu",)
    sel = (pallas_select.fused_select if use_pallas
           else pallas_select.fused_select_xla)
    kd2, kx, ky, kz = sel(wnd, gid, g.sorted_pts, k, plane,
                          stencil=stencil, qvox=g.group_coords)

    valid = (kd2 < 1e18) & in_range[:, None]  # sentinels square past 1e18
    kx = jnp.where(valid, kx, 0.0)
    ky = jnp.where(valid, ky, 0.0)
    kz = jnp.where(valid, kz, 0.0)
    kd2 = jnp.where(valid, kd2, jnp.inf)

    # scatter back to the original query order
    out = [
        jnp.zeros((n, k), queries.dtype).at[g.order].set(v)
        for v in (kx, ky, kz)
    ]
    d2_out = jnp.full((n, k), jnp.inf, kd2.dtype).at[g.order].set(kd2)
    ok_out = jnp.zeros((n, k), bool).at[g.order].set(valid)
    return out[0], out[1], out[2], d2_out, ok_out, g.order


def num_occupied(m: BlockMap) -> jax.Array:
    """Occupied VOXELS (count > 0), matching voxel_hash.num_occupied."""
    return jnp.sum((m.counts > 0).astype(jnp.int32))


def num_blocks(m: BlockMap) -> jax.Array:
    return jnp.sum(m.occupied.astype(jnp.int32))


def load_factor(m: BlockMap) -> jax.Array:
    """Occupied fraction of the BLOCK table (the claim-contention metric)."""
    return num_blocks(m) / m.block_capacity
