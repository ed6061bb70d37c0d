"""Incremental NDT voxel map: per-voxel Gaussian statistics on the shared
voxel-hash directory.

TPU-native re-design of the reference's IncrementalNDT voxel store
(include/registration/incremental_ndt.h:68-227): instead of an
unordered_map + LRU list holding raw point vectors, each slot keeps running
moment accumulators (n, sum, sum of outer products). A batch insert computes
per-voxel batch moments with one sort + segment-sum and scatter-merges them —
mathematically the pooled version of the reference's UpdateMeanAndCov
(incremental_ndt.h:112-127).

Deviations from the reference (documented, behavior-equivalent):
  * covariance normalization is M2/(n-1) throughout (the reference mixes
    /(n-1) at first estimate and a pooled /(m+n) on merge);
  * eigenvalue flooring (incremental_ndt.h:165-177: lambda_{1,2} >=
    1e-3*lambda_0) is applied as Tikhonov regularization
    inv(sigma + 1e-3*lambda_max*I), which enforces the same ~1e3 condition
    cap without a batched eigenvector decomposition;
  * LRU capacity eviction becomes age-based slot reclamation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lin3 import inv3 as _inv3
from ..ops.lin3 import sym3_eigvalsh
from ..ops.voxel import group_by_voxel, spatial_hash, voxel_coords
from .voxel_hash import PROBE_WINDOW, _window, fingerprint


class NdtMap(NamedTuple):
    fp: jax.Array  # [C] uint32 voxel fingerprint (0 = empty slot)
    fpwin: jax.Array  # [C, W] probe-window view (see voxel_hash.PROBE_WINDOW)
    count: jax.Array  # [C] f32 total points accumulated
    mean: jax.Array  # [C, 3]
    m2: jax.Array  # [C, 3, 3] sum of centered outer products
    info: jax.Array  # [C, 3, 3] cached inverse covariance
    estimated: jax.Array  # [C] bool (enough points for a Gaussian)
    age: jax.Array  # [C] int32
    epoch: jax.Array  # [] int32

    @property
    def capacity(self) -> int:
        return self.fp.shape[0]

    @property
    def occupied(self) -> jax.Array:
        return self.fp != 0


def create(capacity: int, dtype=jnp.float32) -> NdtMap:
    assert capacity & (capacity - 1) == 0
    return NdtMap(
        fp=jnp.zeros(capacity, jnp.uint32),
        fpwin=jnp.zeros((capacity, PROBE_WINDOW), jnp.uint32),
        count=jnp.zeros(capacity, dtype),
        mean=jnp.zeros((capacity, 3), dtype),
        m2=jnp.zeros((capacity, 3, 3), dtype),
        info=jnp.zeros((capacity, 3, 3), dtype),
        estimated=jnp.zeros(capacity, bool),
        age=jnp.zeros(capacity, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def _probe(m: NdtMap, coords: jax.Array, num_probes: int):
    """Linear fingerprint probing (same scheme as voxel_hash._probe_slots):
    one wide row gather of the precomputed fpwin view per candidate."""
    assert num_probes <= PROBE_WINDOW
    base = spatial_hash(coords, m.capacity)
    fp = fingerprint(coords)
    offs = jnp.arange(num_probes, dtype=jnp.int32)
    slots = (base[..., None] + offs) & (m.capacity - 1)
    slot_fp = m.fpwin[base][..., :num_probes]
    return slots, slot_fp == fp[..., None], slot_fp == 0


def _sym3_eig_max(a: jax.Array) -> jax.Array:
    """Largest eigenvalue of symmetric [..., 3, 3]."""
    return sym3_eigvalsh(a)[..., 2]


def _regularized_info(sigma: jax.Array, n: jax.Array, min_points: float) -> tuple[jax.Array, jax.Array]:
    """Cached inverse covariance with the reference's conditioning rules.

    n <= 1 point: info = 1e2 * I (incremental_ndt.h:136-139).
    else: inv(sigma + max(1e-3 * lambda_max, 1e-6) * I).
    Returns (info, estimated_flag) where estimated requires n > min_points
    (or any n when used in first-scan/frozen-map mode — handled by caller).
    """
    lam_max = _sym3_eig_max(sigma)
    eps = jnp.maximum(1e-3 * lam_max, 1e-6)
    info = _inv3(sigma + eps[..., None, None] * jnp.eye(3, dtype=sigma.dtype))
    single = (n <= 1.0)[..., None, None]
    info = jnp.where(single, 1.0e2 * jnp.eye(3, dtype=sigma.dtype), info)
    estimated = n > min_points
    return info, estimated


@functools.partial(
    jax.jit,
    static_argnames=("num_probes", "max_age", "min_points", "max_points",
                     "claim_rounds"),
)
def insert(
    m: NdtMap,
    points: jax.Array,
    mask: jax.Array,
    inv_voxel_size,
    num_probes: int = 8,
    max_age: int = 0,
    min_points: int = 5,
    max_points: int = 50,
    estimate_all: jax.Array | bool = False,
    claim_rounds: int = 3,
) -> NdtMap:
    """Merge a padded point batch into the per-voxel Gaussian statistics.

    `estimate_all=True` is the reference's first-scan / localization-frozen-map
    behavior (flag_first_scan_, incremental_ndt.h:131-143): every touched voxel
    becomes estimated regardless of count (single-point voxels get info=1e2*I).
    It is a TRACED flag (only gates one elementwise `or`), so callers switch
    per-scan without retracing or double-computing both variants.
    `max_points` stops updating voxels that already saturated
    (incremental_ndt.h:146-148). `claim_rounds` bounds slot-claim contention
    resolution: 3 suffices for incremental scan batches; dense one-shot map
    loads should pass num_probes (see block_map.insert).
    """
    epoch = m.epoch + 1
    cap = m.capacity
    n = points.shape[0]
    dtype = points.dtype

    g = group_by_voxel(points, mask, inv_voxel_size)

    # batch moments per group (segment reductions over the sorted order)
    seg = jnp.where(g.sorted_mask, g.group_id, n)
    w = g.sorted_mask.astype(dtype)
    cnt = jax.ops.segment_sum(w, seg, num_segments=n + 1)[:n]
    s1 = jax.ops.segment_sum(g.sorted_pts * w[:, None], seg, num_segments=n + 1)[:n]
    # batch M2 about the BATCH MEAN (two-pass): raw second moments at world
    # coordinates cancel catastrophically in f32 once |p| >> the point
    # spread (at 45 m, mean^2 ~ 2e3 vs variance ~1e-2 -> the old
    # raw2 - n*mean*mean^T recentering produced INDEFINITE covariances whose
    # inverses then NaN'd the Gauss-Newton H; incremental_ndt.h:112-178
    # accumulates sequentially in double and never hits this)
    bmean = s1 / jnp.maximum(cnt, 1.0)[:, None]
    centered = (g.sorted_pts - bmean[jnp.minimum(g.group_id, n - 1)]) * w[:, None]
    bm2 = jax.ops.segment_sum(
        centered[:, :, None] * centered[:, None, :], seg, num_segments=n + 1
    )[:n]

    rep_valid = (jnp.arange(n) < g.num_groups) & (cnt > 0)
    is_rep = (g.rank == 0) & g.sorted_mask
    rep_idx = jnp.nonzero(is_rep, size=n, fill_value=n - 1)[0]
    rep_coords = g.group_coords[rep_idx]

    # --- slot lookup / claim (same scheme as voxel_hash.insert) ---
    slots, match, empty = _probe(m, rep_coords, num_probes)
    if max_age > 0:
        empty = empty | (~empty & ((epoch - m.age[slots]) > max_age))

    has_match = jnp.any(match, axis=-1)
    match_slot = jnp.take_along_axis(slots, jnp.argmax(match, axis=-1)[:, None], axis=-1)[:, 0]
    # first-empty claim rounds (the block_map.insert scheme): round 1
    # resolves every non-contended group at once, later rounds mop up
    # scatter-min losers — 3 sequential full-table scatters instead of the
    # old num_probes positional rounds (the claim loop dominated insert
    # cost, docs/ROOFLINE.md kernel 3, and NDT inserts fire EVERY converged
    # scan, not on a keyframe gate)
    need = rep_valid & ~has_match
    assigned = jnp.where(has_match, match_slot, -1)
    group_ids = jnp.arange(n, dtype=jnp.int32)
    for _ in range(min(claim_rounds, num_probes)):
        first = jnp.argmax(empty, axis=-1)
        cand = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
        cand_ok = need & jnp.any(empty, axis=-1)
        tgt = jnp.where(cand_ok, cand, cap)
        claim = jnp.full(cap + 1, n, jnp.int32).at[tgt].min(group_ids)
        won = cand_ok & (claim[cand] == group_ids)
        assigned = jnp.where(won, cand, assigned)
        need = need & ~won
        taken = jnp.zeros(cap + 1, bool).at[jnp.where(won, cand, cap)].set(True)
        empty = empty & ~taken[slots]

    fresh = (assigned >= 0) & ~has_match & rep_valid
    upd = (assigned >= 0) & rep_valid
    slot_safe = jnp.maximum(assigned, 0)

    # merge moments: pooled accumulators (old zeroed when fresh or saturated)
    old_n = jnp.where(fresh, 0.0, m.count[slot_safe])
    old_mean = jnp.where(fresh[:, None], 0.0, m.mean[slot_safe])
    old_m2 = jnp.where(fresh[:, None, None], 0.0, m.m2[slot_safe])

    saturated = (old_n > max_points) & m.estimated[slot_safe] & ~fresh
    do_merge = upd & ~saturated

    tot = old_n + cnt
    safe_tot = jnp.maximum(tot, 1.0)
    # Chan's parallel merge: every term is centered (delta is at most one
    # voxel diagonal), so the update stays accurate in f32 at any distance
    # from the origin.
    delta = bmean - old_mean
    new_mean = old_mean + delta * (cnt / safe_tot)[:, None]
    new_m2 = old_m2 + bm2 + (old_n * cnt / safe_tot)[:, None, None] * (
        delta[:, :, None] * delta[:, None, :]
    )

    sigma = new_m2 / jnp.maximum(tot - 1.0, 1.0)[:, None, None]
    info, est_cnt = _regularized_info(sigma, tot, float(min_points))
    estimated = est_cnt | (jnp.asarray(estimate_all) & (tot > 0))

    tgt = jnp.where(do_merge, assigned, cap)
    fp_new = m.fp.at[jnp.where(upd, assigned, cap)].set(
        fingerprint(rep_coords), mode="drop"
    )
    age_new = m.age.at[jnp.where(upd, assigned, cap)].set(epoch, mode="drop")
    count_new = m.count.at[tgt].set(tot, mode="drop")
    mean_new = m.mean.at[tgt].set(new_mean, mode="drop")
    m2_new = m.m2.at[tgt].set(new_m2, mode="drop")
    info_new = m.info.at[tgt].set(info, mode="drop")
    est_new = m.estimated.at[tgt].set(estimated, mode="drop")

    return NdtMap(fp_new, _window(fp_new), count_new, mean_new, m2_new, info_new,
                  est_new, age_new, epoch)


# 7-voxel stencil of the reference NDT (incremental_ndt.h:130-137)
NDT_STENCIL = jnp.asarray(
    [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, -1), (0, 0, 1)],
    jnp.int32,
)


@functools.partial(jax.jit, static_argnames=("num_probes", "group_capacity"))
def query_stencil(m: NdtMap, queries: jax.Array, inv_voxel_size,
                  num_probes: int = 8, group_capacity: int | None = None):
    """Gather the 7-neighborhood Gaussians for each query point.

    Default path is direct per-point; passing `group_capacity` switches to
    the sort-deduplicated path (one stencil probe per unique query voxel),
    like voxel_hash.query_knn.

    Returns (mean [N,7,3], info [N,7,3,3], valid [N,7]).
    """
    n = queries.shape[0]
    if group_capacity is None:
        qc = voxel_coords(queries, inv_voxel_size)  # [N, 3]
        cand = qc[:, None, :] + NDT_STENCIL[None, :, :]  # [N, 7, 3]
        slots, match, _ = _probe(m, cand, num_probes)
        found = jnp.any(match, axis=-1)
        first = jnp.argmax(match, axis=-1)
        slot = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
        slot_safe = jnp.maximum(jnp.where(found, slot, 0), 0)
        valid = found & m.estimated[slot_safe]
        return m.mean[slot_safe], m.info[slot_safe], valid

    gcap = group_capacity
    g = group_by_voxel(queries, jnp.ones(n, bool), inv_voxel_size)
    rep_tgt = jnp.where((g.rank == 0) & (g.group_id < gcap), g.group_id, gcap)
    uniq = jnp.zeros((gcap, 3), jnp.int32).at[rep_tgt].set(g.group_coords, mode="drop")

    cand = uniq[:, None, :] + NDT_STENCIL[None, :, :]  # [G, 7, 3]
    slots, match, _ = _probe(m, cand, num_probes)  # [G, 7, P]
    found = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1)
    slot = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
    slot_safe = jnp.maximum(jnp.where(found, slot, 0), 0)
    g_valid = found & m.estimated[slot_safe]  # [G, 7]
    g_mean = m.mean[slot_safe]  # [G, 7, 3]
    g_info = m.info[slot_safe]  # [G, 7, 3, 3]

    gid = jnp.minimum(g.group_id, gcap - 1)
    in_range = g.group_id < gcap
    mean_s = g_mean[gid]
    info_s = g_info[gid]
    valid_s = g_valid[gid] & in_range[:, None]

    # scatter back to original query order via the sort permutation
    mean = jnp.zeros((n, 7, 3), queries.dtype).at[g.order].set(mean_s)
    info = jnp.zeros((n, 7, 3, 3), queries.dtype).at[g.order].set(info_s)
    valid = jnp.zeros((n, 7), bool).at[g.order].set(valid_s)
    return mean, info, valid
