"""Batched residual + Jacobian kernels for scan-to-map registration.

Each kernel evaluates, for every (padded) source point at the current pose
estimate, a correspondence, a residual, its 6-dof Jacobian, and a validity
mask, then reduces them to 6x6 normal equations H and right-hand side g with
one masked matmul (MXU-friendly: H = J^T W J as [6,N]x[N,6]).

The residual formulas and gates mirror the reference matchers exactly (each
function cites its source); only the execution model differs — per-point PSTL
loops with KdTree searches become stencil gathers over the device-resident
voxel-hash map.

Tangent/update conventions per matcher (kept identical to the reference):
  * point_to_point (icp_optimized.h:95-136): dx = [t(0:3), r(3:6)],
    update P += dt, R := R Exp(dr) — rotation perturbed on the RIGHT.
  * point_to_plane / point_to_line (loam_*_kdtree.h): dx = [r(0:3), t(3:6)],
    update R := Exp(dr) R (LEFT), P += dt.
  * ndt (incremental_ndt.h:229-337): dx = [r(0:3), t(3:6)],
    update R := R Exp(dr) (RIGHT), P += dt.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import so3_hat
from ..maps import block_map
from ..maps import ndt_map as ndt
from ..maps import voxel_hash
from ..ops import pallas_select
from ..ops.lin3 import inv3, sym3_eigvalsh, sym3_principal_eigvec
from ..ops.voxel import group_by_voxel


class HG(NamedTuple):
    """Reduced normal equations + per-iteration statistics."""

    h: jax.Array  # [6, 6]
    g: jax.Array  # [6]
    num_valid: jax.Array  # [] int32
    total_res: jax.Array  # [] summed residual magnitude


def _reduce_scalar(j: jax.Array, r: jax.Array, valid: jax.Array) -> HG:
    """Scalar residual rows: H = sum J J^T, g = -sum J r (masked)."""
    w = valid.astype(j.dtype)
    jw = j * w[:, None]
    h = jw.T @ j
    g = -(jw.T @ r)
    return HG(h, g, jnp.sum(valid, dtype=jnp.int32), jnp.sum(jnp.abs(r) * w))


def _reduce_vec3(j: jax.Array, r: jax.Array, lam: jax.Array, valid: jax.Array) -> HG:
    """3-vector residuals with per-point information matrices lam [N,3,3]."""
    w = valid.astype(j.dtype)
    lj = jnp.einsum("nab,nbk->nak", lam, j) * w[:, None, None]  # [N,3,6]
    h = jnp.einsum("nak,nam->km", j, lj)
    g = -jnp.einsum("nak,na->k", lj, r)
    res = jnp.einsum("na,nab,nb->n", r, lam, r)
    return HG(h, g, jnp.sum(valid, dtype=jnp.int32), jnp.sum(res * w))


def transform_points(t_mat: jax.Array, pts: jax.Array) -> jax.Array:
    r = t_mat[:3, :3]
    return pts @ r.T + t_mat[:3, 3]


# ---------------------------------------------------------------------------
# Correspondence/linearization split. Each residual family is factored into
#   *_corr(t_mat, ...) -> Corr   — the expensive part: NN stencil gather +
#                                  surface fit + validity gates
#   *_hg(t_mat, src, corr) -> HG — the cheap part: re-linearize the residual
#                                  at the current pose on FROZEN matches
# so the GN driver can re-gather every few iterations (gn.run_gn: the classic
# two-loop ICP schedule — the reference re-searches the KdTree every
# iteration, e.g. icp_optimized.h:78-116, but after the first 2-3 iterations
# the pose moves millimeters and the matches are static; the stencil gather
# is ~90% of a GN iteration on the v5e).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Candidate-set caching (the third level of the gather hierarchy).
#
# Profiling on the v5e shows one stencil gather is ~13.5 ms while a full
# relinearization on cached data is ~0.2 ms — the gather IS the GN iteration.
# Freezing the chosen match (the *_corr/*_hg_corr split) caps the reuse at
# corr_every~4 before quality degrades, because the frozen NN/fit goes stale.
#
# Caching the M nearest CANDIDATES per source point instead, and re-selecting
# the NN / re-fitting the surface among them at the CURRENT pose every
# iteration, keeps the reference's search-every-iteration semantics (the
# selection is exact as long as the pose has moved less than the candidate
# margin since the gather) while running the expensive stencil gather only
# every ~3 iterations of 10. Selection over [N, M] is pure VPU work.
# ---------------------------------------------------------------------------


class CandSet(NamedTuple):
    """Cached NN candidates: the M nearest map points per source point,
    gathered at some past pose, in COORDINATE-PLANE layout ([N, M] per
    axis — a trailing dim of 3 pads to the 128-lane TPU tile and bloats
    every elementwise pass ~40x, docs/ROOFLINE.md round 4).

    Rows are in VOXEL-SORTED order of the gather (the fused select kernel's
    native order); `src`/`src_mask` carry the matching source points so no
    scatter-back to the original order is ever needed — every consumer is an
    order-invariant masked reduction."""

    px: jax.Array  # [N, M] candidate x (world frame)
    py: jax.Array  # [N, M]
    pz: jax.Array  # [N, M]
    valid: jax.Array  # [N, M]
    src: jax.Array  # [N, 3] source points in candidate-row order
    src_mask: jax.Array  # [N]


def _use_pallas_select(n: int, gcap: int) -> bool:
    """The fused Pallas kernel needs the TPU backend and TQ-aligned shapes;
    everything else uses the XLA fallback (CPU tests, odd capacities)."""
    if n % pallas_select.TQ or gcap % pallas_select.TQ:
        return False
    return jax.default_backend() not in ("cpu",)


def gather_candidates(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m,
    inv_voxel_size,
    m_cand: int,
    stencil: str = "nearby26",
    num_probes: int = 8,
    group_capacity: int | None = None,
) -> CandSet:
    """One stencil gather -> M nearest candidates per transformed source
    point (the shared expensive stage of all KdTree-replacing matchers).

    Block-map path (the default): voxel-sort the transformed points, gather
    the 8-block cover per unique voxel (block_map.gather_cover), then the
    fused Pallas spread+distance+select kernel. Results stay in sorted
    order. Legacy voxel-hash maps use the per-voxel stencil gather."""
    p_t = transform_points(t_mat, src)
    if not isinstance(m, voxel_hash.VoxelHashMap):
        # block-structured maps (hashed BlockMap or dense GridMap): shared
        # fused-select path, cover gather dispatched by type
        n = src.shape[0]
        tq = pallas_select.TQ
        gcap = group_capacity or n
        gcap = -(-gcap // tq) * tq
        g = group_by_voxel(p_t, src_mask, inv_voxel_size)
        rep_tgt = jnp.where(
            (g.rank == 0) & (g.group_id < gcap), g.group_id, gcap)
        uniq = jnp.zeros((gcap, 3), jnp.int32).at[rep_tgt].set(
            g.group_coords, mode="drop")
        wnd = block_map.gather_cover_any(m, uniq, num_probes)
        gid = jnp.minimum(g.group_id, gcap - 1)
        sel = (pallas_select.fused_select if _use_pallas_select(n, gcap)
               else pallas_select.fused_select_xla)
        d2, px, py, pz = sel(wnd, gid, g.sorted_pts, m_cand, m.plane,
                             stencil=stencil, qvox=g.group_coords)
        valid = (
            (d2 < 1e18)
            & g.sorted_mask[:, None]
            & (g.group_id < gcap)[:, None]
        )
        zero = jnp.zeros((), src.dtype)
        px, py, pz = (jnp.where(valid, v, zero) for v in (px, py, pz))
        return CandSet(px=px, py=py, pz=pz, valid=valid,
                       src=src[g.order], src_mask=g.sorted_mask)

    nbrs, _d2, ok = voxel_hash.query_knn(
        m, p_t, inv_voxel_size, k=m_cand, stencil=stencil,
        num_probes=num_probes, group_capacity=group_capacity,
    )
    valid = ok & src_mask[:, None]
    return CandSet(
        px=nbrs[..., 0], py=nbrs[..., 1], pz=nbrs[..., 2],
        valid=valid, src=src, src_mask=src_mask,
    )


def query_knn_any(m, queries, inv_voxel_size, k, stencil, num_probes,
                  group_capacity=None):
    """Type-dispatched stencil k-NN (block/grid map or legacy voxel hash);
    block_map.query_knn serves GridMap too via gather_cover_any."""
    mod = voxel_hash if isinstance(m, voxel_hash.VoxelHashMap) else block_map
    return mod.query_knn(m, queries, inv_voxel_size, k=k, stencil=stencil,
                         num_probes=num_probes, group_capacity=group_capacity)


def _take_lanes(x: jax.Array, idx: jax.Array) -> jax.Array:
    """[N, M] values + [N, k] lane indices -> [N, k], via one-hot masked sums
    (take_along_axis lane gathers cost ~25x more on TPU)."""
    m = x.shape[1]
    oh = idx[..., None] == jnp.arange(m, dtype=idx.dtype)  # [N, k, M]
    return jnp.sum(jnp.where(oh, x[:, None, :], 0), axis=-1)


def _select_knn(t_mat: jax.Array, cand: CandSet, k: int):
    """Re-select the k nearest cached candidates at the CURRENT pose.
    Returns (p_t [N,3], nbrs [N,k,3], d2 [N,k], ok [N,k])."""
    p_t = transform_points(t_mat, cand.src)
    d2 = (
        (cand.px - p_t[:, 0:1]) ** 2
        + (cand.py - p_t[:, 1:2]) ** 2
        + (cand.pz - p_t[:, 2:3]) ** 2
    )
    d2 = jnp.where(cand.valid, d2, jnp.inf)
    if k == 1:
        idx = jnp.argmin(d2, axis=1)[:, None]
        kd2 = jnp.take_along_axis(d2, idx, axis=1)
    else:
        neg, idx = jax.lax.top_k(-d2, k)
        kd2 = -neg
    nbrs = jnp.stack(
        [_take_lanes(cand.px, idx), _take_lanes(cand.py, idx),
         _take_lanes(cand.pz, idx)], axis=-1)
    return p_t, nbrs, kd2, jnp.isfinite(kd2)


def point_to_point_hg_cand(
    t_mat: jax.Array, cand: CandSet, max_corr_dist_sq
) -> HG:
    """ICP linearization on the candidate cache: exact NN re-selection at the
    current pose (icp_optimized.h:78-116 per-iteration search semantics,
    restricted to the cached M-candidate set)."""
    _, nbrs, d2, ok = _select_knn(t_mat, cand, 1)
    corr = P2PCorr(q=nbrs[:, 0], valid=ok[:, 0] & (d2[:, 0] <= max_corr_dist_sq))
    return point_to_point_hg_corr(t_mat, cand.src, corr)


def point_to_plane_hg_cand(
    t_mat: jax.Array, cand: CandSet, plane_thresh, max_search_dist_sq
) -> HG:
    """Point-to-plane on the candidate cache: 5-NN re-selection + plane
    re-fit + all gates evaluated at the CURRENT pose
    (loam_point_to_plane_kdtree.h:204-272 per-iteration semantics)."""
    p_t, nbrs, d2, ok = _select_knn(t_mat, cand, 5)
    ok = ok & (d2 <= max_search_dist_sq)
    normal, q0, fit_ok = fit_plane_5nn(nbrs, ok, plane_thresh)
    d = jnp.einsum("na,na->n", p_t - q0, normal)
    src_norm = jnp.linalg.norm(cand.src, axis=-1)
    near_reject = src_norm < 81.0 * d * d
    corr = PlaneCorr(normal=normal, q0=q0, valid=fit_ok & ~near_reject)
    return point_to_plane_hg_corr(t_mat, cand.src, corr)


def point_to_line_hg_cand(
    t_mat: jax.Array, cand: CandSet, line_ratio_thresh, max_search_dist_sq
) -> HG:
    """Point-to-line on the candidate cache: 5-NN re-selection + covariance
    line re-fit at the CURRENT pose (loam_full_kdtree.h:211-273)."""
    p_t, nbrs, d2, ok = _select_knn(t_mat, cand, 5)
    all_ok = jnp.all(ok & (d2 <= max_search_dist_sq), axis=-1)
    w = ok.astype(cand.src.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    center = jnp.sum(nbrs * w, axis=1) / cnt
    centered = (nbrs - center[:, None, :]) * w
    cov = jnp.einsum("nka,nkb->nab", centered, centered) / 5.0
    lams = sym3_eigvalsh(cov)
    line_ok = lams[:, 2] > line_ratio_thresh * lams[:, 1]
    n_dir = sym3_principal_eigvec(cov)
    corr = LineCorr(center=center, n_dir=n_dir, valid=all_ok & line_ok)
    return point_to_line_hg_corr(t_mat, cand.src, corr)


class P2PCorr(NamedTuple):
    q: jax.Array  # [N, 3] matched map point
    valid: jax.Array  # [N]


def point_to_point_corr(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: voxel_hash.VoxelHashMap,
    inv_voxel_size,
    max_corr_dist_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
    group_capacity: int | None = None,
) -> P2PCorr:
    """Optimized-ICP correspondence search (icp_optimized.h:78-94):
    nearest map point within max distance."""
    p_t = transform_points(t_mat, src)
    nbrs, d2, ok = query_knn_any(
        m, p_t, inv_voxel_size, 1, stencil, num_probes, group_capacity,
    )
    valid = src_mask & ok[:, 0] & (d2[:, 0] <= max_corr_dist_sq)
    return P2PCorr(q=nbrs[:, 0], valid=valid)


def point_to_point_hg_corr(t_mat: jax.Array, src: jax.Array, corr: P2PCorr) -> HG:
    """Optimized-ICP linearization (icp_optimized.h:95-116).

    r = (R p + t) - q,  J = [ I | -R hat(p) ]   (dx ordering [t, r]).
    """
    r_mat = t_mat[:3, :3]
    p_t = transform_points(t_mat, src)
    err = p_t - corr.q  # [N, 3]
    jac = jnp.zeros(src.shape[:1] + (3, 6), src.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), jac[..., :3].shape)
    jac = jac.at[..., :3].set(eye)
    jac = jac.at[..., 3:].set(-jnp.einsum("ij,njk->nik", r_mat, so3_hat(src)))

    lam = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), err.shape + (3,))
    hg = _reduce_vec3(jac, err, lam, corr.valid)
    # reference accumulates |r| (norm), not mahalanobis, for ICP stats
    w = corr.valid.astype(src.dtype)
    return hg._replace(total_res=jnp.sum(jnp.linalg.norm(err, axis=-1) * w))


def point_to_point_hg(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: voxel_hash.VoxelHashMap,
    inv_voxel_size,
    max_corr_dist_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
) -> HG:
    """One-shot gather + linearize (reference per-iteration semantics)."""
    corr = point_to_point_corr(
        t_mat, src, src_mask, m, inv_voxel_size, max_corr_dist_sq, stencil,
        num_probes,
    )
    return point_to_point_hg_corr(t_mat, src, corr)


def fit_plane_5nn(nbrs: jax.Array, ok: jax.Array, plane_thresh):
    """Closed-form plane fit through k neighbors, solving A x = -1.

    (loam_point_to_plane_kdtree.h:223-259) Returns (unit normal [N,3],
    d0 = first neighbor [N,3], valid [N]). Validity: all k residuals
    |a_i.x + 1|/|x| <= plane_thresh.
    """
    dtype = nbrs.dtype
    k = nbrs.shape[1]
    w = ok.astype(dtype)[..., None]
    a = nbrs * w  # masked rows contribute zero
    ata = jnp.einsum("nka,nkb->nab", a, a)
    atb = -jnp.sum(a, axis=1)  # A^T * (-1)
    # regularize: masked/degenerate systems must not produce NaN
    coef = jnp.einsum("nab,nb->na", inv3(ata + 1e-9 * jnp.eye(3, dtype=dtype)), atb)
    norm = jnp.linalg.norm(coef, axis=-1)
    safe = jnp.maximum(norm, 1e-12)
    resid = jnp.abs(jnp.einsum("nka,na->nk", nbrs, coef) + 1.0) / safe[:, None]
    fit_ok = jnp.all(jnp.where(ok, resid <= plane_thresh, False), axis=-1)
    fit_ok = fit_ok & jnp.all(ok, axis=-1)
    normal = coef / safe[:, None]
    return normal, nbrs[:, 0], fit_ok


class PlaneCorr(NamedTuple):
    normal: jax.Array  # [N, 3] unit plane normal
    q0: jax.Array  # [N, 3] plane anchor point
    valid: jax.Array  # [N]


def point_to_plane_corr(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: voxel_hash.VoxelHashMap,
    inv_voxel_size,
    plane_thresh,
    max_search_dist_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
    group_capacity: int | None = None,
) -> PlaneCorr:
    """5-NN plane fit + gates (loam_point_to_plane_kdtree.h:204-259): the
    5th-NN distance gate, the plane-fit residual gate, and the near-point
    rejection ||p|| < 81 d^2 (evaluated at the gather pose; frozen between
    re-gathers)."""
    p_t = transform_points(t_mat, src)
    nbrs, d2, ok = query_knn_any(
        m, p_t, inv_voxel_size, 5, stencil, num_probes, group_capacity,
    )
    # reference gates on the 5th NN distance (loam_*_kdtree.h dist[4])
    ok = ok & (d2 <= max_search_dist_sq)
    normal, q0, fit_ok = fit_plane_5nn(nbrs, ok, plane_thresh)
    d = jnp.einsum("na,na->n", p_t - q0, normal)
    src_norm = jnp.linalg.norm(src, axis=-1)
    near_reject = src_norm < 81.0 * d * d
    valid = src_mask & fit_ok & ~near_reject
    return PlaneCorr(normal=normal, q0=q0, valid=valid)


def point_to_plane_hg_corr(t_mat: jax.Array, src: jax.Array, corr: PlaneCorr) -> HG:
    """Point-to-plane linearization (loam_point_to_plane_kdtree.h:260-272):
    residual |d| with d = (p_t - q0).n;
    J = [sign(d) (-hat(R p)^T n) | sign(d) n] (dx = [r, t])."""
    r_mat = t_mat[:3, :3]
    p_t = transform_points(t_mat, src)
    d = jnp.einsum("na,na->n", p_t - corr.q0, corr.normal)
    sign = jnp.where(d > 0, 1.0, -1.0).astype(src.dtype)
    rp = src @ r_mat.T  # R p (no translation)
    j_rot = -jnp.einsum(
        "nij,nj->ni", jnp.swapaxes(so3_hat(rp), -1, -2), corr.normal
    ) * sign[:, None]
    j_tr = corr.normal * sign[:, None]
    jac = jnp.concatenate([j_rot, j_tr], axis=-1)  # [N, 6]
    return _reduce_scalar(jac, jnp.abs(d), corr.valid)


def point_to_plane_hg(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: voxel_hash.VoxelHashMap,
    inv_voxel_size,
    plane_thresh,
    max_search_dist_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
) -> HG:
    """One-shot gather + linearize (reference per-iteration semantics)."""
    corr = point_to_plane_corr(
        t_mat, src, src_mask, m, inv_voxel_size, plane_thresh,
        max_search_dist_sq, stencil, num_probes,
    )
    return point_to_plane_hg_corr(t_mat, src, corr)


class LineCorr(NamedTuple):
    center: jax.Array  # [N, 3] 5-NN centroid
    n_dir: jax.Array  # [N, 3] line direction (principal eigenvector)
    valid: jax.Array  # [N]


def point_to_line_corr(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: voxel_hash.VoxelHashMap,
    inv_voxel_size,
    line_ratio_thresh,
    max_search_dist_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
    group_capacity: int | None = None,
) -> LineCorr:
    """5-NN covariance line fit (loam_full_kdtree.h:211-260): line direction
    = principal eigenvector, valid when sigma0 > ratio * sigma1."""
    p_t = transform_points(t_mat, src)
    nbrs, d2, ok = query_knn_any(
        m, p_t, inv_voxel_size, 5, stencil, num_probes, group_capacity,
    )
    all_ok = jnp.all(ok & (d2 <= max_search_dist_sq), axis=-1)

    w = ok.astype(src.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    center = jnp.sum(nbrs * w, axis=1) / cnt
    centered = (nbrs - center[:, None, :]) * w
    cov = jnp.einsum("nka,nkb->nab", centered, centered) / 5.0

    # eigen gate: the reference compares SVD singular values of the 3x3
    # covariance (sigma_0 > thresh * sigma_1), which equal its eigenvalues
    lams = sym3_eigvalsh(cov)
    line_ok = lams[:, 2] > line_ratio_thresh * lams[:, 1]
    n_dir = sym3_principal_eigvec(cov)
    valid = src_mask & all_ok & line_ok
    return LineCorr(center=center, n_dir=n_dir, valid=valid)


def point_to_line_hg_corr(t_mat: jax.Array, src: jax.Array, corr: LineCorr) -> HG:
    """Point-to-line linearization (loam_full_kdtree.h:261-273):
    residual |(p_t - c) x n|; J = [ (hat(n) hat(R p))^T u | -hat(n)^T u ]
    with u the unit residual direction (dx = [r, t])."""
    r_mat = t_mat[:3, :3]
    p_t = transform_points(t_mat, src)
    diff = p_t - corr.center
    cx = jnp.cross(diff, corr.n_dir)
    dist = jnp.linalg.norm(cx, axis=-1)
    safe = jnp.maximum(dist, 1e-9)
    u = cx / safe[:, None]
    valid = corr.valid & (dist > 1e-9)

    rp = src @ r_mat.T
    n_hat = so3_hat(corr.n_dir)
    j_rot = jnp.einsum("nji,nj->ni", n_hat @ so3_hat(rp), u)  # (hat(n) hat(Rp))^T u
    j_tr = jnp.einsum("nji,nj->ni", -n_hat, u)  # (-hat(n))^T u
    jac = jnp.concatenate([j_rot, j_tr], axis=-1)
    return _reduce_scalar(jac, dist, valid)


def point_to_line_hg(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: voxel_hash.VoxelHashMap,
    inv_voxel_size,
    line_ratio_thresh,
    max_search_dist_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
) -> HG:
    """One-shot gather + linearize (reference per-iteration semantics)."""
    corr = point_to_line_corr(
        t_mat, src, src_mask, m, inv_voxel_size, line_ratio_thresh,
        max_search_dist_sq, stencil, num_probes,
    )
    return point_to_line_hg_corr(t_mat, src, corr)


class NdtCorr(NamedTuple):
    mu: jax.Array  # [N, 7, 3] voxel means
    lam: jax.Array  # [N, 7, 3, 3] voxel information matrices
    valid: jax.Array  # [N, 7]


def ndt_corr(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: ndt.NdtMap,
    inv_voxel_size,
    outlier_thresh,
) -> NdtCorr:
    """7-voxel stencil Gaussian lookup + outlier gate evaluated at the
    gather pose (incremental_ndt.h:252-266)."""
    p_t = transform_points(t_mat, src)
    mu, lam, valid_v = ndt.query_stencil(m, p_t, inv_voxel_size)  # [N,7,...]
    err = p_t[:, None, :] - mu
    res = jnp.einsum("nva,nvab,nvb->nv", err, lam, err)
    valid = valid_v & src_mask[:, None] & (res <= outlier_thresh) & jnp.isfinite(res)
    # Sanitize: an under-populated slot's info can be inf/NaN from inverting
    # a degenerate covariance; it is gated invalid above, but NaN * 0 = NaN
    # would still poison the masked H reduction (_reduce_vec3), NaN-ing the
    # solve and diverging the whole GN (observed on the 45 m sim scene).
    lam = jnp.where(valid[..., None, None] & jnp.isfinite(lam), lam, 0.0)
    mu = jnp.where(valid[..., None], mu, p_t[:, None, :])
    return NdtCorr(mu=mu, lam=lam, valid=valid)


def ndt_hg_corr(t_mat: jax.Array, src: jax.Array, corr: NdtCorr) -> HG:
    """NDT Mahalanobis linearization (incremental_ndt.h:267-304):
    e = p_t - mu per stencil voxel; J = [-R hat(p) | I] (dx = [r, t])."""
    r_mat = t_mat[:3, :3]
    p_t = transform_points(t_mat, src)
    err = p_t[:, None, :] - corr.mu  # [N, 7, 3]

    jac = jnp.zeros(src.shape[:1] + (3, 6), src.dtype)
    jac = jac.at[..., :3].set(-jnp.einsum("ij,njk->nik", r_mat, so3_hat(src)))
    jac = jac.at[..., 3:].set(jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), jac[..., 3:].shape))

    n, v = err.shape[0], err.shape[1]
    jac7 = jnp.broadcast_to(jac[:, None], (n, v, 3, 6)).reshape(n * v, 3, 6)
    return _reduce_vec3(
        jac7, err.reshape(n * v, 3), corr.lam.reshape(n * v, 3, 3),
        corr.valid.reshape(n * v),
    )


def ndt_hg(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m: ndt.NdtMap,
    inv_voxel_size,
    outlier_thresh,
) -> HG:
    """One-shot gather + linearize (reference per-iteration semantics)."""
    corr = ndt_corr(t_mat, src, src_mask, m, inv_voxel_size, outlier_thresh)
    return ndt_hg_corr(t_mat, src, corr)


def merge_hg(*hgs: HG) -> HG:
    h = sum(x.h for x in hgs)
    g = sum(x.g for x in hgs)
    nv = sum(x.num_valid for x in hgs)
    tr = sum(x.total_res for x in hgs)
    return HG(h, g, nv, tr)


def fitness_score(
    t_mat: jax.Array,
    src: jax.Array,
    src_mask: jax.Array,
    m,
    inv_voxel_size,
    max_range_sq,
    stencil: str = "nearby26",
    num_probes: int = 8,
) -> jax.Array:
    """Mean squared NN distance of inlier correspondences
    (RegistrationInterface::GetFitnessScore, e.g. icp_optimized.h:195-221).

    Note the reference accumulates *squared* kdtree distances; same here.
    """
    p_t = transform_points(t_mat, src)
    _, d2, ok = query_knn_any(m, p_t, inv_voxel_size, 1, stencil, num_probes)
    good = src_mask & ok[:, 0] & (d2[:, 0] <= max_range_sq)
    n = jnp.sum(good, dtype=jnp.int32)
    s = jnp.sum(jnp.where(good, d2[:, 0], 0.0))
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.inf)
