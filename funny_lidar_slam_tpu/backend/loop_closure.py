"""Euclidean-distance loop closure with coarse-to-fine on-device verification.

Re-design of the reference LoopClosure thread (src/slam/loop_closure.cpp):

  detection (DetectByDistance, loop_closure.cpp:113-177):
    * throttle: skip while curr_id - last_loop_id < skip_near_loopclosure
    * candidates: keyframes within `near_neighbor_distance` of the current
      keyframe, closest first, first one with index gap > skip_near_keyframe
  submaps (GetSubMap, loop_closure.cpp:179-231):
    * candidate: keyframes [cand-left, cand+right] merged in WORLD frame
    * current:  keyframes [curr-left, curr] merged in the current keyframe's
      LOCAL frame; both voxel-filtered
  verification (Match, loop_closure.cpp:233-267):
    * reference: PCL NDT at resolutions {10,5,3,2} then GICP; here: NDT
      matcher coarse-to-fine then point-to-plane ICP refine on the block
      map, with the same fitness-gated accept (< `fitness_threshold`).

The feature-based detector the reference declares but leaves empty
(DetectByFeature, loop_closure.cpp:120-122) is likewise not implemented.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..maps import block_map, ndt_map
from ..registration.gn import GNConfig, UPDATE_NDT, UPDATE_LOAM, run_gn
from ..registration.residuals import fitness_score, ndt_hg, point_to_plane_hg


@dataclass
class LoopClosureConfig:
    skip_near_loopclosure: int = 100  # loop_closure.cpp:50-56
    skip_near_keyframe: int = 100
    near_neighbor_distance: float = 10.0
    candidate_left: int = 20  # candidate submap range (loop_closure.cpp:179)
    candidate_right: int = 20
    current_left: int = 30
    fitness_threshold: float = 1.5  # config registration_converge_threshold
    fitness_max_range: float = 2.0  # GICP max correspondence (loop_closure.cpp:262)
    nn_voxel_size: float = 1.0
    submap_filter_size: float = 0.2  # loop_closure.cpp GetSubMap voxel
    submap_capacity: int = 65536
    source_capacity: int = 16384
    map_capacity: int = 131072
    bucket_size: int = 8
    ndt_resolutions: tuple = (10.0, 5.0, 3.0, 2.0)  # loop_closure.cpp:242
    refine_iterations: int = 20


@dataclass
class LoopResult:
    """(reference LoopClosureResult, loop_closure.h)"""

    current_id: int
    candidate_id: int
    delta_pose: np.ndarray  # T_cand^-1-frame relative: T_cw_cand^-1 * T_corrected_current
    fitness: float


def detect_by_distance(
    poses: np.ndarray, current_id: int, last_loop_id: int, cfg: LoopClosureConfig
) -> int | None:
    """Vectorized candidate search (DetectByDistance)."""
    if current_id - last_loop_id < cfg.skip_near_loopclosure:
        return None
    if current_id < cfg.skip_near_keyframe:
        return None
    cur = poses[current_id][:3, 3]
    d = np.linalg.norm(poses[: current_id + 1, :3, 3] - cur, axis=1)
    order = np.argsort(d)
    for idx in order:
        if d[idx] > cfg.near_neighbor_distance:
            break
        if current_id - idx > cfg.skip_near_keyframe:
            return int(idx)
    return None


def _merge_submap(frames, ids, poses, local_frame_of: int | None,
                  cfg: LoopClosureConfig, capacity: int):
    """Merge keyframe clouds over `ids`; world frame, or local to keyframe
    `local_frame_of` when given (GetSubMap semantics). Returns a PADDED
    (points [capacity, 3], mask [capacity]) pair — fixed shapes keep the
    verify cascade a single cached executable instead of a fresh compile
    per unique submap size."""
    pts = []
    inv_ref = np.linalg.inv(poses[local_frame_of]) if local_frame_of is not None else np.eye(4)
    for i in ids:
        c = frames[i].cloud
        t = inv_ref @ poses[i]
        pts.append(c @ t[:3, :3].T + t[:3, 3])
    merged = np.concatenate(pts).astype(np.float32)
    if len(merged) > capacity:
        # keep GetSubMap's pure voxel-filter semantics (loop_closure.cpp:179-231):
        # pre-filter at the submap voxel size on host until it fits (never a
        # random subsample, which would bias the NDT statistics)
        from ..native import voxel_downsample as host_voxel

        size = cfg.submap_filter_size
        while len(merged) > capacity:
            merged = host_voxel(merged, size).astype(np.float32)
            size *= 1.5
    out = np.zeros((capacity, 3), np.float32)
    msk = np.zeros(capacity, bool)
    out[: len(merged)] = merged
    msk[: len(merged)] = True
    return out, msk


def _verify_cascade(cfg: LoopClosureConfig, src_pts, src_mask, tgt_pts,
                    tgt_mask, t_init):
    """Device half of LoopClosure::Match as ONE traced program: voxel
    filters -> fine block map -> coarse-to-fine NDT -> point-to-plane
    refine -> fitness, with the stage-acceptance logic as lax selects.
    One program (AOT-disk-cached) replaces the eager swarm that cold-
    compiled for minutes on the first accepted loop of a fresh process."""
    from ..ops.voxel import voxel_downsample

    nn_inv = 1.0 / cfg.nn_voxel_size
    tgt = voxel_downsample(tgt_pts, tgt_mask, cfg.submap_filter_size,
                           cfg.submap_capacity)
    src = voxel_downsample(src_pts, src_mask, cfg.submap_filter_size,
                           cfg.source_capacity)
    mp = block_map.build(cfg.map_capacity, cfg.bucket_size, tgt.points,
                         tgt.mask, nn_inv)

    def fit_of(t):
        return fitness_score(t, src.points, src.mask, mp, nn_inv,
                             max_range_sq=cfg.fitness_max_range**2)

    # coarse-to-fine NDT; unlike the reference's open-loop cascade
    # (loop_closure.cpp:242-257), each stage result is accepted only if it
    # improves the fine fitness — a diverging coarse stage cannot destroy a
    # good odometry initial guess.
    best_t, best_fit = t_init, fit_of(t_init)
    t_est = t_init
    for res in cfg.ndt_resolutions:
        m = ndt_map.create(cfg.map_capacity)
        # one-shot dense load: spend the full probe window on claim rounds
        # (ndt_map.insert's default 3 is tuned for incremental scans)
        m = ndt_map.insert(m, tgt.points, tgt.mask, 1.0 / res, min_points=3,
                           estimate_all=True, claim_rounds=8)
        gn = GNConfig(max_iters=cfg.refine_iterations, rotation_eps=1e-3,
                      position_eps=1e-3, update=UPDATE_NDT,
                      use_stall_check=False)
        r = run_gn(
            lambda t: ndt_hg(t, src.points, src.mask, m, 1.0 / res, 30.0),
            t_est, gn)
        t_est = r.t_mat
        f = fit_of(t_est)
        better = f < best_fit
        best_t = jnp.where(better, t_est, best_t)
        best_fit = jnp.where(better, f, best_fit)

    # fine refine: point-to-plane (GICP stand-in), from the best pose so far
    gn = GNConfig(max_iters=cfg.refine_iterations, rotation_eps=1e-4,
                  position_eps=1e-4, update=UPDATE_LOAM, use_stall_check=True)
    r = run_gn(
        lambda t: point_to_plane_hg(t, src.points, src.mask, mp, nn_inv, 0.3,
                                    cfg.fitness_max_range**2),
        best_t, gn)
    f = fit_of(r.t_mat)
    better = f < best_fit
    best_t = jnp.where(better, r.t_mat, best_t)
    best_fit = jnp.where(better, f, best_fit)
    return best_t, best_fit


_CASCADE_CACHE: dict = {}


def _cascade_program(cfg: LoopClosureConfig):
    import functools

    from ..utils.aot_cache import aot_jit

    key = repr(cfg)
    prog = _CASCADE_CACHE.get(key)
    if prog is None:
        prog = aot_jit(functools.partial(_verify_cascade, cfg))
        _CASCADE_CACHE[key] = prog
    return prog


def verify_candidate(
    frames,
    poses: np.ndarray,
    current_id: int,
    candidate_id: int,
    cfg: LoopClosureConfig,
) -> LoopResult | None:
    """Coarse-to-fine registration of the current submap against the
    candidate submap (LoopClosure::Match)."""
    n = len(frames)
    cand_ids = range(max(0, candidate_id - cfg.candidate_left),
                     min(n, candidate_id + cfg.candidate_right + 1))
    curr_ids = range(max(0, current_id - cfg.current_left), current_id + 1)

    # padded world-frame target / local-frame source (fixed shapes)
    tgt_pts, tgt_mask = _merge_submap(frames, cand_ids, poses, None, cfg,
                                      cfg.submap_capacity)
    src_pts, src_mask = _merge_submap(frames, curr_ids, poses, current_id,
                                      cfg, cfg.source_capacity)

    t_init = jnp.asarray(poses[current_id], jnp.float32)
    best_t, best_fit = _cascade_program(cfg)(
        jnp.asarray(src_pts), jnp.asarray(src_mask),
        jnp.asarray(tgt_pts), jnp.asarray(tgt_mask), t_init)

    fit = float(best_fit)
    if not np.isfinite(fit) or fit >= cfg.fitness_threshold:
        return None

    t_corrected = np.asarray(best_t)
    delta = np.linalg.inv(poses[candidate_id]) @ t_corrected
    return LoopResult(
        current_id=current_id, candidate_id=candidate_id,
        delta_pose=delta, fitness=fit,
    )


class LoopCloser:
    """Host-side driver matching the reference thread's cadence: called per
    keyframe; throttles, detects, verifies."""

    def __init__(self, cfg: LoopClosureConfig = LoopClosureConfig()):
        self.cfg = cfg
        self.last_loop_id = -(cfg.skip_near_loopclosure + 1)

    def try_close(self, frames, poses: np.ndarray, current_id: int) -> LoopResult | None:
        cand = detect_by_distance(poses, current_id, self.last_loop_id, self.cfg)
        if cand is None:
            return None
        result = verify_candidate(frames, poses, current_id, cand, self.cfg)
        if result is not None:
            self.last_loop_id = current_id
        return result
