"""The five registration frontends, as functional (state, scan, pose) -> state
matchers over device-resident maps.

Runtime-selectable like the reference (src/slam/frontend.cpp:30-88):

  mode string          reference implementation          this module
  -----------          ------------------------          -----------
  IcpOptimized         icp_optimized.h                   IcpMatcher
  PointToPlane_KdTree  loam_point_to_plane_kdtree.h      PointToPlaneMatcher (window)
  PointToPlane_IVOX    loam_point_to_plane_ivox.h        PointToPlaneMatcher (ivox)
  LoamFull_KdTree      loam_full_kdtree.h                LoamFullMatcher
  IncrementalNDT       incremental_ndt.h                 NdtMatcher

Map policies:
  * window:  ring buffer of the last W inserted clouds, merged + voxel
    filtered + hash-map rebuild on insertion (the kdtree-rebuild semantics of
    icp_optimized.h:165-189 / loam_point_to_plane_kdtree.h:57-80).
  * ivox:    incremental insertion with the closer-to-center skip rule and
    age eviction (loam_point_to_plane_ivox.h:90-128).
  * ndt:     per-voxel Gaussian merge (incremental_ndt.h:182-227).

All matchers share `match()` -> GNResult + the keyframe-style insertion gate
`IsNeedAddCloud` (dist/rot vs the last inserted pose, icp_optimized.h:225-243).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cloud import Cloud, transform_cloud
from ..core.lie import rotation_to_rpy
from ..maps import block_map, grid_map, ndt_map
from ..ops.voxel import voxel_downsample
from .gn import (
    GNConfig, GNResult, UPDATE_ICP, UPDATE_LOAM, UPDATE_NDT, run_gn,
    run_gn_corr,
)
from .residuals import (
    fitness_score,
    gather_candidates,
    merge_hg,
    ndt_corr,
    ndt_hg_corr,
    point_to_line_hg_cand,
    point_to_plane_hg_cand,
    point_to_point_hg_cand,
)



def _source_radius(points, mask):
    """Max range of valid source points — the rotation-displacement radius
    for the GN trust-region skip (a fixed radius smaller than the true max
    range understates how far points move under rotation)."""
    r2 = jnp.sum(points * points, axis=-1)
    return jnp.sqrt(jnp.max(jnp.where(mask, r2, 0.0)))

def need_add_cloud(t_mat, last_t, dist_thresh, rot_thresh):
    """Map-insertion gate (icp_optimized.h:225-243): translation delta > d or
    any RPY of the delta rotation > r."""
    d = jnp.linalg.norm(t_mat[:3, 3] - last_t[:3, 3])
    r_delta = last_t[:3, :3].T @ t_mat[:3, :3]
    rpy = jnp.abs(rotation_to_rpy(r_delta))
    return (d > dist_thresh) | jnp.any(rpy > rot_thresh)


# ---------------------------------------------------------------------------
# sliding-window map policy
# ---------------------------------------------------------------------------


class WindowMapState(NamedTuple):
    m: block_map.BlockMap
    window_pts: jax.Array  # [W, cap, 3] world-frame inserted clouds
    window_mask: jax.Array  # [W, cap]
    head: jax.Array  # [] int32 ring position
    filled: jax.Array  # [] int32 number of valid ring entries
    last_added: jax.Array  # [4, 4]


def window_create(window_size, cloud_cap, map_capacity, bucket,
                  dtype=jnp.float32, incremental=False, grid_dims=None):
    # the incremental policy never re-reads the inserted clouds, so the ring
    # buffers collapse to 1-element placeholders (saves W*cap*16 bytes of HBM
    # and the per-insert ring scatter)
    w, cap = (1, 1) if incremental else (window_size, cloud_cap)
    if grid_dims is not None:
        # experimental dense modulo grid (probe-free gathers, claim-free
        # inserts — maps/grid_map.py); incremental policy only
        assert incremental, "map_layout='grid' requires incremental_map"
        m = grid_map.create(tuple(grid_dims), bucket, dtype)
    else:
        m = block_map.create(map_capacity, bucket, dtype)
    return WindowMapState(
        m=m,
        window_pts=jnp.zeros((w, cap, 3), dtype),
        window_mask=jnp.zeros((w, cap), bool),
        head=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        last_added=jnp.eye(4, dtype=dtype),
    )


def window_add(
    s: WindowMapState,
    cloud_world: Cloud,
    t_mat,
    map_filter_size,
    nn_inv_voxel,
    merged_capacity,
    num_probes: int = 8,
    window_size: int = 0,
):
    """Push a world-frame cloud into the sliding-window map.

    Rebuild policy (`window_size == 0`, the reference's exact semantics):
    merge the ring buffer of the last W clouds, voxel-filter, rebuild the
    hash from scratch — the kdtree-rebuild of icp_optimized.h:165-189.

    Incremental policy (`window_size > 0`): voxel-filter only the NEW cloud
    and scatter-insert it with `max_age=window_size` epoch eviction — voxels
    still observed within the last W insertions stay, unobserved voxels are
    purged, which is the window semantics at voxel instead of scan
    granularity. Replaces the O(window) rebuild (52 ms at 131k pts on v5e)
    with an O(scan) insert (~5 ms)."""
    if window_size > 0:
        cap = cloud_world.points.shape[0]
        ds = voxel_downsample(cloud_world.points, cloud_world.mask,
                              map_filter_size, cap)
        if isinstance(s.m, grid_map.GridMap):
            # dense grid: deterministic slots — no probes, no claim rounds
            m = grid_map.insert(s.m, ds.points, ds.mask, nn_inv_voxel,
                                max_age=window_size)
        else:
            # claim_rounds=2: incremental scans add few NEW blocks (frontier
            # only) so claim contention is negligible; each round is ~1.7 ms
            # of full-table scatter+gather (a contended block just lands on
            # the next insert)
            m = block_map.insert(s.m, ds.points, ds.mask, nn_inv_voxel,
                                 num_probes=num_probes, max_age=window_size,
                                 claim_rounds=2)
        return s._replace(m=m, last_added=t_mat,
                          filled=jnp.minimum(s.filled + 1, window_size))
    w = s.window_pts.shape[0]
    window_pts = s.window_pts.at[s.head].set(cloud_world.points)
    window_mask = s.window_mask.at[s.head].set(cloud_world.mask)
    merged_pts = window_pts.reshape(-1, 3)
    merged_mask = window_mask.reshape(-1)
    ds = voxel_downsample(merged_pts, merged_mask, map_filter_size, merged_capacity)
    # build() takes the VOXEL capacity; the live map stores blocks at
    # voxel_capacity // 2 slots (block_map.create), so reverse that here
    m = block_map.build(
        s.m.block_capacity * 2, s.m.bucket_size, ds.points, ds.mask,
        nn_inv_voxel, num_probes=num_probes,
    )
    return WindowMapState(
        m=m,
        window_pts=window_pts,
        window_mask=window_mask,
        head=(s.head + 1) % w,
        filled=jnp.minimum(s.filled + 1, w),
        last_added=t_mat,
    )


# ---------------------------------------------------------------------------
# Optimized ICP (reference: icp_optimized.h)
# ---------------------------------------------------------------------------


class IcpConfig(NamedTuple):
    max_iterations: int = 30
    local_map_size: int = 25
    map_filter_size: float = 0.5
    source_filter_size: float = 0.4
    max_correspond_distance: float = 1.0
    position_converge_thresh: float = 0.01
    rotation_converge_thresh: float = 0.05
    rot_thresh_add_cloud: float = 0.2
    dist_thresh_add_cloud: float = 1.0
    # capacities (static)
    source_capacity: int = 16384
    cloud_capacity: int = 16384
    merged_capacity: int = 131072
    map_capacity: int = 65536
    bucket_size: int = 8
    nn_voxel_size: float = 1.0
    stencil: str = "nearby26"
    num_probes: int = 8
    is_localization_mode: bool = False
    # incremental window policy: insert only the new cloud with
    # max_age=local_map_size epoch eviction instead of rebuilding the hash
    # from the merged window every insertion (window_add docstring)
    incremental_map: bool = True
    # candidate-cache GN schedule (gn.run_gn_corr + residuals.CandSet): one
    # stencil gather caches the cand_k nearest candidates per point; the
    # iterations in between re-select the exact NN among them at the current
    # pose (selection stays exact while the pose moves less than the
    # candidate margin), so the expensive gather runs ~3x per solve
    corr_every: int = 10
    cand_k: int = 16
    # voxel-deduplicated stencil gather (query_knn group path): one stencil
    # lookup per unique query voxel instead of per point (0 = direct). At
    # source_filter 0.4 / nn_voxel 1.0 a 16k scan hits ~5.6k unique voxels —
    # measured 33.6 -> 15.7 ms per k=1 query on the v5e.
    group_capacity: int = 8192
    # trust-region re-gather skip (GNConfig.skip_regather_dist): with an
    # IMU-predicted init the typical solve runs ONE stencil gather instead
    # of three. 0 disables.
    regather_skip_dist: float = 0.2
    regather_radius: float = 20.0
    # experimental dense modulo-grid layout (maps/grid_map.py): probe-free
    # gathers + claim-free inserts; requires incremental_map. grid_dims are
    # BLOCKS (2x2x2 voxels) per axis — size the extent (dims * 2 *
    # nn_voxel_size) above the local-map diameter so modulo aliasing only
    # hits far-away slots (self-filtered by the correspondence gates).
    map_layout: str = "block"  # "block" | "grid"
    grid_dims: tuple = (96, 96, 24)


class IcpMatcher:
    """Point-to-point ICP over a sliding-window voxel-hash map."""

    def __init__(self, cfg: IcpConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.gn_cfg = GNConfig(
            max_iters=cfg.max_iterations,
            rotation_eps=cfg.rotation_converge_thresh,
            position_eps=cfg.position_converge_thresh,
            update=UPDATE_ICP,
            use_stall_check=False,
            corr_every=cfg.corr_every,
            skip_regather_dist=cfg.regather_skip_dist,
            regather_radius=cfg.regather_radius,
        )

    def create_state(self) -> WindowMapState:
        c = self.cfg
        return window_create(c.local_map_size, c.cloud_capacity, c.map_capacity,
                             c.bucket_size, self.dtype,
                             incremental=c.incremental_map,
                             grid_dims=(c.grid_dims if c.map_layout == "grid"
                                        else None))

    def _source(self, cloud: Cloud) -> Cloud:
        c = self.cfg
        return voxel_downsample(cloud.points, cloud.mask, c.source_filter_size, c.source_capacity)

    def match(self, s: WindowMapState, cloud: Cloud, t_init) -> tuple[WindowMapState, GNResult]:
        t_init = jnp.asarray(t_init, self.dtype)
        c = self.cfg
        src = self._source(cloud)
        inv = 1.0 / c.nn_voxel_size

        gc = c.group_capacity or None

        def corr_fn(t_mat):
            return gather_candidates(
                t_mat, src.points, src.mask, s.m, inv, c.cand_k,
                c.stencil, c.num_probes, group_capacity=gc,
            )

        def hg_fn(t_mat, cand):
            return point_to_point_hg_cand(
                t_mat, cand, c.max_correspond_distance**2)

        res = run_gn_corr(corr_fn, hg_fn, t_init, self.gn_cfg,
                          regather_radius=_source_radius(src.points, src.mask))

        if c.is_localization_mode:
            return s, res

        do_add = res.converged & need_add_cloud(
            res.t_mat, s.last_added, c.dist_thresh_add_cloud, c.rot_thresh_add_cloud
        )

        def add(s):
            world = transform_cloud(res.t_mat, src)
            return window_add(s, world, res.t_mat, c.map_filter_size, inv,
                              c.merged_capacity, c.num_probes,
                              window_size=c.local_map_size if c.incremental_map else 0)

        s = jax.lax.cond(do_add, add, lambda s: s, s)
        return s, res

    def add_first(self, s: WindowMapState, cloud: Cloud, t_mat) -> WindowMapState:
        t_mat = jnp.asarray(t_mat, self.dtype)
        """Seed the map with the first (transformed) cloud
        (FrontEnd::InitOdometer, frontend.cpp:137-141)."""
        c = self.cfg
        src = self._source(cloud)
        world = transform_cloud(t_mat, src)
        return window_add(s, world, t_mat, c.map_filter_size, 1.0 / c.nn_voxel_size,
                          c.merged_capacity, c.num_probes,
                          window_size=c.local_map_size if c.incremental_map else 0)

    def fitness(self, s: WindowMapState, cloud: Cloud, t_mat, max_range=1.0):
        t_mat = jnp.asarray(t_mat, self.dtype)
        c = self.cfg
        src = self._source(cloud)
        return fitness_score(
            t_mat, src.points, src.mask, s.m, 1.0 / c.nn_voxel_size, max_range**2,
            c.stencil, c.num_probes,
        )

    def set_map(self, s: WindowMapState, map_cloud: Cloud) -> WindowMapState:
        """Replace the local map wholesale (localization mode:
        Localization::LoadLocalMap -> AddCloudToLocalMap with
        is_localization_mode, loam_point_to_plane_kdtree.h:56-80)."""
        c = self.cfg
        if c.map_layout == "grid":
            m = grid_map.build(
                tuple(c.grid_dims), c.bucket_size, map_cloud.points,
                map_cloud.mask, 1.0 / c.nn_voxel_size, self.dtype)
        else:
            m = block_map.build(
                c.map_capacity, c.bucket_size, map_cloud.points,
                map_cloud.mask, 1.0 / c.nn_voxel_size,
                num_probes=c.num_probes,
            )
        return s._replace(m=m)


# ---------------------------------------------------------------------------
# Point-to-plane (KdTree-window and iVox variants)
# ---------------------------------------------------------------------------


class PointToPlaneConfig(NamedTuple):
    mode: str = "ivox"  # "window" (PointToPlane_KdTree) | "ivox" (PointToPlane_IVOX)
    max_iterations: int = 30
    point_to_planar_thresh: float = 0.1
    position_converge_thresh: float = 0.01
    rotation_converge_thresh: float = 0.05
    rot_thresh_add_cloud: float = 0.2
    dist_thresh_add_cloud: float = 1.0
    local_map_size: int = 30  # window mode only
    map_filter_size: float = 0.5  # window mode only
    min_valid_planar: int = 50
    # ivox params (loam_point_to_plane_ivox.h:53-58)
    ivox_voxel_size: float = 0.5
    ivox_max_age: int = 0  # 0 = no eviction
    stencil: str = "nearby18"
    num_probes: int = 8
    max_search_dist: float = 5.0
    source_capacity: int = 16384
    cloud_capacity: int = 16384
    merged_capacity: int = 131072
    map_capacity: int = 262144
    bucket_size: int = 8
    is_localization_mode: bool = False
    corr_every: int = 10  # candidate-cache GN schedule (see IcpConfig)
    cand_k: int = 16
    # grouped stencil gather (0 = direct); at ivox_voxel 0.5 ~= the planar
    # filter size the dedup is mild, so direct is the default here
    group_capacity: int = 0
    incremental_map: bool = True  # window mode: see window_add docstring
    regather_skip_dist: float = 0.1  # trust-region skip (see IcpConfig);
    regather_radius: float = 20.0  # tighter at 0.5 m ivox voxels
    # experimental dense modulo grid (see IcpConfig.map_layout); ivox mode
    # only. dims are BLOCKS (2x2x2 voxels); at the 0.5 m ivox voxel,
    # extent = dims * 1.0 m per axis. MEASURED CAVEAT (round 5): at the
    # 0.5 m voxel a full-coverage grid needs ~1.2M slots (~0.9 GB rows)
    # and the per-insert whole-table updates cost more than the claim
    # rounds they replace — A/B scored 19 vs 24-30 fps against the hashed
    # map (accuracy slightly better, 0.0401 vs 0.042). Use the grid here
    # only when the extent fits a few hundred MB; the 1 m-voxel ICP grid
    # is where the layout wins (see IcpConfig).
    map_layout: str = "block"  # "block" | "grid"
    grid_dims: tuple = (192, 192, 32)


class P2PlaneWindowState(NamedTuple):
    w: WindowMapState


class P2PlaneIvoxState(NamedTuple):
    m: block_map.BlockMap
    last_added: jax.Array


class PointToPlaneMatcher:
    """LOAM point-to-plane over a planar-feature map.

    window mode: LoamPointToPlaneKdtree semantics (map = merged window).
    ivox mode:   LoamPointToPlaneIVOX semantics (incremental, center-policy
    insertion, inserts EVERY converged scan — no keyframe gate in the
    reference ivox matcher; the gate exists only in the kdtree variants)."""

    def __init__(self, cfg: PointToPlaneConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.gn_cfg = GNConfig(
            max_iters=cfg.max_iterations,
            rotation_eps=cfg.rotation_converge_thresh,
            position_eps=cfg.position_converge_thresh,
            update=UPDATE_LOAM,
            use_stall_check=True,
            corr_every=cfg.corr_every,
            skip_regather_dist=cfg.regather_skip_dist,
            regather_radius=cfg.regather_radius,
        )
        self.inv = 1.0 / cfg.ivox_voxel_size

    def create_state(self):
        c = self.cfg
        if c.mode == "window":
            return P2PlaneWindowState(
                window_create(c.local_map_size, c.cloud_capacity, c.map_capacity,
                              c.bucket_size, self.dtype,
                              incremental=c.incremental_map)
            )
        if c.map_layout == "grid":
            m = grid_map.create(tuple(c.grid_dims), c.bucket_size, self.dtype)
        else:
            m = block_map.create(c.map_capacity, c.bucket_size, self.dtype)
        return P2PlaneIvoxState(m=m, last_added=jnp.eye(4, dtype=self.dtype))

    def _map(self, s):
        return s.w.m if isinstance(s, P2PlaneWindowState) else s.m

    def match(self, s, planar: Cloud, t_init) -> tuple[object, GNResult]:
        t_init = jnp.asarray(t_init, self.dtype)
        c = self.cfg
        m = self._map(s)

        gc = c.group_capacity or None

        def corr_fn(t_mat):
            return gather_candidates(
                t_mat, planar.points, planar.mask, m, self.inv, c.cand_k,
                c.stencil, c.num_probes, group_capacity=gc,
            )

        def hg_fn(t_mat, cand):
            return point_to_plane_hg_cand(
                t_mat, cand, c.point_to_planar_thresh, c.max_search_dist**2)

        res = run_gn_corr(
            corr_fn, hg_fn, t_init, self.gn_cfg,
            regather_radius=_source_radius(planar.points, planar.mask))
        # convergence requires enough valid planar matches (loam_*_kdtree.h:181)
        ok = res.num_valid >= c.min_valid_planar
        res = res._replace(converged=ok)

        if c.is_localization_mode:
            return s, res

        if isinstance(s, P2PlaneWindowState):
            do_add = ok & need_add_cloud(
                res.t_mat, s.w.last_added, c.dist_thresh_add_cloud, c.rot_thresh_add_cloud
            )

            def add(ws):
                world = transform_cloud(res.t_mat, planar)
                return window_add(ws, world, res.t_mat, c.map_filter_size, self.inv,
                                  c.merged_capacity, c.num_probes,
                                  window_size=c.local_map_size if c.incremental_map else 0)

            return P2PlaneWindowState(jax.lax.cond(do_add, add, lambda x: x, s.w)), res

        # ivox: insert every scan with the center policy (claim_rounds=2:
        # see window_add — per-scan frontier contention is negligible and
        # this matcher pays the insert EVERY frame)
        def add(st):
            world = transform_cloud(res.t_mat, planar)
            if isinstance(st.m, grid_map.GridMap):
                m2 = grid_map.insert(
                    st.m, world.points, world.mask, self.inv,
                    max_age=c.ivox_max_age, center_policy=True,
                )
            else:
                m2 = block_map.insert(
                    st.m, world.points, world.mask, self.inv,
                    num_probes=c.num_probes, max_age=c.ivox_max_age,
                    center_policy=True, claim_rounds=2,
                )
            return P2PlaneIvoxState(m2, res.t_mat)

        s = jax.lax.cond(ok, add, lambda x: x, s)
        return s, res

    def add_first(self, s, planar: Cloud, t_mat):
        t_mat = jnp.asarray(t_mat, self.dtype)
        c = self.cfg
        world = transform_cloud(t_mat, planar)
        if isinstance(s, P2PlaneWindowState):
            return P2PlaneWindowState(
                window_add(s.w, world, t_mat, c.map_filter_size, self.inv,
                           c.merged_capacity, c.num_probes,
                           window_size=c.local_map_size if c.incremental_map else 0)
            )
        if isinstance(s.m, grid_map.GridMap):
            m2 = grid_map.insert(s.m, world.points, world.mask, self.inv,
                                 max_age=c.ivox_max_age, center_policy=True)
        else:
            m2 = block_map.insert(
                s.m, world.points, world.mask, self.inv,
                num_probes=c.num_probes, max_age=c.ivox_max_age,
                center_policy=True,
            )
        return P2PlaneIvoxState(m2, t_mat)

    def fitness(self, s, planar: Cloud, t_mat, max_range=1.0):
        t_mat = jnp.asarray(t_mat, self.dtype)
        return fitness_score(
            t_mat, planar.points, planar.mask, self._map(s), self.inv,
            max_range**2, self.cfg.stencil, self.cfg.num_probes,
        )

    def set_map(self, s, map_cloud: Cloud):
        """Replace the map wholesale (localization LoadLocalMap)."""
        c = self.cfg
        if isinstance(s, P2PlaneWindowState):
            m = block_map.build(
                c.map_capacity, c.bucket_size, map_cloud.points, map_cloud.mask,
                self.inv, num_probes=c.num_probes,
            )
            return P2PlaneWindowState(s.w._replace(m=m))
        if c.map_layout == "grid":
            fresh = grid_map.create(tuple(c.grid_dims), c.bucket_size,
                                    self.dtype)
            m = grid_map.insert(fresh, map_cloud.points, map_cloud.mask,
                                self.inv, center_policy=True)
        else:
            fresh = block_map.create(c.map_capacity, c.bucket_size, self.dtype)
            m = block_map.insert(
                fresh, map_cloud.points, map_cloud.mask, self.inv,
                num_probes=c.num_probes, max_age=0, center_policy=True,
            )
        return P2PlaneIvoxState(m, s.last_added)


# ---------------------------------------------------------------------------
# Full LOAM: corner (line) + planar (plane) maps (loam_full_kdtree.h)
# ---------------------------------------------------------------------------


class LoamFullConfig(NamedTuple):
    max_iterations: int = 30
    point_to_planar_thresh: float = 0.1
    point_search_thresh: float = 1.0  # 5th-NN gate (squared applied)
    line_ratio_thresh: float = 3.0
    position_converge_thresh: float = 0.01
    rotation_converge_thresh: float = 0.05
    rot_thresh_add_cloud: float = 0.2
    dist_thresh_add_cloud: float = 1.0
    corner_map_size: int = 30
    planar_map_size: int = 30
    corner_filter_size: float = 0.2
    planar_filter_size: float = 0.4
    min_valid_planar: int = 50
    nn_voxel_size: float = 1.0
    stencil: str = "nearby26"
    num_probes: int = 8
    corner_capacity: int = 4096
    planar_capacity: int = 16384
    merged_capacity: int = 131072
    map_capacity: int = 65536
    bucket_size: int = 8
    is_localization_mode: bool = False
    # candidate-cache GN schedule (see IcpConfig): exact per-iteration
    # re-selection/re-fit among cached candidates tolerates a much longer
    # refresh than the frozen-match scheme did
    corr_every: int = 8
    cand_k: int = 16
    group_capacity: int = 8192  # grouped stencil gather (0 = direct)
    incremental_map: bool = True  # see window_add docstring
    regather_skip_dist: float = 0.1  # trust-region skip (see IcpConfig)
    regather_radius: float = 20.0


class LoamFullState(NamedTuple):
    corner: WindowMapState
    planar: WindowMapState


class LoamFullMatcher:
    def __init__(self, cfg: LoamFullConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.gn_cfg = GNConfig(
            max_iters=cfg.max_iterations,
            rotation_eps=cfg.rotation_converge_thresh,
            position_eps=cfg.position_converge_thresh,
            update=UPDATE_LOAM,
            use_stall_check=True,
            corr_every=cfg.corr_every,
            skip_regather_dist=cfg.regather_skip_dist,
            regather_radius=cfg.regather_radius,
        )
        self.inv = 1.0 / cfg.nn_voxel_size

    def create_state(self) -> LoamFullState:
        c = self.cfg
        inc = c.incremental_map
        return LoamFullState(
            corner=window_create(c.corner_map_size, c.corner_capacity, c.map_capacity,
                                 c.bucket_size, self.dtype, incremental=inc),
            planar=window_create(c.planar_map_size, c.planar_capacity, c.map_capacity,
                                 c.bucket_size, self.dtype, incremental=inc),
        )

    def match(self, s: LoamFullState, corner: Cloud, planar: Cloud, t_init):
        t_init = jnp.asarray(t_init, self.dtype)
        c = self.cfg
        thr2 = c.point_search_thresh**2

        gc = c.group_capacity or None

        def corr_fn(t_mat):
            cc = gather_candidates(
                t_mat, corner.points, corner.mask, s.corner.m, self.inv,
                c.cand_k, c.stencil, c.num_probes, group_capacity=gc,
            )
            cp = gather_candidates(
                t_mat, planar.points, planar.mask, s.planar.m, self.inv,
                c.cand_k, c.stencil, c.num_probes, group_capacity=gc,
            )
            return (cc, cp)

        def hg_fn(t_mat, cand):
            cc, cp = cand
            hg_c = point_to_line_hg_cand(
                t_mat, cc, c.line_ratio_thresh, thr2)
            hg_p = point_to_plane_hg_cand(
                t_mat, cp, c.point_to_planar_thresh, thr2)
            # the reference's convergence gate counts PLANAR matches only
            # (loam_full_kdtree.h:181-183), so the merged normal equations
            # carry the planar-only count as num_valid
            return merge_hg(hg_c, hg_p)._replace(num_valid=hg_p.num_valid)

        radius = jnp.maximum(
            _source_radius(corner.points, corner.mask),
            _source_radius(planar.points, planar.mask))
        res = run_gn_corr(corr_fn, hg_fn, t_init, self.gn_cfg,
                          regather_radius=radius)
        ok = res.num_valid >= c.min_valid_planar
        res = res._replace(converged=ok)

        if c.is_localization_mode:
            return s, res

        do_add = ok & need_add_cloud(
            res.t_mat, s.planar.last_added, c.dist_thresh_add_cloud, c.rot_thresh_add_cloud
        )

        def add(st: LoamFullState):
            cw = transform_cloud(res.t_mat, corner)
            pw = transform_cloud(res.t_mat, planar)
            wc = c.corner_map_size if c.incremental_map else 0
            wp = c.planar_map_size if c.incremental_map else 0
            return LoamFullState(
                corner=window_add(st.corner, cw, res.t_mat, c.corner_filter_size,
                                  self.inv, c.merged_capacity, c.num_probes,
                                  window_size=wc),
                planar=window_add(st.planar, pw, res.t_mat, c.planar_filter_size,
                                  self.inv, c.merged_capacity, c.num_probes,
                                  window_size=wp),
            )

        s = jax.lax.cond(do_add, add, lambda x: x, s)
        return s, res

    def add_first(self, s: LoamFullState, corner: Cloud, planar: Cloud, t_mat):
        t_mat = jnp.asarray(t_mat, self.dtype)
        c = self.cfg
        cw = transform_cloud(t_mat, corner)
        pw = transform_cloud(t_mat, planar)
        wc = c.corner_map_size if c.incremental_map else 0
        wp = c.planar_map_size if c.incremental_map else 0
        return LoamFullState(
            corner=window_add(s.corner, cw, t_mat, c.corner_filter_size, self.inv,
                              c.merged_capacity, c.num_probes, window_size=wc),
            planar=window_add(s.planar, pw, t_mat, c.planar_filter_size, self.inv,
                              c.merged_capacity, c.num_probes, window_size=wp),
        )

    def fitness(self, s: LoamFullState, planar: Cloud, t_mat, max_range=1.0):
        t_mat = jnp.asarray(t_mat, self.dtype)
        return fitness_score(
            t_mat, planar.points, planar.mask, s.planar.m, self.inv,
            max_range**2, self.cfg.stencil, self.cfg.num_probes,
        )

    def set_map(self, s: LoamFullState, map_cloud: Cloud) -> LoamFullState:
        """Replace both feature maps with the (unlabelled) local map cloud —
        localization mode feeds the prebuilt map to every matcher the same way
        (Localization::LoadLocalMap)."""
        c = self.cfg
        m = block_map.build(
            c.map_capacity, c.bucket_size, map_cloud.points, map_cloud.mask,
            self.inv, num_probes=c.num_probes,
        )
        return LoamFullState(
            corner=s.corner._replace(m=m), planar=s.planar._replace(m=m)
        )


# ---------------------------------------------------------------------------
# Incremental NDT (incremental_ndt.h)
# ---------------------------------------------------------------------------


class NdtConfig(NamedTuple):
    voxel_size: float = 1.0
    res_outlier_thresh: float = 20.0
    source_filter_size: float = 1.0
    rotation_converge_thresh: float = 0.05
    position_converge_thresh: float = 0.01
    min_points_in_voxel: int = 3
    max_points_in_voxel: int = 50
    min_effective_pts: int = 10
    max_iterations: int = 30
    max_age: int = 0
    source_capacity: int = 16384
    map_capacity: int = 262144
    is_localization_mode: bool = False
    # NDT matches are voxel Gaussians: the stencil lookup changes whenever
    # p_t crosses a voxel boundary, and its frozen outlier gate measurably
    # hurts convergence (e2e ATE 0.31 -> 1.06 m at corr_every=4), so the
    # default keeps the reference's search-every-iteration semantics
    corr_every: int = 1


class NdtState(NamedTuple):
    m: ndt_map.NdtMap
    first_scan: jax.Array  # [] bool


class NdtMatcher:
    def __init__(self, cfg: NdtConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.gn_cfg = GNConfig(
            max_iters=cfg.max_iterations,
            rotation_eps=cfg.rotation_converge_thresh,
            position_eps=cfg.position_converge_thresh,
            update=UPDATE_NDT,
            use_stall_check=False,
            corr_every=cfg.corr_every,
        )
        self.inv = 1.0 / cfg.voxel_size

    def create_state(self) -> NdtState:
        return NdtState(ndt_map.create(self.cfg.map_capacity, self.dtype), jnp.asarray(True))

    def _source(self, cloud: Cloud) -> Cloud:
        c = self.cfg
        return voxel_downsample(cloud.points, cloud.mask, c.source_filter_size, c.source_capacity)

    def _insert(self, s: NdtState, world: Cloud) -> NdtState:
        c = self.cfg
        # first scan (or frozen-map localization) estimates all voxels
        # regardless of count (incremental_ndt.h:131-143, 218-226);
        # estimate_all is traced, so this is ONE insert (the round-3 code
        # computed both variants and selected — 2x the dominant map cost)
        m2 = ndt_map.insert(
            s.m, world.points, world.mask, self.inv,
            max_age=c.max_age, min_points=c.min_points_in_voxel,
            max_points=c.max_points_in_voxel, estimate_all=s.first_scan,
        )
        # in localization mode the flag stays set so frozen-map reloads always
        # re-estimate every voxel (incremental_ndt.h:218-226)
        return NdtState(m2, jnp.asarray(bool(c.is_localization_mode)))

    def match(self, s: NdtState, cloud: Cloud, t_init):
        t_init = jnp.asarray(t_init, self.dtype)
        c = self.cfg
        src = self._source(cloud)

        def corr_fn(t_mat):
            return ndt_corr(t_mat, src.points, src.mask, s.m, self.inv,
                            c.res_outlier_thresh)

        def hg_fn(t_mat, corr):
            return ndt_hg_corr(t_mat, src.points, corr)

        res = run_gn_corr(corr_fn, hg_fn, t_init, self.gn_cfg)
        # reference quirk: has_converge is forced true after the loop
        # (incremental_ndt.h:325) unless too few effective points; we keep
        # the min-effective-pts abort and otherwise report converged.
        enough = res.num_valid >= c.min_effective_pts
        res = res._replace(converged=enough)

        if c.is_localization_mode:
            return s, res

        def add(st):
            world = transform_cloud(res.t_mat, src)
            return self._insert(st, world)

        s = jax.lax.cond(enough, add, lambda x: x, s)
        return s, res

    def add_first(self, s: NdtState, cloud: Cloud, t_mat):
        t_mat = jnp.asarray(t_mat, self.dtype)
        src = self._source(cloud)
        world = transform_cloud(t_mat, src)
        return self._insert(s, world)

    def set_map(self, s: NdtState, map_cloud: Cloud) -> NdtState:
        """Replace the NDT map wholesale (localization LoadLocalMap):
        re-estimate every voxel Gaussian from the frozen local map."""
        fresh = NdtState(ndt_map.create(self.cfg.map_capacity, self.dtype),
                         jnp.asarray(True))
        return self._insert(fresh, map_cloud)

    def fitness(self, s: NdtState, cloud: Cloud, t_mat, max_range=1.0):
        """Mean distance of transformed source points to the nearest voxel
        mean (kdtree-fitness analog of RegistrationInterface::GetFitnessScore
        for the distribution map)."""
        t_mat = jnp.asarray(t_mat, self.dtype)
        src = self._source(cloud)
        world = src.points @ t_mat[:3, :3].T + t_mat[:3, 3]
        mu, _, valid = ndt_map.query_stencil(s.m, world, self.inv)
        d2 = jnp.sum((world[:, None, :] - mu) ** 2, -1)
        d2 = jnp.where(valid, d2, jnp.inf)
        dmin2 = jnp.min(d2, axis=1)
        ok = src.mask & (dmin2 <= max_range**2)
        return jnp.sum(jnp.where(ok, jnp.sqrt(dmin2), 0.0)) / jnp.maximum(
            jnp.sum(ok), 1
        )
