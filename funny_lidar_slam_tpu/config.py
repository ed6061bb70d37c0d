"""YAML configuration system, schema-compatible with the reference.

The reference loads YAML through roslaunch into a ROS param server and a
process-wide `ConfigParameters` singleton (System::InitConfigParameters,
src/slam/system.cpp:118-248; fields include/slam/config_parameters.h:27-116).
Here the SAME YAML schema (sensor_topic / slam_mode / lidar / imu / gravity /
calibration / frontend / system / loopclosure sections) is parsed directly
into the framework's typed configs, so reference config presets port 1:1.
A `tpu:` section (absent in reference files) carries the static capacities
the padded-tensor design needs; everything has defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import yaml

from .backend.loop_closure import LoopClosureConfig
from .fusion.tight import TightFusionConfig
from .lidar.model import LidarModel, make_lidar_model
from .pipeline.frontend import FrontendConfig
from .pipeline.system import SystemConfig
from .registration import matchers

MODE_MAPPING = 1
MODE_LOCALIZATION = 2


@dataclass
class TpuCapacities:
    """Static shape capacities (padded-tensor design, SURVEY.md §7)."""

    scan_capacity: int = 16384
    source_capacity: int = 16384
    cloud_capacity: int = 16384
    merged_capacity: int = 131072
    map_capacity: int = 131072
    bucket_size: int = 8
    imu_segment_capacity: int = 64
    corner_capacity: int = 4096
    planar_capacity: int = 16384
    local_map_capacity: int = 262144


@dataclass
class SlamConfig:
    """Full parsed configuration tree."""

    slam_mode: int = MODE_MAPPING
    lidar_topic: str = ""
    imu_topic: str = ""
    lidar_model: LidarModel | None = None
    lidar_point_jump_span: int = 1
    lidar_point_time_scale: float = 1.0
    lidar_use_min_distance: float = 1.0
    lidar_use_max_distance: float = 1000.0
    system: SystemConfig | None = None
    caps: TpuCapacities = field(default_factory=TpuCapacities)
    raw: dict = field(default_factory=dict)
    # localization extras (config/localization/*.yaml + localization.h)
    map_path: str | None = None
    tile_map_dir: str | None = None


def _get(d: dict, key: str, default):
    v = d.get(key, default)
    return default if v is None else v


def _build_matcher_config(mode: str, reg: dict, feat: dict, caps: TpuCapacities,
                          is_localization: bool):
    iters = int(_get(reg, "optimization_iter_num", 30))
    pos_eps = float(_get(reg, "position_converge_thres", 0.01))
    rot_eps = float(_get(reg, "rotation_converge_thres", 0.05))
    kf_d = float(_get(reg, "keyframe_delta_distance", 1.0))
    kf_r = float(_get(reg, "keyframe_delta_rotation", 0.2))

    if mode == "IcpOptimized":
        return matchers.IcpConfig(
            max_iterations=iters,
            local_map_size=max(int(_get(reg, "local_map_size", 25)), 1),
            map_filter_size=float(_get(reg, "local_map_cloud_filter_size", 0.5)),
            source_filter_size=float(_get(reg, "source_cloud_filter_size", 0.4)),
            max_correspond_distance=float(_get(reg, "point_search_thres", 1.0)),
            position_converge_thresh=pos_eps, rotation_converge_thresh=rot_eps,
            dist_thresh_add_cloud=kf_d, rot_thresh_add_cloud=kf_r,
            # the window ring buffer stores the downsampled source cloud, so
            # its per-cloud capacity must match the source capacity
            source_capacity=caps.source_capacity, cloud_capacity=caps.source_capacity,
            merged_capacity=caps.merged_capacity, map_capacity=caps.map_capacity,
            bucket_size=caps.bucket_size, is_localization_mode=is_localization,
        )
    if mode in ("PointToPlane_KdTree", "PointToPlane_IVOX"):
        return matchers.PointToPlaneConfig(
            mode="window" if mode == "PointToPlane_KdTree" else "ivox",
            max_iterations=iters,
            point_to_planar_thresh=float(_get(reg, "point_to_planar_thres", 0.1)),
            position_converge_thresh=pos_eps, rotation_converge_thresh=rot_eps,
            dist_thresh_add_cloud=kf_d, rot_thresh_add_cloud=kf_r,
            local_map_size=max(int(_get(reg, "local_planar_map_size",
                                        _get(reg, "local_map_size", 30))), 1),
            map_filter_size=float(_get(reg, "local_planar_voxel_filter_size", 0.5)),
            source_capacity=caps.planar_capacity, cloud_capacity=caps.planar_capacity,
            merged_capacity=caps.merged_capacity, map_capacity=caps.map_capacity,
            bucket_size=caps.bucket_size, is_localization_mode=is_localization,
        )
    if mode == "LoamFull_KdTree":
        return matchers.LoamFullConfig(
            max_iterations=iters,
            point_to_planar_thresh=float(_get(reg, "point_to_planar_thres", 0.1)),
            point_search_thresh=float(_get(reg, "point_search_thres", 1.0)),
            line_ratio_thresh=float(_get(reg, "line_ratio_thres", 3.0)),
            position_converge_thresh=pos_eps, rotation_converge_thresh=rot_eps,
            dist_thresh_add_cloud=kf_d, rot_thresh_add_cloud=kf_r,
            corner_map_size=max(int(_get(reg, "local_corner_map_size", 30)), 1),
            planar_map_size=max(int(_get(reg, "local_planar_map_size", 30)), 1),
            corner_filter_size=float(_get(reg, "local_corner_voxel_filter_size", 0.2)),
            planar_filter_size=float(_get(reg, "local_planar_voxel_filter_size", 0.4)),
            corner_capacity=caps.corner_capacity, planar_capacity=caps.planar_capacity,
            merged_capacity=caps.merged_capacity, map_capacity=caps.map_capacity,
            bucket_size=caps.bucket_size, is_localization_mode=is_localization,
        )
    if mode == "IncrementalNDT":
        return matchers.NdtConfig(
            voxel_size=float(_get(reg, "ndt_voxel_size", 1.0)),
            res_outlier_thresh=float(_get(reg, "ndt_outlier_threshold", 5.0)),
            source_filter_size=float(_get(reg, "source_cloud_filter_size", 1.0)),
            position_converge_thresh=pos_eps, rotation_converge_thresh=rot_eps,
            min_points_in_voxel=int(_get(reg, "ndt_min_points_in_voxel", 3)),
            max_points_in_voxel=int(_get(reg, "ndt_max_points_in_voxel", 50)),
            min_effective_pts=int(_get(reg, "ndt_min_effective_pts", 10)),
            max_iterations=iters,
            source_capacity=caps.source_capacity,
            map_capacity=caps.map_capacity, is_localization_mode=is_localization,
        )
    raise ValueError(f"unknown registration_and_searcher_mode: {mode}")


def parse_config(doc: dict) -> SlamConfig:
    """Parse a loaded YAML document (reference schema) into SlamConfig."""
    lidar = _get(doc, "lidar", {})
    imu = _get(doc, "imu", {})
    fe = _get(doc, "frontend", {})
    reg = _get(fe, "registration", {})
    feat = _get(fe, "feature", {})
    sysd = _get(doc, "system", {})
    lc = _get(doc, "loopclosure", {})
    calib = _get(doc, "calibration", {})
    topics = _get(doc, "sensor_topic", {})
    tpu = _get(doc, "tpu", {})
    loc = _get(doc, "localization", {})

    caps = TpuCapacities(**{k: int(v) for k, v in tpu.items()
                            if k in TpuCapacities.__dataclass_fields__})
    slam_mode = int(_get(doc, "slam_mode", MODE_MAPPING))
    is_localization = slam_mode == MODE_LOCALIZATION

    lidar_type = str(_get(lidar, "lidar_sensor_type", "None"))
    model_overrides = {}
    # both our names (radians) and the reference's config keys (degrees,
    # converted like System::InitLidarModel, system.cpp:105-112; h_res
    # derived from the horizon scan count) for the "None" model
    for src_key, dst_key in (("lidar_vertical_scan_num", "vertical_scan_num"),
                             ("lidar_scan", "vertical_scan_num"),
                             ("lidar_horizon_scan_num", "horizon_scan_num"),
                             ("lidar_horizon_scan", "horizon_scan_num"),
                             ("lidar_vertical_resolution", "v_res"),
                             ("lidar_horizontal_resolution", "h_res"),
                             ("lidar_lower_angle", "lower_angle")):
        if src_key in lidar:
            model_overrides[dst_key] = lidar[src_key]
    if "lidar_vertical_resolution" in lidar:
        model_overrides["v_res"] = float(np.radians(lidar["lidar_vertical_resolution"]))
    if "lidar_lower_angle" in lidar:
        model_overrides["lower_angle"] = float(np.radians(lidar["lidar_lower_angle"]))
    if "lidar_horizon_scan" in lidar and "lidar_horizontal_resolution" not in lidar:
        model_overrides["h_res"] = float(np.radians(360.0 / float(lidar["lidar_horizon_scan"])))
    lidar_model = make_lidar_model(lidar_type, **model_overrides)

    t_l2i = np.asarray(_get(calib, "lidar_to_imu",
                            np.eye(4).ravel().tolist()), np.float64).reshape(4, 4)

    mode = str(_get(fe, "registration_and_searcher_mode", "IcpOptimized"))
    mcfg = _build_matcher_config(mode, reg, feat, caps, is_localization)

    fusion = TightFusionConfig(
        iterations=int(_get(fe, "fusion_opti_iters", 20)),
        lidar_rotation_std=float(_get(lidar, "lidar_rotation_noise_std", 0.005)),
        lidar_position_std=float(_get(lidar, "lidar_position_noise_std", 0.01)),
        gyro_rw_std=float(_get(imu, "gyro_rw_noise_std", 1e-4)),
        acc_rw_std=float(_get(imu, "acc_rw_noise_std", 1e-4)),
    )

    geometry = None
    if mode in ("LoamFull_KdTree", "PointToPlane_IVOX", "PointToPlane_KdTree") and \
            lidar_model.vertical_scan_num > 0:
        geometry = lidar_model.to_geometry(
            min_distance=float(_get(lidar, "lidar_use_min_distance", 1.0)),
            max_distance=float(_get(lidar, "lidar_use_max_distance", 1000.0)),
        )

    frontend_cfg = FrontendConfig(
        fusion_method=str(_get(fe, "fusion_method", "TightCouplingOptimization")),
        gravity=(0.0, 0.0, -float(_get(doc, "gravity", 9.81))),
        t_lidar_to_imu=t_l2i,
        gyro_noise_std=float(_get(imu, "gyro_noise_std", 0.01)),
        acc_noise_std=float(_get(imu, "acc_noise_std", 0.1)),
        fusion=fusion,
        lidar_geometry=geometry,
        planar_voxel_filter_size=float(_get(feat, "planar_voxel_filter_size", 0.5)),
    )

    lc_cfg = LoopClosureConfig(
        skip_near_loopclosure=int(_get(lc, "skip_near_loopclosure_threshold", 100)),
        skip_near_keyframe=int(_get(lc, "skip_near_keyframe_threshold", 100)),
        near_neighbor_distance=float(_get(lc, "near_neighbor_distance_threshold", 10.0)),
        candidate_left=int(_get(lc, "candidate_local_map_left_range", 20)),
        candidate_right=int(_get(lc, "candidate_local_map_right_range", 20)),
        current_left=int(_get(lc, "loopclosure_local_map_left_range", 30)),
        fitness_threshold=float(_get(lc, "registration_converge_threshold", 1.5)),
    )

    system_cfg = SystemConfig(
        registration_mode=mode,
        matcher_config=mcfg,
        frontend=frontend_cfg,
        keyframe_delta_dist=float(_get(sysd, "keyframe_delta_distance", 1.0)),
        keyframe_delta_rotation=float(_get(sysd, "keyframe_delta_rotation", 0.2)),
        scan_capacity=caps.scan_capacity,
        imu_segment_capacity=caps.imu_segment_capacity,
        imu_has_orientation=bool(_get(imu, "has_orientation", False)),
        imu_buffer_size=int(_get(imu, "data_searcher_buffer_size", 2000)),
        gravity_norm=float(_get(doc, "gravity", 9.81)),
        enable_loopclosure=bool(_get(sysd, "enable_loopclosure", False)),
        loopclosure=lc_cfg,
    )

    return SlamConfig(
        slam_mode=slam_mode,
        lidar_topic=str(_get(topics, "lidar_topic", "")),
        imu_topic=str(_get(topics, "imu_topic", "")),
        lidar_model=lidar_model,
        lidar_point_jump_span=int(_get(lidar, "lidar_point_jump_span", 1)),
        lidar_point_time_scale=float(_get(lidar, "lidar_point_time_scale", 1.0)),
        lidar_use_min_distance=float(_get(lidar, "lidar_use_min_distance", 1.0)),
        lidar_use_max_distance=float(_get(lidar, "lidar_use_max_distance", 1000.0)),
        system=system_cfg,
        caps=caps,
        raw=doc,
        map_path=_get(loc, "map_path", None),
        tile_map_dir=_get(loc, "tile_map_dir", None),
    )


def load_config(path: str) -> SlamConfig:
    with open(path) as f:
        return parse_config(yaml.safe_load(f))


def make_localization_config(cfg: SlamConfig):
    """Derive a LocalizationConfig from a parsed (slam_mode=2) tree."""
    from .localization import LocalizationConfig

    loc = _get(cfg.raw, "localization", {})
    return LocalizationConfig(
        registration_mode=cfg.system.registration_mode,
        matcher_config=cfg.system.matcher_config,
        frontend=cfg.system.frontend,
        map_path=cfg.map_path,
        tile_map_dir=cfg.tile_map_dir,
        map_filter_size=float(_get(loc, "map_filter_size", 0.3)),
        local_map_size=float(_get(loc, "local_map_size", 200.0)),
        local_map_boundary=float(_get(loc, "local_map_boundary", 50.0)),
        local_map_capacity=cfg.caps.local_map_capacity,
        init_fitness=float(_get(loc, "init_fitness", 1.0)),
        init_fitness_range=float(_get(loc, "init_fitness_range", 2.0)),
        scan_capacity=cfg.caps.scan_capacity,
        imu_segment_capacity=cfg.caps.imu_segment_capacity,
        imu_has_orientation=cfg.system.imu_has_orientation,
        imu_buffer_size=cfg.system.imu_buffer_size,
        gravity_norm=cfg.system.gravity_norm,
    )
