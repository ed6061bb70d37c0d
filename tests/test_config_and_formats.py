"""Config system (reference YAML schema), LidarModel geometry, and vendor
point-format decoding (PreProcessing::ConvertMessageToCloud semantics)."""

import glob
import os

import numpy as np
import pytest

from funny_lidar_slam_tpu.config import (
    MODE_LOCALIZATION, MODE_MAPPING, load_config, make_localization_config,
)
from funny_lidar_slam_tpu.io import formats
from funny_lidar_slam_tpu.lidar.model import make_lidar_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _all_presets():
    return sorted(glob.glob(os.path.join(CONFIG_DIR, "*", "*.yaml")))


def test_presets_exist():
    # full preset parity with the reference: 12 mapping + 5 localization
    # (config/mapping/*, config/localization/*) + our extra tile-map preset
    assert len(_all_presets()) >= 18


@pytest.mark.parametrize("path", _all_presets())
def test_preset_parses_and_builds(path):
    cfg = load_config(path)
    assert cfg.slam_mode in (MODE_MAPPING, MODE_LOCALIZATION)
    assert cfg.lidar_model is not None
    assert cfg.system.registration_mode in (
        "IcpOptimized", "PointToPlane_KdTree", "PointToPlane_IVOX",
        "LoamFull_KdTree", "IncrementalNDT",
    )
    # matcher config must instantiate
    from funny_lidar_slam_tpu.pipeline.system import build_matcher

    matcher = build_matcher(cfg.system)
    assert matcher is not None
    if cfg.slam_mode == MODE_LOCALIZATION:
        lcfg = make_localization_config(cfg)
        assert lcfg.map_path or lcfg.tile_map_dir
        assert matcher.cfg.is_localization_mode


def test_turing_none_model_geometry():
    """The reference's None-model keys are degrees and h_res derives from
    the horizon scan count (System::InitLidarModel, system.cpp:105-112)."""
    cfg = load_config(os.path.join(CONFIG_DIR, "mapping", "config_turing.yaml"))
    m = cfg.lidar_model
    assert m.lidar_type == "None"
    assert m.vertical_scan_num == 16
    assert m.horizon_scan_num == 1800
    assert m.v_res == pytest.approx(np.radians(2.0))
    assert m.lower_angle == pytest.approx(np.radians(15.0))
    assert m.h_res == pytest.approx(np.radians(0.2))


def test_m2dgr_preset_values():
    cfg = load_config(os.path.join(CONFIG_DIR, "mapping", "config_M2DGR.yaml"))
    assert cfg.lidar_model.lidar_type == "Velodyne_32"
    assert cfg.system.imu_has_orientation
    assert cfg.system.enable_loopclosure
    assert cfg.system.frontend.fusion_method == "TightCouplingOptimization"
    assert cfg.system.frontend.fusion.iterations == 20
    assert cfg.lidar_point_jump_span == 6
    assert cfg.system.loopclosure.fitness_threshold == 1.5


# -- LidarModel ------------------------------------------------------------


def test_lidar_model_row_col_index():
    m = make_lidar_model("Velodyne_16")
    # elevation +15 deg -> top ring (15); -15 deg -> ring 0
    pts = np.array([
        [1.0, 0.0, np.tan(np.radians(15.0))],
        [1.0, 0.0, -np.tan(np.radians(15.0))],
        [1.0, 0.0, 0.0],
    ])
    rows = m.row_index(pts)
    # elevation 0: (0 + 15deg) / 2deg lands just under 7.5 in float -> 7
    assert rows.tolist() == [15, 0, 7]


def test_lidar_model_col_wraparound():
    m = make_lidar_model("Velodyne_16")
    # azimuth 0 -> H/2; azimuth pi -> wraps to 0
    pts = np.array([[1.0, 0.0, 0.0], [-1.0, -1e-9, 0.0], [0.0, 1.0, 0.0]])
    cols = m.col_index(pts)
    assert cols[0] == 900
    assert cols[1] in (0, 1799)
    assert cols[2] == 450 + 900


def test_lidar_model_unknown_type():
    with pytest.raises(ValueError):
        make_lidar_model("NotALidar")


def test_lidar_model_none_requires_overrides():
    m = make_lidar_model("None", vertical_scan_num=4, v_res=np.radians(2.0),
                         lower_angle=np.radians(3.0), horizon_scan_num=360,
                         h_res=np.radians(1.0))
    assert m.vertical_scan_num == 4


# -- vendor formats ----------------------------------------------------------


def _velodyne_arr(n=32, with_time=True):
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4"),
                   ("ring", "u2"), ("time", "f4")])
    arr = np.zeros(n, dt)
    ang = np.linspace(0, -2 * np.pi * 0.9, n)  # clockwise sweep
    arr["x"] = 10 * np.cos(ang)
    arr["y"] = 10 * np.sin(ang)
    arr["z"] = 0.1
    arr["intensity"] = 7.0
    arr["ring"] = np.arange(n) % 16
    arr["time"] = np.linspace(0, 0.09, n) if with_time else 0.0
    return arr


def test_convert_velodyne_with_time():
    arr = _velodyne_arr()
    s = formats.convert("Velodyne_16", arr, stamp=100.0, time_scale=1.0)
    assert s.points.shape == (32, 3)
    np.testing.assert_allclose(s.rel_times, arr["time"], atol=1e-7)
    assert s.ring.dtype == np.int32


def test_convert_velodyne_synthesizes_offsets():
    """last point time <= 0 triggers yaw-based synthesis
    (preprocessing.cpp:295-299)."""
    arr = _velodyne_arr(with_time=False)
    model = make_lidar_model("Velodyne_16")
    s = formats.convert("Velodyne_16", arr, stamp=0.0, model=model, lidar_rate=10.0)
    nz = s.rel_times[s.ring == 0]
    assert (np.diff(nz) >= 0).all()
    assert nz.max() <= 0.11  # within one 10 Hz period


def test_offset_time_wrap_unwrap():
    """Points past the start azimuth gain a full period."""
    # one ring, clockwise sweep of 1.25 revolutions
    n = 50
    ang = -np.linspace(0, 2.5 * np.pi, n)
    pts = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], 1)
    t = formats.compute_point_offset_time(pts, np.zeros(n, np.int32), 1, 10.0)
    assert (np.diff(t) >= -1e-6).all(), "offset times must be monotonic"
    assert t[-1] > 0.1  # wrapped past one period


def test_convert_robosense_stamp_rewrite():
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4"),
                   ("ring", "u2"), ("timestamp", "f8")])
    arr = np.zeros(5, dt)
    arr["x"] = 1.0
    arr["timestamp"] = 1700000000.0 + np.arange(5) * 0.01
    s = formats.convert("RoboSense_16", arr, stamp=1700000000.1)
    assert s.stamp == 1700000000.0  # first point time becomes the scan stamp
    np.testing.assert_allclose(s.rel_times, np.arange(5) * 0.01, atol=1e-6)


def test_convert_livox_avia_tag_line_filter():
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4"),
                   ("line", "u1"), ("tag", "u1"), ("time", "f8")])
    arr = np.zeros(4, dt)
    arr["x"] = 1.0
    arr["line"] = [0, 7, 0, 0]  # line 7 >= 6 dropped
    arr["tag"] = [0x00, 0x10, 0x20, 0x10]  # 0x20 dropped
    arr["time"] = [0, 1e7, 2e7, 3e7]
    s = formats.convert("Livox_Avia", arr, stamp=5.0, time_scale=1e-9)
    assert len(s.points) == 2
    np.testing.assert_allclose(s.rel_times, [0.0, 0.03], atol=1e-9)


def test_convert_none_drops_invalid_rows():
    dt = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4")])
    arr = np.zeros(3, dt)
    arr["x"] = [1.0, 1.0, 1.0]
    arr["z"] = [0.0, 10.0, np.nan]  # steep elevation -> row out of range; NaN dropped
    model = make_lidar_model("Velodyne_16")
    s = formats.convert("None", arr, stamp=0.0, model=model)
    assert len(s.points) == 1


def test_convert_drops_nan():
    arr = _velodyne_arr()
    arr["x"][3] = np.nan
    s = formats.convert("Velodyne_16", arr, stamp=0.0)
    assert len(s.points) == 31
