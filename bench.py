"""Benchmark: steady-state scan-match throughput of the fused frontend step
on the real TPU, across ALL FIVE registration modes, on the synthetic
dataset (no public bags ship in this image).

Baseline semantics (BASELINE.md): the reference publishes no numbers, so
`vs_baseline` is measured against REFERENCE_CPU_FPS — the calibrated
estimate of the reference C++ pipeline's end-to-end frames/s on a desktop
CPU, documented in BASELINE.md ("Reference CPU throughput estimate").
The sensor itself runs at 10 Hz; `realtime_x` reports that multiple too.

Throughput is measured as steady-state MEDIAN-window fps: with the depth-1
dispatch/retire pipeline the per-frame walls overlap, so fps comes from
retire-timestamp deltas ((n-k)/(tr_n - tr_k)) over the second half of the
run (compile-dominated first frames dropped).

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

# persistent XLA compilation cache: the full 5-mode bench traces ~10 large
# programs and cold compiles via the axon tunnel can run minutes each;
# cached reruns start in seconds (must be set before jax initializes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

# Calibrated estimate of the reference's CPU throughput (BASELINE.md):
# the reference is a real-time 10 Hz system; FAST-LIO2-class iVox pipelines
# it derives from run 30-100 ms/scan on desktop CPUs for 16-32 beam scans.
# 20 fps (50 ms/scan) is the documented midpoint estimate.
REFERENCE_CPU_FPS = 20.0


def _steady_fps(slam) -> float:
    trs = [s["tr"] for s in slam.stats if "tr" in s and not s.get("init")]
    if len(trs) < 12:
        return 0.0
    half = trs[len(trs) // 2:]
    return (len(half) - 1) / (half[-1] - half[0]) if half[-1] > half[0] else 0.0


def _run_mode(ds, mode, mcfg, fe_cfg, scan_cap):
    from funny_lidar_slam_tpu.io.trajectory import ate_rmse
    from funny_lidar_slam_tpu.pipeline.system import SlamSystem, SystemConfig

    cfg = SystemConfig(
        registration_mode=mode,
        matcher_config=mcfg,
        frontend=fe_cfg,
        scan_capacity=scan_cap,
    )
    slam = SlamSystem(cfg)
    out = slam.run_dataset(ds)
    fps = _steady_fps(slam)
    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in out["times"]])
    ate = ate_rmse(out["poses"], gt, align=True) if len(out["poses"]) else float("inf")
    return {"fps": round(fps, 2), "ate_m": round(ate, 4),
            "frames": len(out["poses"])}


def main():
    import jax

    from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate
    from funny_lidar_slam_tpu.loam.projection import LidarGeometry
    from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_TIGHT_OPT
    from funny_lidar_slam_tpu.registration import matchers

    cap = 16384
    ds = simulate(SimConfig(duration=14.0, points_per_scan=cap, seed=7))
    tight = FrontendConfig(fusion_method=FUSION_TIGHT_OPT)
    geom = LidarGeometry(n_rows=16, n_cols=900,
                         horizontal_resolution=2 * np.pi / 900,
                         min_distance=1.5, max_distance=50.0)
    loam_fe = FrontendConfig(fusion_method=FUSION_TIGHT_OPT, lidar_geometry=geom)

    modes = {
        # the headline mode (BASELINE PR1 slice: Optimized-ICP + tight)
        "IcpOptimized": (matchers.IcpConfig(
            source_capacity=cap, cloud_capacity=cap, merged_capacity=65536,
            map_capacity=65536, local_map_size=20), tight),
        "PointToPlane_IVOX": (matchers.PointToPlaneConfig(
            mode="ivox", source_capacity=cap, cloud_capacity=cap,
            map_capacity=131072), loam_fe),
        "PointToPlane_KdTree": (matchers.PointToPlaneConfig(
            mode="window", source_capacity=cap, cloud_capacity=cap,
            merged_capacity=65536, map_capacity=65536), loam_fe),
        "LoamFull_KdTree": (matchers.LoamFullConfig(
            corner_capacity=4096, planar_capacity=16384,
            merged_capacity=65536, map_capacity=65536), loam_fe),
        # sim scans are sparser than 32-beam data: 2 m NDT voxels keep >=4
        # points per Gaussian (same reasoning as test_mapping_incremental_ndt)
        "IncrementalNDT": (matchers.NdtConfig(
            voxel_size=2.0, source_filter_size=0.3, min_points_in_voxel=4,
            min_effective_pts=50, res_outlier_thresh=30.0,
            source_capacity=cap, map_capacity=131072), tight),
    }

    per_mode = {}
    for mode, (mcfg, fe_cfg) in modes.items():
        try:
            per_mode[mode] = _run_mode(ds, mode, mcfg, fe_cfg, cap)
        except Exception as e:  # keep the bench JSON well-formed
            per_mode[mode] = {"fps": 0.0, "ate_m": float("inf"),
                              "error": str(e)[:200]}

    fps = per_mode["IcpOptimized"]["fps"]
    print(json.dumps({
        "metric": "scan_match_fps",
        "value": fps,
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
        "baseline_fps": REFERENCE_CPU_FPS,
        "realtime_x": round(fps / 10.0, 2),
        "ate_m": per_mode["IcpOptimized"]["ate_m"],
        "per_mode": per_mode,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
