"""Benchmark: steady-state scan-match throughput of the fused frontend step
on the real TPU, on the synthetic dataset (no public bags in this image —
BASELINE.md: the reference publishes no numbers; the sensor runs at 10 Hz, so
`vs_baseline` is reported as the real-time multiple, value / 10 frames/s).

Prints exactly ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate
    from funny_lidar_slam_tpu.io.trajectory import ate_rmse
    from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_TIGHT_OPT
    from funny_lidar_slam_tpu.pipeline.system import SlamSystem, SystemConfig
    from funny_lidar_slam_tpu.registration import matchers

    ds = simulate(SimConfig(duration=14.0, points_per_scan=16384, seed=7))

    mcfg = matchers.IcpConfig(
        source_capacity=16384, cloud_capacity=16384, merged_capacity=65536,
        map_capacity=65536, local_map_size=20,
    )
    cfg = SystemConfig(
        registration_mode="IcpOptimized",
        matcher_config=mcfg,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT),
        scan_capacity=16384,
    )
    slam = SlamSystem(cfg)
    out = slam.run_dataset(ds)

    # steady-state: drop compile-dominated first frames
    walls = [s["wall"] for s in slam.stats if not s.get("init") and s.get("converged")]
    if len(walls) < 10:
        print(json.dumps({"metric": "scan_match_fps", "value": 0.0, "unit": "frames/s",
                          "vs_baseline": 0.0, "error": "too few frames"}))
        return
    steady = sorted(walls)[: max(len(walls) // 2, 5)]  # median-ish fast half
    fps = 1.0 / float(np.mean(steady))

    gt_map = {round(t, 4): p for t, p in zip(ds.gt_times, ds.gt_poses)}
    gt = np.asarray([gt_map[round(t, 4)] for t in out["times"]])
    ate = ate_rmse(out["poses"], gt, align=True) if len(out["poses"]) else float("inf")

    print(json.dumps({
        "metric": "scan_match_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 2),  # multiple of the 10 Hz sensor rate
        "ate_m": round(ate, 4),
        "frames": len(walls),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
