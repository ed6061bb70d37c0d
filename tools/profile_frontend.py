"""Per-stage timing of the fused frontend step on the current default device.

Answers VERDICT round-1 item 2 ("nobody knows where the 153 ms/scan goes"):
times each device stage of the IcpOptimized + tight-coupling hot path in
isolation (deskew, preintegration, KNN query, one full H/g evaluation, the
whole GN solve, window-map rebuild, fused step), plus the host-side feed
overhead. Prints a JSON table.

Usage:  python tools/profile_frontend.py  [--trace /tmp/xprof]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python tools/profile_frontend.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3, label=None):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    if label:
        print(f"  {label}: {dt*1e3:.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="write a jax profiler trace here")
    ap.add_argument("--points", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from funny_lidar_slam_tpu.core.cloud import Cloud
    from funny_lidar_slam_tpu.io.simulator import SimConfig, simulate
    from funny_lidar_slam_tpu.lidar.deskew import deskew
    from funny_lidar_slam_tpu.imu.preintegration import PreintParams, preintegrate
    from funny_lidar_slam_tpu.maps import voxel_hash
    from funny_lidar_slam_tpu.ops.voxel import voxel_downsample
    from funny_lidar_slam_tpu.pipeline.frontend import FrontendConfig, FUSION_TIGHT_OPT, Frontend
    from funny_lidar_slam_tpu.pipeline.system import (
        SlamSystem, SystemConfig, pad_scan, to_device_segment,
    )
    from funny_lidar_slam_tpu.registration import matchers
    from funny_lidar_slam_tpu.registration.gn import run_gn
    from funny_lidar_slam_tpu.registration.residuals import point_to_point_hg

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    cap = args.points
    ds = simulate(SimConfig(duration=4.5, points_per_scan=cap, seed=7))

    mcfg = matchers.IcpConfig(
        source_capacity=cap, cloud_capacity=cap, merged_capacity=65536,
        map_capacity=65536, local_map_size=20,
    )
    cfg = SystemConfig(
        registration_mode="IcpOptimized", matcher_config=mcfg,
        frontend=FrontendConfig(fusion_method=FUSION_TIGHT_OPT), scan_capacity=cap,
    )
    slam = SlamSystem(cfg)

    # warm up the pipeline on the first scans so we profile steady state
    out = slam.run_dataset(ds, max_scans=len(ds.scans) - 2)
    assert slam.fstate is not None, "pipeline did not initialize"

    scan = ds.scans[len(ds.scans) - 4]
    period = ds.scans[1].t - ds.scans[0].t
    scan_end = scan.t + period
    pts, rts, mask = pad_scan(scan.points, scan.rel_times, cap)
    rts = rts - (scan_end - scan.t)
    dseg = to_device_segment(slam.imu.get_segment(scan.t, scan_end, 32))
    pseg = to_device_segment(slam.imu.get_segment(scan.t - period, scan_end, 32))

    fe: Frontend = slam.frontend
    mstate = slam.mstate
    fstate = slam.fstate
    ref_t = jnp.asarray(scan_end, jnp.float32)

    timings = {}

    # full fused step
    timings["full_step"] = timeit(
        lambda: fe.step(mstate, fstate, pts, rts, mask, scan_end, dseg, pseg),
        label="full_step")

    # stages
    t_l2i = fe.t_l2i
    dk = jax.jit(lambda: deskew(pts, rts, mask, ref_t, dseg, t_l2i))
    timings["deskew"] = timeit(dk, label="deskew")

    params = PreintParams.from_std(0.01, 0.1, 1e-8, jnp.float32)
    pre = jax.jit(lambda: preintegrate(pseg, params, fstate.nav.bg, fstate.nav.ba))
    timings["preintegrate"] = timeit(pre, label="preintegrate")

    src = voxel_downsample(pts, mask, mcfg.source_filter_size, mcfg.source_capacity)
    timings["voxel_downsample_src"] = timeit(
        jax.jit(lambda: voxel_downsample(pts, mask, mcfg.source_filter_size, mcfg.source_capacity)),
        label="voxel_downsample_src")

    from funny_lidar_slam_tpu.registration.residuals import query_knn_any

    m = mstate.m  # BlockMap at HEAD (round-4 NN redesign)
    q = jax.jit(lambda: query_knn_any(
        m, src.points, 1.0 / mcfg.nn_voxel_size, k=1, stencil=mcfg.stencil,
        num_probes=mcfg.num_probes))
    timings["query_knn_k1_direct"] = timeit(q, label="query_knn_k1_direct")

    qg = jax.jit(lambda: query_knn_any(
        m, src.points, 1.0 / mcfg.nn_voxel_size, k=1, stencil=mcfg.stencil,
        num_probes=mcfg.num_probes, group_capacity=mcfg.group_capacity or None))
    timings["query_knn_k1_grouped"] = timeit(qg, label="query_knn_k1_grouped")

    q5 = jax.jit(lambda: query_knn_any(
        m, src.points, 1.0 / mcfg.nn_voxel_size, k=5, stencil="nearby18",
        num_probes=mcfg.num_probes))
    timings["query_knn_k5_direct"] = timeit(q5, label="query_knn_k5_direct")

    t0 = fstate.nav.pose
    hg = jax.jit(lambda: point_to_point_hg(
        t0, src.points, src.mask, m, 1.0 / mcfg.nn_voxel_size,
        mcfg.max_correspond_distance ** 2, mcfg.stencil, mcfg.num_probes))
    timings["hg_point_to_point"] = timeit(hg, label="hg_point_to_point")

    # the REAL registration path: matcher.match with the two-loop cached GN
    # + grouped gathers (map insertion cond usually not taken at this frame)
    mm = jax.jit(lambda t: slam.matcher.match(mstate, Cloud(pts, mask), t))
    _, r = mm(t0)
    timings["gn_matcher_match"] = timeit(mm, t0, label="gn_matcher_match")
    iters = int(r.iters)

    # legacy reference-semantics GN (gather every iteration, direct queries)
    gn = jax.jit(lambda: run_gn(
        lambda t: point_to_point_hg(
            t, src.points, src.mask, m, 1.0 / mcfg.nn_voxel_size,
            mcfg.max_correspond_distance ** 2, mcfg.stencil, mcfg.num_probes),
        t0, slam.matcher.gn_cfg._replace(corr_every=1)))
    timings["gn_uncached_direct"] = timeit(gn, label="gn_uncached_direct")

    # per-frame tight fusion in isolation
    from funny_lidar_slam_tpu.fusion.tight import fuse as tight_fuse
    from funny_lidar_slam_tpu.imu.preintegration import predict as preint_predict
    pre_v = pre()
    grav = jnp.asarray(cfg.frontend.gravity, jnp.float32)
    pred_v = preint_predict(pre_v, fstate.nav, grav)
    tf = jax.jit(lambda: tight_fuse(
        fstate.nav, pre_v, t0, pred_v, grav, cfg.frontend.fusion))
    timings["tight_fuse"] = timeit(tf, label="tight_fuse")

    wa = jax.jit(lambda: matchers.window_add(
        mstate, Cloud(src.points, src.mask),
        t0, mcfg.map_filter_size, 1.0 / mcfg.nn_voxel_size, mcfg.merged_capacity,
        mcfg.num_probes,
        window_size=mcfg.local_map_size if mcfg.incremental_map else 0))
    timings["window_add"] = timeit(wa, n=10, label="window_add")
    if mcfg.incremental_map:
        # the superseded full-rebuild policy, for the before/after record
        ws_full = matchers.window_create(
            mcfg.local_map_size, mcfg.cloud_capacity, mcfg.map_capacity,
            mcfg.bucket_size)
        war = jax.jit(lambda: matchers.window_add(
            ws_full, Cloud(src.points, src.mask),
            t0, mcfg.map_filter_size, 1.0 / mcfg.nn_voxel_size,
            mcfg.merged_capacity, mcfg.num_probes))
        timings["window_add_rebuild"] = timeit(war, n=10, label="window_add_rebuild")

    # host feed overhead: pad + segment fetch
    t0h = time.perf_counter()
    for _ in range(50):
        pad_scan(scan.points, scan.rel_times, cap)
        slam.imu.get_segment(scan.t, scan_end, 32)
    timings["host_prep"] = (time.perf_counter() - t0h) / 50

    # the LIVE path: packed single-transfer step (what run_dataset runs)
    buf = fe.pack_frame(scan.points, scan.rel_times - period, cap, scan_end,
                        slam.imu.get_segment(scan.t, scan_end, 32),
                        slam.imu.get_segment(scan.t - period, scan_end, 32))
    timings["step_packed_device"] = timeit(
        lambda: fe.step_packed(mstate, fstate, buf, cap, 32),
        label="step_packed_device")
    t0h = time.perf_counter()
    for _ in range(50):
        fe.pack_frame(scan.points, scan.rel_times - period, cap, scan_end,
                      slam.imu.get_segment(scan.t, scan_end, 32),
                      slam.imu.get_segment(scan.t - period, scan_end, 32))
    timings["host_pack_frame"] = (time.perf_counter() - t0h) / 50
    # one cold d2h fetch of a [36] record (the retire transfer constant)
    _, _, out_s = fe.step_packed(mstate, fstate, buf, cap, 32)
    t0h = time.perf_counter()
    for _ in range(20):
        _, _, out_s = fe.step_packed(mstate, fstate, buf, cap, 32)
        np.asarray(out_s.packed)
    timings["step_plus_retire_fetch"] = (time.perf_counter() - t0h) / 20
    # live-loop estimate from the warmup run's retire timestamps
    trs = [s["tr"] for s in slam.stats if "tr" in s and not s.get("init")]
    if len(trs) > 12:
        half = np.diff(trs[len(trs) // 2:])
        kept = half[half < 5.0]
        timings["live_frame_wall"] = kept.sum() / max(len(kept), 1)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = fe.step(mstate, fstate, pts, rts, mask, scan_end, dseg, pseg)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")

    report = {k: round(v * 1e3, 3) for k, v in sorted(timings.items(), key=lambda kv: -kv[1])}
    report["gn_gathers_at_profile"] = iters
    report["est_fps_full_step"] = round(1.0 / timings["full_step"], 2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
