"""Distributed pose-graph backend on the virtual 8-device CPU mesh: the
edge-sharded block-sparse PCG solve must reproduce the single-chip dense
optimize result and scale to >=1k-keyframe graphs (SURVEY.md §2.6/§5.8 and
north-star config 5: the multi-chip component the reference lacks)."""

import numpy as np
import jax
import pytest

from funny_lidar_slam_tpu.backend import pose_graph
from funny_lidar_slam_tpu.backend.distributed import make_mesh, sharded_optimize


def _noisy_circle_graph(n=40, seed=0, k_cap=64, e_cap=128, radius=10.0,
                        extra_loops=1):
    """Synthetic noisy circle + loop edges (the reference's
    loopclosure_optimization_ut.cpp simulation pattern)."""
    rng = np.random.default_rng(seed)
    b = pose_graph.PoseGraphBuilder(k_cap, e_cap)
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.eye(4, dtype=np.float32)
        c, s = np.cos(a), np.sin(a)
        t[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        t[:3, 3] = [radius * c, radius * s, 0.0]
        gt.append(t)
    # odometry chain with noise
    noisy = [gt[0]]
    for i in range(1, n):
        meas = np.linalg.inv(gt[i - 1]) @ gt[i]
        pert = np.eye(4, dtype=np.float32)
        pert[:3, 3] = rng.normal(0, 0.03, 3)
        noisy.append(noisy[-1] @ meas @ pert)
    b.add_vertex(noisy[0])
    for i in range(1, n):
        meas = np.linalg.inv(gt[i - 1]) @ gt[i]
        b.poses[i] = noisy[i]
        b.pose_mask[i] = True
        b.n_vertices += 1
        b.add_edge(i - 1, i, meas, (1e2,) * 3 + (1e4,) * 3)
    # loop edges spaced around the circle (ground-truth relative poses)
    for l in range(extra_loops):
        i = (l * n // max(extra_loops, 1)) % n
        j = (i + n // 2) % n
        if abs(i - j) < 2:
            continue
        loop_meas = np.linalg.inv(gt[i]) @ gt[j]
        b.add_edge(i, j, loop_meas, (1e2,) * 3 + (1e4,) * 3)
    loop_meas = np.linalg.inv(gt[n - 1]) @ gt[0]
    b.add_edge(n - 1, 0, loop_meas, (1e2,) * 3 + (1e4,) * 3)
    return b, np.asarray(gt)


def test_sharded_matches_single_chip():
    """Both solvers must land at the same optimum (dense Cholesky vs
    block-sparse PCG take different paths; compare the converged poses)."""
    b, gt = _noisy_circle_graph()
    g = b.to_device()
    ref = pose_graph.optimize(g, iterations=15)
    mesh = make_mesh(jax.devices()[:8])
    out = sharded_optimize(mesh, g, iterations=15)
    np.testing.assert_allclose(
        np.asarray(out.poses)[: b.n_vertices, :3, 3],
        np.asarray(ref.poses)[: b.n_vertices, :3, 3],
        atol=2e-3,
    )


def test_sharded_recovers_circle():
    b, gt = _noisy_circle_graph()
    mesh = make_mesh(jax.devices()[:8])
    out = sharded_optimize(mesh, b.to_device(), iterations=15)
    est = np.asarray(out.poses)[: b.n_vertices]
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert err.max() < 0.15, f"max position error {err.max():.3f}"


def test_sharded_1k_keyframes():
    """North-star scale check: >=1000 keyframes, >=1500 edges, solved on the
    8-device mesh with block-sparse PCG (the dense [6K,6K] equivalent would
    be a 37 M-entry Hessian; here only per-edge blocks exist)."""
    b, gt = _noisy_circle_graph(n=1000, k_cap=1024, e_cap=2048,
                                radius=150.0, extra_loops=600)
    assert b.n_edges >= 1500
    mesh = make_mesh(jax.devices()[:8])
    out = sharded_optimize(mesh, b.to_device(), iterations=10)
    est = np.asarray(out.poses)[: b.n_vertices]
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    # drift before optimization grows like sqrt(n)*0.03 ~ 1 m; optimized
    # poses must be pulled back near ground truth by the loop edges
    assert err.max() < 0.25, f"max position error {err.max():.3f}"


def test_edge_capacity_must_divide():
    b, _ = _noisy_circle_graph(e_cap=126)
    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(AssertionError):
        sharded_optimize(mesh, b.to_device(), iterations=1)


def test_builder_grows_past_capacity():
    """No hard capacity assert: the builder doubles storage (VERDICT r1 #5)."""
    b = pose_graph.PoseGraphBuilder(k_cap=4, e_cap=4)
    for i in range(20):
        b.add_vertex(np.eye(4))
    assert b.n_vertices == 20 and b.k_cap >= 20
    assert b.n_edges == 19 and b.e_cap >= 19
    g = b.to_device()
    out = pose_graph.optimize(g, iterations=2)
    assert np.isfinite(np.asarray(out.poses)).all()
