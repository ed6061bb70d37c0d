"""Distributed pose-graph backend on the virtual 8-device CPU mesh: the
edge-sharded psum assembly must reproduce the single-chip optimize result
(SURVEY.md §2.6: the multi-chip component the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funny_lidar_slam_tpu.backend import pose_graph
from funny_lidar_slam_tpu.backend.distributed import make_mesh, sharded_optimize


def _noisy_circle_graph(n=40, seed=0, k_cap=64, e_cap=128):
    """Synthetic noisy circle + one loop edge (the reference's
    loopclosure_optimization_ut.cpp simulation pattern)."""
    rng = np.random.default_rng(seed)
    b = pose_graph.PoseGraphBuilder(k_cap, e_cap)
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.eye(4, dtype=np.float32)
        c, s = np.cos(a), np.sin(a)
        t[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        t[:3, 3] = [10 * c, 10 * s, 0.0]
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
    # loop edge last->first (ground-truth relative pose)
    loop_meas = np.linalg.inv(gt[n - 1]) @ gt[0]
    b.add_edge(n - 1, 0, loop_meas, (1e2,) * 3 + (1e4,) * 3)
    return b, np.asarray(gt)


def test_sharded_matches_single_chip():
    b, gt = _noisy_circle_graph()
    g = b.to_device()
    ref = pose_graph.optimize(g, iterations=10)
    mesh = make_mesh(jax.devices()[:8])
    out = sharded_optimize(mesh, g, iterations=10)
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(ref.poses), atol=1e-4
    )


def test_sharded_recovers_circle():
    b, gt = _noisy_circle_graph()
    mesh = make_mesh(jax.devices()[:8])
    out = sharded_optimize(mesh, b.to_device(), iterations=15)
    est = np.asarray(out.poses)[: b.n_vertices]
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert err.max() < 0.15, f"max position error {err.max():.3f}"


def test_edge_capacity_must_divide():
    b, _ = _noisy_circle_graph(e_cap=126)
    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(AssertionError):
        sharded_optimize(mesh, b.to_device(), iterations=1)
