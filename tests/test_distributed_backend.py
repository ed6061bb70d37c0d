"""Distributed pose-graph backend on the virtual 8-device CPU mesh: the
edge-sharded block-sparse PCG solve must reproduce the single-chip dense
optimize result and scale to >=1k-keyframe graphs (SURVEY.md §2.6/§5.8 and
north-star config 5: the multi-chip component the reference lacks)."""

import numpy as np
import jax
import pytest

from funny_lidar_slam_tpu.backend import pose_graph
from funny_lidar_slam_tpu.backend.distributed import make_mesh, sharded_optimize
from funny_lidar_slam_tpu.io.simulator import noisy_circle_graph as _noisy_circle_graph


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
    # the 1000-pose odometry chain needs CG depth to propagate corrections
    # end to end (block-Jacobi preconditioning is local); the early-exit
    # while_loop makes unused iterations free once converged
    out = sharded_optimize(mesh, b.to_device(), iterations=15,
                           cg_iterations=512)
    est = np.asarray(out.poses)[: b.n_vertices]
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    # drift before optimization grows like sqrt(n)*0.03 ~ 1 m (measured
    # init maxerr 2.7 m); optimized poses must be pulled back near ground
    # truth by the loop edges (measured 0.14 m with this budget)
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
