"""Distributed pose-graph optimization over a device mesh.

The reference's backend is a single-threaded g2o LM solve over the whole
keyframe graph (LoopClosureOptimizer::Optimize, src/slam/system.cpp:709) —
nothing is distributed. This module is the multi-chip component SURVEY.md
§2.6/§5.8 calls for: the padded edge list is sharded across the mesh axis,
each chip assembles the normal-equation contribution of its edge shard
(dense [6K, 6K] block scatter), and the full Hessian/gradient are combined
with an ICI all-reduce (`psum`) inside `shard_map`. The damped Cholesky
solve and the left-multiplicative SE(3) update run replicated so no
per-iteration host sync occurs.

Scaling note: compute per chip is O(E/P) for residuals/Jacobians and the
communication is one [6K,6K] all-reduce per GN iteration — the same pattern
(reduce-scatter in XLA's lowering) used for the distributed Hessian assembly
in the north-star config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.lie import se3_exp, se3_inv
from .pose_graph import PoseGraph, _edge_residuals

AXIS = "edges"


def make_mesh(devices) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def _partial_normal_equations(g: PoseGraph, poses):
    """Dense H/b contribution of this device's edge shard (same math as the
    single-chip optimize, backend/pose_graph.py)."""
    k = poses.shape[0]
    dtype = poses.dtype
    gg = g._replace(poses=poses)
    e, j_i, j_j = _edge_residuals(gg)
    w = gg.edge_mask.astype(dtype)
    lam = gg.edge_info * w[:, None]

    jtl_i = jnp.swapaxes(j_i, -1, -2) * lam[:, None, :]
    jtl_j = jnp.swapaxes(j_j, -1, -2) * lam[:, None, :]
    h = jnp.zeros((k, k, 6, 6), dtype)
    h = h.at[gg.edge_i, gg.edge_i].add(jtl_i @ j_i)
    h = h.at[gg.edge_i, gg.edge_j].add(jtl_i @ j_j)
    h = h.at[gg.edge_j, gg.edge_i].add(jtl_j @ j_i)
    h = h.at[gg.edge_j, gg.edge_j].add(jtl_j @ j_j)
    b = jnp.zeros((k, 6), dtype)
    b = b.at[gg.edge_i].add(jnp.einsum("eab,eb->ea", jtl_i, e))
    b = b.at[gg.edge_j].add(jnp.einsum("eab,eb->ea", jtl_j, e))
    return (
        jnp.transpose(h, (0, 2, 1, 3)).reshape(k * 6, k * 6),
        b.reshape(k * 6),
    )


def sharded_optimize(mesh: Mesh, g: PoseGraph, iterations: int = 15,
                     damping: float = 1e-6) -> PoseGraph:
    """GN over the pose graph with edges sharded over `mesh`.

    Edge capacity must divide the mesh size (pad the builder capacities
    accordingly). Returns the graph with optimized poses (replicated).
    """
    n_dev = mesh.devices.size
    e_cap = g.edge_i.shape[0]
    assert e_cap % n_dev == 0, f"edge capacity {e_cap} not divisible by mesh size {n_dev}"
    k = g.poses.shape[0]
    dtype = g.poses.dtype

    edge_spec = P(AXIS)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            rep,  # poses
            rep,  # pose_mask
            edge_spec, edge_spec,  # edge_i, edge_j
            edge_spec,  # edge_meas
            edge_spec,  # edge_info
            edge_spec,  # edge_mask
        ),
        out_specs=rep,
    )
    def run(poses, pose_mask, edge_i, edge_j, edge_meas, edge_info, edge_mask):
        g_local = PoseGraph(poses, pose_mask, edge_i, edge_j, edge_meas,
                            edge_info, edge_mask)

        def gn_iter(_, poses):
            h_part, b_part = _partial_normal_equations(g_local, poses)
            # ICI all-reduce: combine per-shard normal equations
            h = jax.lax.psum(h_part, AXIS)
            b = jax.lax.psum(b_part, AXIS)

            free = pose_mask.at[0].set(False)
            d = jnp.repeat(free.astype(dtype), 6)
            h = h * d[:, None] * d[None, :] + jnp.diag(1.0 - d)
            b = b * d
            scale = jnp.maximum(jnp.trace(h) / (k * 6), 1.0)
            dx = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(
                    h + damping * scale * jnp.eye(k * 6, dtype=dtype)
                ),
                -b,
            ).reshape(k, 6)
            upd = se3_exp(dx)
            return jnp.where(free[:, None, None], upd @ poses, poses)

        return jax.lax.fori_loop(0, iterations, gn_iter, poses)

    sharded = NamedSharding(mesh, edge_spec)
    replicated = NamedSharding(mesh, rep)
    args = (
        jax.device_put(g.poses, replicated),
        jax.device_put(g.pose_mask, replicated),
        jax.device_put(g.edge_i, sharded),
        jax.device_put(g.edge_j, sharded),
        jax.device_put(g.edge_meas, sharded),
        jax.device_put(g.edge_info, sharded),
        jax.device_put(g.edge_mask, sharded),
    )
    poses = jax.jit(run)(*args)
    return g._replace(poses=poses)
