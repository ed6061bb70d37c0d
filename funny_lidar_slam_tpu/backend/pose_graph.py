"""SE(3) pose-graph optimization, batched over edges.

Replaces the g2o LoopClosureOptimizer
(src/optimization/g2o/loopclosure_optimizer.cpp + EdgeRelativePose,
relative_pose_edge.cpp:12-45): vertices are keyframe poses (vertex 0 fixed,
loopclosure_optimizer.cpp AddVertex), edges carry a relative SE(3) measurement
with a 6x6 information matrix.

Residual/Jacobian (relative_pose_edge.cpp, [translation, rotation] tangent):
    e   = Log(T_m^-1 T_i^-1 T_j)
    J_i = -Jr(e)^-1 Adj(T_j^-1)
    J_j = +Jr(e)^-1 Adj(T_j^-1)

The GN normal equations are assembled with one segment-sum scatter over the
padded edge list into a dense [6K, 6K] system (K = static keyframe capacity)
and solved with a damped Cholesky — batched and jit-safe, no graph library.
For pod-scale graphs the distributed variant shards edges across chips and
reduces H with psum (backend/distributed.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import se3_adj, se3_exp, se3_inv, se3_jr, se3_log


class PoseGraph(NamedTuple):
    """Padded pose-graph state (static capacities)."""

    poses: jax.Array  # [K, 4, 4]
    pose_mask: jax.Array  # [K] bool
    edge_i: jax.Array  # [E] int32
    edge_j: jax.Array  # [E] int32
    edge_meas: jax.Array  # [E, 4, 4] T_i^-1 T_j measurement
    edge_info: jax.Array  # [E, 6] diagonal information [t, r]
    edge_mask: jax.Array  # [E] bool


def create(k_cap: int, e_cap: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        poses=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (k_cap, 4, 4)),
        pose_mask=jnp.zeros(k_cap, bool),
        edge_i=jnp.zeros(e_cap, jnp.int32),
        edge_j=jnp.zeros(e_cap, jnp.int32),
        edge_meas=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (e_cap, 4, 4)),
        edge_info=jnp.zeros((e_cap, 6), dtype),
        edge_mask=jnp.zeros(e_cap, bool),
    )


def _edge_residuals(g: PoseGraph):
    t_i = g.poses[g.edge_i]
    t_j = g.poses[g.edge_j]
    t_err = se3_inv(g.edge_meas) @ se3_inv(t_i) @ t_j
    e = se3_log(t_err)  # [E, 6]
    jr_inv = jnp.linalg.inv(se3_jr(e))
    adj = se3_adj(se3_inv(t_j))
    j_j = jr_inv @ adj  # [E, 6, 6]
    j_i = -j_j
    return e, j_i, j_j


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize(g: PoseGraph, iterations: int = 15, damping: float = 1e-6) -> PoseGraph:
    """Gauss-Newton over the whole graph; vertex 0 gated (fixed).

    (LoopClosureOptimizer::Optimize(15), called per accepted loop at
    system.cpp:709.)
    """
    k = g.poses.shape[0]
    dtype = g.poses.dtype

    def gn_iter(_, poses):
        gg = g._replace(poses=poses)
        e, j_i, j_j = _edge_residuals(gg)
        w = gg.edge_mask.astype(dtype)
        lam = gg.edge_info * w[:, None]  # [E, 6]

        # per-edge blocks of H and b
        jtl_i = jnp.swapaxes(j_i, -1, -2) * lam[:, None, :]  # J_i^T Λ
        jtl_j = jnp.swapaxes(j_j, -1, -2) * lam[:, None, :]
        h_ii = jtl_i @ j_i
        h_ij = jtl_i @ j_j
        h_ji = jtl_j @ j_i
        h_jj = jtl_j @ j_j
        b_i = jnp.einsum("eab,eb->ea", jtl_i, e)
        b_j = jnp.einsum("eab,eb->ea", jtl_j, e)

        # scatter into dense H [K,K,6,6] and b [K,6]
        h = jnp.zeros((k, k, 6, 6), dtype)
        h = h.at[gg.edge_i, gg.edge_i].add(h_ii)
        h = h.at[gg.edge_i, gg.edge_j].add(h_ij)
        h = h.at[gg.edge_j, gg.edge_i].add(h_ji)
        h = h.at[gg.edge_j, gg.edge_j].add(h_jj)
        b = jnp.zeros((k, 6), dtype)
        b = b.at[gg.edge_i].add(b_i)
        b = b.at[gg.edge_j].add(b_j)

        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(k * 6, k * 6)
        b = b.reshape(k * 6)

        # gate: vertex 0 fixed; unused vertices pinned with identity blocks
        free = gg.pose_mask.at[0].set(False)
        d = jnp.repeat(free.astype(dtype), 6)
        h = h * d[:, None] * d[None, :] + jnp.diag(1.0 - d)
        b = b * d

        # Jacobi equilibration: lever arms of O(radius) put H entries at
        # O(info * r^2); in f32 the raw Cholesky loses the GN step entirely
        # at >100 m scales (g2o solves in double — loopclosure_optimizer.cpp
        # uses LinearSolverEigen<double>; the TPU has no f64, so balance the
        # system instead: D H D y = D b with D = diag(H)^-1/2 is the same
        # step, conditioned ~r^4 better).
        dj = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(h), 1e-12))
        hs = h * dj[:, None] * dj[None, :]
        dx = dj * jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(hs + damping * jnp.eye(k * 6, dtype=dtype)),
            -(b * dj),
        )
        dx = dx.reshape(k, 6)

        # LEFT-multiplicative SE(3) update: the Adj(T_j^-1) factor in the
        # edge Jacobians corresponds to the left perturbation convention of
        # the reference's VertexPose (vertex_type.h:53-57)
        upd = se3_exp(dx)
        return jnp.where(free[:, None, None], upd @ poses, poses)

    poses = jax.lax.fori_loop(0, iterations, gn_iter, g.poses)
    return g._replace(poses=poses)


class PoseGraphBuilder:
    """Host-side incremental graph bookkeeping (System's role:
    AddVertex per keyframe + odometry edge, system.cpp:647-671; loop edges at
    system.cpp:705-707)."""

    # odometry edge information diag(1,1,1,100,100,100) [t, r]
    # (system.cpp:658: rotation weighted 100x)
    ODOM_INFO = (1.0, 1.0, 1.0, 100.0, 100.0, 100.0)

    def __init__(self, k_cap: int = 512, e_cap: int = 1024):
        import numpy as np

        self.k_cap = k_cap
        self.e_cap = e_cap
        self.poses = np.tile(np.eye(4, dtype=np.float32), (k_cap, 1, 1))
        self.pose_mask = np.zeros(k_cap, bool)
        self.edge_i = np.zeros(e_cap, np.int32)
        self.edge_j = np.zeros(e_cap, np.int32)
        self.edge_meas = np.tile(np.eye(4, dtype=np.float32), (e_cap, 1, 1))
        self.edge_info = np.zeros((e_cap, 6), np.float32)
        self.edge_mask = np.zeros(e_cap, bool)
        self.n_vertices = 0
        self.n_edges = 0

    def _grow_vertices(self) -> None:
        """Double the vertex capacity (amortized O(1); the device solve
        re-jits per capacity, so growth is geometric to bound recompiles)."""
        import numpy as np

        new_cap = self.k_cap * 2
        poses = np.tile(np.eye(4, dtype=np.float32), (new_cap, 1, 1))
        poses[: self.k_cap] = self.poses
        mask = np.zeros(new_cap, bool)
        mask[: self.k_cap] = self.pose_mask
        self.poses, self.pose_mask, self.k_cap = poses, mask, new_cap

    def _grow_edges(self) -> None:
        import numpy as np

        new_cap = self.e_cap * 2
        ei = np.zeros(new_cap, np.int32); ei[: self.e_cap] = self.edge_i
        ej = np.zeros(new_cap, np.int32); ej[: self.e_cap] = self.edge_j
        meas = np.tile(np.eye(4, dtype=np.float32), (new_cap, 1, 1))
        meas[: self.e_cap] = self.edge_meas
        info = np.zeros((new_cap, 6), np.float32); info[: self.e_cap] = self.edge_info
        msk = np.zeros(new_cap, bool); msk[: self.e_cap] = self.edge_mask
        self.edge_i, self.edge_j, self.edge_meas = ei, ej, meas
        self.edge_info, self.edge_mask, self.e_cap = info, msk, new_cap

    def add_vertex(self, pose, odom_meas=None) -> int:
        """Add a keyframe vertex + odometry edge to the previous one.

        `odom_meas` is the odometry-frame relative pose; when given after a
        loop correction, the vertex initial value is re-based on the corrected
        previous vertex (pose-graph consistency, system.cpp:647-671).
        """
        import numpy as np

        i = self.n_vertices
        if i >= self.k_cap:
            self._grow_vertices()
        if i > 0 and odom_meas is not None:
            self.poses[i] = self.poses[i - 1] @ np.asarray(odom_meas, np.float32)
        else:
            self.poses[i] = np.asarray(pose, np.float32)
        self.pose_mask[i] = True
        self.n_vertices += 1
        if i > 0:
            meas = (
                np.asarray(odom_meas, np.float32)
                if odom_meas is not None
                else np.linalg.inv(self.poses[i - 1]) @ self.poses[i]
            )
            self.add_edge(i - 1, i, meas, self.ODOM_INFO)
        return i

    def add_edge(self, i: int, j: int, meas, info) -> None:
        import numpy as np

        e = self.n_edges
        if e >= self.e_cap:
            self._grow_edges()
        self.edge_i[e] = i
        self.edge_j[e] = j
        self.edge_meas[e] = np.asarray(meas, np.float32)
        self.edge_info[e] = np.asarray(info, np.float32)
        self.edge_mask[e] = True
        self.n_edges += 1

    def to_device(self, dtype=jnp.float32) -> PoseGraph:
        return PoseGraph(
            poses=jnp.asarray(self.poses, dtype),
            pose_mask=jnp.asarray(self.pose_mask),
            edge_i=jnp.asarray(self.edge_i),
            edge_j=jnp.asarray(self.edge_j),
            edge_meas=jnp.asarray(self.edge_meas, dtype),
            edge_info=jnp.asarray(self.edge_info, dtype),
            edge_mask=jnp.asarray(self.edge_mask),
        )

    def set_poses(self, poses) -> None:
        import numpy as np

        self.poses[: self.n_vertices] = np.asarray(poses)[: self.n_vertices]

    def save_g2o(self, path: str) -> None:
        """.g2o export (LoopClosureOptimizer::Save,
        loopclosure_optimizer.cpp:62-94)."""
        import numpy as np
        from ..core.lie import mat_to_quat

        with open(path, "w") as f:
            for i in range(self.n_vertices):
                p = self.poses[i]
                q = np.asarray(mat_to_quat(jnp.asarray(p[:3, :3])))
                f.write(
                    f"VERTEX_SE3:QUAT {i} {p[0,3]} {p[1,3]} {p[2,3]} "
                    f"{q[1]} {q[2]} {q[3]} {q[0]}\n"
                )
            for e in range(self.n_edges):
                m = self.edge_meas[e]
                q = np.asarray(mat_to_quat(jnp.asarray(m[:3, :3])))
                info = np.zeros((6, 6))
                np.fill_diagonal(info, self.edge_info[e])
                upper = " ".join(str(info[r, c]) for r in range(6) for c in range(r, 6))
                f.write(
                    f"EDGE_SE3:QUAT {self.edge_i[e]} {self.edge_j[e]} "
                    f"{m[0,3]} {m[1,3]} {m[2,3]} {q[1]} {q[2]} {q[3]} {q[0]} {upper}\n"
                )
