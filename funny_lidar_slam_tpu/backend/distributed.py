"""Distributed pose-graph optimization over a device mesh.

The reference's backend is a single-threaded g2o LM solve over the whole
keyframe graph (LoopClosureOptimizer::Optimize, src/slam/system.cpp:709,
g2o wrapper at src/optimization/g2o/loopclosure_optimizer.cpp:7-16) —
nothing is distributed. This module is the multi-chip component SURVEY.md
§2.6/§5.8 and the north-star config 5 call for, designed TPU-first:

  * the EDGE set (the heavy data: measurements, information, and the
    per-edge 6x6 Jacobian blocks) is sharded over the mesh axis; each chip
    evaluates residuals/Jacobians for its own edges only — compute O(E/P);
  * the Hessian is NEVER materialized densely. It exists as block-sparse
    pieces: per-keyframe 6x6 diagonal blocks and per-edge off-diagonal
    blocks that stay resident on the shard that owns the edge;
  * the Newton system is solved with block-Jacobi-preconditioned CG:
      - the diagonal blocks are combined with an ICI reduce-scatter
        (`psum_scatter`) so each chip OWNS and inverts the preconditioner
        blocks of its keyframe range (keyframes sharded),
      - each CG matvec = local per-edge block products + one `psum` of the
        [K, 6] vector (K*24 bytes — rides ICI, microseconds),
      - the preconditioner blocks are Jacobi-equilibrated, inverted on the
        owner, and replicated with a scatter + `psum`.
    Per-iteration communication is O(K*6) instead of the O((6K)^2) a dense
    all-reduce would ship: at K = 4096 that is 100 KB vs 2.4 GB.
  * keyframe POSES are replicated on purpose: 4x4 f32 x K is 64 KB at
    K = 1000 — cheaper to all-reduce than to halo-exchange, and the SE(3)
    update is elementwise.

Gauge freedom is handled like the reference (vertex 0 fixed,
loopclosure_optimizer.cpp AddVertex) by masking its update rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.lie import se3_exp
from .pose_graph import PoseGraph, _edge_residuals

AXIS = "graph"


def make_mesh(devices) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def _edge_blocks(g: PoseGraph, poses):
    """Per-edge H blocks and b contributions for this device's edge shard."""
    dtype = poses.dtype
    gg = g._replace(poses=poses)
    e, j_i, j_j = _edge_residuals(gg)
    w = gg.edge_mask.astype(dtype)
    lam = gg.edge_info * w[:, None]
    jtl_i = jnp.swapaxes(j_i, -1, -2) * lam[:, None, :]  # [E, 6, 6]
    jtl_j = jnp.swapaxes(j_j, -1, -2) * lam[:, None, :]
    h_ii = jtl_i @ j_i
    h_ij = jtl_i @ j_j
    h_jj = jtl_j @ j_j
    # h_ji = h_ij^T (H symmetric); never materialized separately
    b_i = jnp.einsum("eab,eb->ea", jtl_i, e)
    b_j = jnp.einsum("eab,eb->ea", jtl_j, e)
    return h_ii, h_ij, h_jj, b_i, b_j


def _solve_pcg(matvec, precond, b, iterations: int, rtol: float = 1e-6):
    """Conjugate gradients on H dx = b with a block preconditioner.

    Early exit on relative residual (device-side `while_loop` — no host
    sync); dot products are plain sums — callers running under shard_map
    keep x/r/p replicated so no psum of scalars is needed beyond the matvec
    itself.
    """
    dtype = b.dtype
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0).astype(dtype)
    rr0 = jnp.vdot(r0, r0).astype(dtype)

    def cond(carry):
        i, x, r, p, rz, rr = carry
        return (i < iterations) & (rr > rtol * rtol * rr0)

    def body(carry):
        i, x, r, p, rz, rr = carry
        hp = matvec(p)
        denom = jnp.vdot(p, hp).astype(dtype)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0).astype(dtype)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.vdot(r, z).astype(dtype)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0).astype(dtype)
        p = z + beta * p
        return i + 1, x, r, p, rz_new, jnp.vdot(r, r).astype(dtype)

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, p0, rz0, rr0)
    )
    return x


def sharded_optimize(
    mesh: Mesh,
    g: PoseGraph,
    iterations: int = 15,
    damping: float = 1e-6,
    cg_iterations: int = 64,
) -> PoseGraph:
    """Block-sparse Gauss-Newton/PCG over the pose graph, edges sharded.

    Edge capacity must divide the mesh size; keyframe capacity must divide
    it too (the preconditioner blocks are keyframe-sharded). Returns the
    graph with optimized poses (replicated).
    """
    n_dev = mesh.devices.size
    e_cap = g.edge_i.shape[0]
    k = g.poses.shape[0]
    assert e_cap % n_dev == 0, f"edge capacity {e_cap} % mesh {n_dev} != 0"
    assert k % n_dev == 0, f"vertex capacity {k} % mesh {n_dev} != 0"
    dtype = g.poses.dtype

    edge_spec = P(AXIS)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, edge_spec, edge_spec, edge_spec, edge_spec, edge_spec),
        out_specs=rep,
    )
    def run(poses, pose_mask, edge_i, edge_j, edge_meas, edge_info, edge_mask):
        g_local = PoseGraph(poses, pose_mask, edge_i, edge_j, edge_meas,
                            edge_info, edge_mask)
        free = pose_mask.at[0].set(False)  # vertex 0 fixed (gauge)
        fmask = free.astype(dtype)[:, None]  # [K, 1]

        def gn_iter(_, poses):
            h_ii, h_ij, h_jj, b_i, b_j = _edge_blocks(g_local, poses)

            # gradient: local scatter + one [K,6] psum
            b = jnp.zeros((k, 6), dtype)
            b = b.at[edge_i].add(b_i).at[edge_j].add(b_j)
            b = jax.lax.psum(b, AXIS)
            b = -b * fmask

            # block-diagonal of H: local scatter, reduce-scatter to the
            # keyframe owner (keyframes sharded over the same axis)
            hdiag = jnp.zeros((k, 6, 6), dtype)
            hdiag = hdiag.at[edge_i].add(h_ii).at[edge_j].add(h_jj)
            hdiag_own = jax.lax.psum_scatter(
                hdiag, AXIS, scatter_dimension=0, tiled=True
            )  # [K/P, 6, 6]

            # Jacobi equilibration (see pose_graph.optimize: f32 has no
            # headroom for O(info * r^2) lever-arm entries; D H D with
            # D = diag(H)^-1/2 is the identical GN step, well conditioned).
            # d is computed on the owner shard; ownership is converted back
            # to replication with a scatter + psum (psum is the vma-checked
            # varying->invariant collective; all_gather stays varying).
            kp = k // jax.lax.axis_size(AXIS)
            row0 = jax.lax.axis_index(AXIS) * kp
            d_own = jax.lax.rsqrt(jnp.maximum(
                jnp.diagonal(hdiag_own, axis1=-2, axis2=-1), 1e-12))
            d = jax.lax.psum(jax.lax.dynamic_update_slice(
                jnp.zeros((k, 6), dtype), d_own, (row0, jnp.int32(0))), AXIS)  # [K, 6]
            d = jnp.where(fmask > 0, d, 1.0)

            # equilibrate the local edge blocks and the gradient
            di, dj_ = d[edge_i], d[edge_j]
            h_ii_s = di[:, :, None] * h_ii * di[:, None, :]
            h_ij_s = di[:, :, None] * h_ij * dj_[:, None, :]
            h_jj_s = dj_[:, :, None] * h_jj * dj_[:, None, :]
            b_s = b * d

            # preconditioner: equilibrated diag blocks (unit diagonal),
            # damped + inverted on the owner, then replicated via psum
            hdiag_s = d_own[:, :, None] * hdiag_own * d_own[:, None, :]
            eye6 = jnp.eye(6, dtype=dtype)
            m_own = jnp.linalg.inv(hdiag_s + damping * eye6)
            m_inv = jax.lax.psum(jax.lax.dynamic_update_slice(
                jnp.zeros((k, 6, 6), dtype), m_own, (row0, jnp.int32(0), jnp.int32(0))), AXIS)

            def matvec(x):
                # (D H D) x from the per-edge equilibrated blocks (each
                # edge's contribution counted once on the shard that owns it)
                x = x.reshape(k, 6)
                y = jnp.zeros((k, 6), dtype)
                xi = x[edge_i]
                xj = x[edge_j]
                y = y.at[edge_i].add(
                    jnp.einsum("eab,eb->ea", h_ii_s, xi)
                    + jnp.einsum("eab,eb->ea", h_ij_s, xj)
                )
                y = y.at[edge_j].add(
                    jnp.einsum("eab,eb->ea", h_jj_s, xj)
                    + jnp.einsum("eba,eb->ea", h_ij_s, xi)  # H_ji = H_ij^T
                )
                y = jax.lax.psum(y, AXIS)
                y = y + damping * x  # replicated damping term (exact)
                y = y * fmask  # gauge: fixed/unused rows pinned
                y = y + x * (1.0 - fmask)  # identity on pinned rows
                return y.reshape(-1)

            def precond(r):
                r = r.reshape(k, 6) * fmask
                z = jnp.einsum("kab,kb->ka", m_inv, r) * fmask
                return z.reshape(-1)

            y = _solve_pcg(matvec, precond, b_s.reshape(-1), cg_iterations)
            dx = d * y.reshape(k, 6) * fmask  # undo equilibration
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
