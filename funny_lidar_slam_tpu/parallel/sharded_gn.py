"""Multi-chip SPMD execution of the registration hot loop.

The reference's only intra-scan parallelism is PSTL threads over point indices
with a serial H/g reduction (SURVEY.md §2.6). The TPU-native equivalent is
data parallelism over the padded point axis across a device mesh: each chip
evaluates residual+Jacobian contributions for its point shard against a
replicated map and the 6x6 normal equations are combined with an on-ICI
`psum` — the convergence check and pose update stay replicated so no host
sync occurs.

This module is the round-1 multi-chip slice; the distributed pose-graph
backend (keyframes sharded, reduce-scatter Hessian assembly) builds on the
same pattern in backend/distributed.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.lie import so3_exp
from ..maps.voxel_hash import VoxelHashMap
from ..ops.lin3 import solve6_damped
from ..registration.residuals import HG, point_to_point_hg


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_icp_step(
    mesh: Mesh,
    max_corr_dist_sq: float,
    inv_voxel_size: float,
    iters: int = 8,
    stencil: str = "nearby26",
):
    """Build a jitted multi-chip ICP step.

    Returns fn(map, points[N,3], mask[N], t0[4,4]) -> t[4,4] with the point
    axis sharded over the mesh's 'dp' axis and the map replicated.
    """
    axis = mesh.axis_names[0]

    map_spec = P()  # replicated
    pt_spec = P(axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(map_spec, pt_spec, pt_spec, map_spec),
        out_specs=map_spec,
    )
    def step(m: VoxelHashMap, pts, msk, t0):
        def body(_, t_mat):
            hg = point_to_point_hg(
                t_mat, pts, msk, m, inv_voxel_size, max_corr_dist_sq, stencil
            )
            # combine partial normal equations across chips over ICI
            h = jax.lax.psum(hg.h, axis)
            g = jax.lax.psum(hg.g, axis)
            dx = solve6_damped(h, g)
            out = t_mat
            out = out.at[:3, 3].add(dx[:3])
            out = out.at[:3, :3].set(t_mat[:3, :3] @ so3_exp(dx[3:]))
            return out

        return jax.lax.fori_loop(0, iters, body, t0)

    def run(m, points, mask, t0):
        # lay out inputs: map replicated, points sharded along N
        m = jax.device_put(m, NamedSharding(mesh, map_spec))
        points = jax.device_put(points, NamedSharding(mesh, P(axis)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
        t0 = jax.device_put(t0, NamedSharding(mesh, map_spec))
        return jax.jit(step)(m, points, mask, t0)

    return run
