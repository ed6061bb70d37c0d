"""Region-sharded device map with halo exchange — the genuinely distributed
frontend (SURVEY.md §2.6 "sharding of state" / §5.8).

The reference's closest analog is host-side tile maps: 100 m XY tiles
loaded/evicted around the pose (src/slam/localization.cpp:306-365,
src/slam/split_map.cpp:22-55). Here that windowing policy becomes the shard
partitioner for a DEVICE-RESIDENT map: every chip owns the voxel blocks of
the XY tiles assigned to it (block-cyclic tile->device assignment for load
balance), plus a one-stencil-wide HALO of neighboring tiles' points so its
local stencil queries are exact at region borders.

TPU-native halo exchange: instead of point-to-point sends (the NCCL/MPI
shape), the scan batch is replicated across the mesh (a broadcast over ICI)
and each device scatter-inserts only the points inside (region ∪ halo) —
ownership is a pure function of position, so the "exchange" is a mask. The
per-iteration H/g reduction is a `psum` over ICI; the pose update and
convergence loop stay replicated, so no host sync occurs anywhere.

Memory scales down with mesh size: each device's BlockMap holds ~1/n of the
map (plus halo fraction ~ tile perimeter / area), which is what makes maps
beyond single-chip HBM reachable — the actual "long-context" axis of this
workload (SURVEY.md §5.7).

Exactness: with halo width >= the stencil reach (TWO voxel edges — see
stencil_halo), every query point evaluated by its owner device finds
exactly the candidates the replicated map would return — sharded and
replicated paths agree up to psum summation order (asserted by
dryrun_multichip and tests/test_distributed_backend). One caveat: a voxel
holding more than `bucket_size` points retains a first-inserted subset,
and the insertion ORDER differs between a per-device subset insert and a
full-map insert, so overfull voxels may retain different points — the same
nondeterminism class the reference's LRU iVox has across insertion orders
(ivox_map.cpp:122-143). Size buckets for the expected per-voxel occupancy
when bitwise parity matters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.lie import so3_exp
from ..maps import block_map
from ..ops.lin3 import solve6_damped
from ..registration.residuals import point_to_point_hg, point_to_plane_hg


class ShardedMapConfig(NamedTuple):
    tile_size: float = 8.0  # XY tile edge (the shard partition unit)
    voxel_size: float = 1.0  # NN voxel; halo width = 2*voxel (stencil_halo)
    map_capacity: int = 16384  # VOXEL capacity PER DEVICE
    bucket_size: int = 8
    num_probes: int = 8
    stencil: str = "nearby26"


def tile_owner(pts: jax.Array, tile_size: float, n_dev: int) -> jax.Array:
    """Block-cyclic XY-tile -> device assignment (pure function of position,
    so ownership needs no communication). [N, 3] -> [N] int32."""
    tx = jnp.floor(pts[..., 0] / tile_size).astype(jnp.int32)
    ty = jnp.floor(pts[..., 1] / tile_size).astype(jnp.int32)
    # mix the two coordinates so long straight trajectories still spread
    # across devices (plain tx+ty stripes would alias a diagonal path)
    h = tx * jnp.int32(73856093) ^ ty * jnp.int32(19349663)
    return jnp.abs(h) % n_dev


def in_region_or_halo(pts: jax.Array, dev: jax.Array, tile_size: float,
                      halo: float, n_dev: int) -> jax.Array:
    """True where a map point lies in device `dev`'s region OR within `halo`
    of it: relevant iff any of the 9 XY offsets within +-halo lands in a
    tile owned by `dev`. With halo < tile_size the +-halo square intersects
    at most 4 tiles and each contains one of the square's corners, so the
    9-offset sample is exact. [N, 3] -> [N] bool."""
    assert halo < tile_size, "halo sampling requires halo < tile_size"
    hit = jnp.zeros(pts.shape[:-1], bool)
    for dx in (-halo, 0.0, halo):
        for dy in (-halo, 0.0, halo):
            off = jnp.asarray([dx, dy, 0.0], pts.dtype)
            hit = hit | (tile_owner(pts + off, tile_size, n_dev) == dev)
    return hit


def stencil_halo(cfg: ShardedMapConfig) -> float:
    """Exact halo width for the voxel stencil: a query owned by a tile can
    pull candidates from voxels whose points lie up to TWO voxel edges away
    in the infinity norm (query at one edge of its voxel, candidate at the
    far edge of the +-1 neighbor voxel) — 1 voxel is NOT enough."""
    return 2.0 * cfg.voxel_size


def create_sharded(mesh: Mesh, cfg: ShardedMapConfig, dtype=jnp.float32):
    """Per-device empty BlockMaps, stacked on a leading mesh axis."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = block_map.create(cfg.map_capacity, cfg.bucket_size, dtype)
    stacked = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), m)
    return jax.device_put(
        stacked, NamedSharding(mesh, P(axis)))


def insert_sharded(mesh: Mesh, cfg: ShardedMapConfig):
    """Build the jitted halo-aware insert: fn(stacked_map, pts, mask) with
    the scan replicated (broadcast over ICI) and each device inserting only
    its (region ∪ halo) points."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    inv = 1.0 / cfg.voxel_size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P()), out_specs=P(axis),
    )
    def _ins(sm, pts, msk):
        local = jax.tree.map(lambda a: a[0], sm)
        dev = jax.lax.axis_index(axis)
        keep = msk & in_region_or_halo(pts, dev, cfg.tile_size,
                                       stencil_halo(cfg), n_dev)
        # full claim rounds: parity with the replicated build requires the
        # same no-drop guarantee block_map.build gives one-shot loads
        m2 = block_map.insert(local, pts, keep, inv,
                              num_probes=cfg.num_probes,
                              claim_rounds=cfg.num_probes)
        return jax.tree.map(lambda a: a[None], m2)

    def run(sm, pts, msk):
        pts = jax.device_put(pts, NamedSharding(mesh, P()))
        msk = jax.device_put(msk, NamedSharding(mesh, P()))
        return jax.jit(_ins)(sm, pts, msk)

    return run


def sharded_gn_step(mesh: Mesh, cfg: ShardedMapConfig,
                    max_corr_dist_sq: float = 1.0, iters: int = 8,
                    residual: str = "point_to_point",
                    planar_thresh: float = 0.1):
    """Scan-to-SHARDED-map GN: each device evaluates residual/Jacobian
    contributions ONLY for the source points its region owns (against its
    local region+halo map — exact by the halo construction) and the 6x6
    normal equations are psum-combined over ICI every iteration."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    inv = 1.0 / cfg.voxel_size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()), out_specs=P(),
    )
    def _step(sm, pts, msk, t0):
        local = jax.tree.map(lambda a: a[0], sm)
        dev = jax.lax.axis_index(axis)

        def body(_, t_mat):
            # ownership at the CURRENT pose: the transformed point decides
            # which device answers it (matches where its NN candidates live)
            p_t = pts @ t_mat[:3, :3].T + t_mat[:3, 3]
            own = msk & (tile_owner(p_t, cfg.tile_size, n_dev) == dev)
            if residual == "point_to_plane":
                hg = point_to_plane_hg(t_mat, pts, own, local, inv,
                                       planar_thresh, max_corr_dist_sq,
                                       cfg.stencil, cfg.num_probes)
            else:
                hg = point_to_point_hg(t_mat, pts, own, local, inv,
                                       max_corr_dist_sq, cfg.stencil,
                                       cfg.num_probes)
            h = jax.lax.psum(hg.h, axis)
            g = jax.lax.psum(hg.g, axis)
            dx = solve6_damped(h, g)
            out = t_mat.at[:3, 3].add(dx[:3])
            return out.at[:3, :3].set(t_mat[:3, :3] @ so3_exp(dx[3:]))

        return jax.lax.fori_loop(0, iters, body, t0)

    def run(sm, pts, msk, t0):
        rep = NamedSharding(mesh, P())
        pts = jax.device_put(pts, rep)
        msk = jax.device_put(msk, rep)
        t0 = jax.device_put(t0, rep)
        return jax.jit(_step)(sm, pts, msk, t0)

    return run


def shard_occupancy(sm) -> jax.Array:
    """Per-device occupied-block counts [n_dev] (load-balance diagnostic;
    also proves blocks actually live on different devices)."""
    return jnp.sum((sm.fp != 0).astype(jnp.int32), axis=1)
