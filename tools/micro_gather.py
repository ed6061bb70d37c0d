"""Micro-benchmark: break down the grouped stencil gather (voxel_hash.query_knn
group path) into its stages on the real TPU, and test alternative
implementations for the dominant rows.

Stages at bench shape (N=16384 queries, G=8192 groups, V=27 stencil, S=8
bucket, C=65536 slots):
  1. group_by_voxel (sort)
  2. probe: fpwin[base] row gather      [G, V] rows
  3. bucket gather: points[slot]        [G*V] rows of [S,3]
  4. spread: flat_pts[gid]              [N] rows of [V*S*3]
  5. distance + top-k                   VPU
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from funny_lidar_slam_tpu.maps import voxel_hash
from funny_lidar_slam_tpu.ops.voxel import group_by_voxel, voxel_coords

N, G, V, S, C = 16384, 8192, 27, 8, 65536
K = 16
IVS = 1.0 / 0.5


def timeit(f, *args, n=50):
    """Pipelined timing: enqueue n dispatches, block once at the end.
    The axon tunnel has a ~25 ms per-dispatch ROUND-TRIP floor, so
    per-call block_until_ready measures the tunnel, not the kernel."""
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3, r


def main():
    rng = np.random.default_rng(0)
    map_pts = jnp.asarray(rng.uniform(-40, 40, (60000, 3)), jnp.float32)
    pad = jnp.zeros((65536 - 60000, 3), jnp.float32)
    mpts = jnp.concatenate([map_pts, pad])
    mmask = jnp.arange(65536) < 60000
    m = voxel_hash.build(C, S, mpts, mmask, IVS)
    queries = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)

    t_full, _ = timeit(
        lambda q: voxel_hash.query_knn(m, q, IVS, k=K, stencil="nearby26",
                                       group_capacity=G), queries)
    print(f"full grouped query_knn k={K}: {t_full:.2f} ms")

    offsets = jnp.asarray(voxel_hash.STENCILS["nearby26"], jnp.int32)

    @jax.jit
    def stage_group(q):
        return group_by_voxel(q, jnp.ones(N, bool), IVS)

    g = stage_group(queries)
    t_grp, _ = timeit(stage_group, queries)
    print(f"  group_by_voxel: {t_grp:.2f} ms")

    rep_tgt = jnp.where((g.rank == 0) & (g.group_id < G), g.group_id, G)
    uniq = jnp.zeros((G, 3), jnp.int32).at[rep_tgt].set(g.group_coords, mode="drop")

    @jax.jit
    def stage_probe(uniq):
        cand = uniq[:, None, :] + offsets[None, :, :]
        return voxel_hash.find_slots(m, cand, 8)

    slot = stage_probe(uniq)
    t_probe, _ = timeit(stage_probe, uniq)
    print(f"  probe/find_slots [G,V]: {t_probe:.2f} ms")

    @jax.jit
    def stage_bucket(slot):
        ss = jnp.maximum(slot, 0)
        bpts = m.points[ss]
        bcnt = jnp.where(slot >= 0, m.count[ss], 0)
        return bpts, bcnt

    (bpts, bcnt) = stage_bucket(slot)
    t_bucket, _ = timeit(stage_bucket, slot)
    print(f"  bucket gather [G*V={G*V}] rows: {t_bucket:.2f} ms")

    flat_pts = bpts.reshape(G, V * S, 3)
    bvalid = (jnp.arange(S)[None, None, :] < bcnt[:, :, None]).reshape(G, V * S)
    gid = jnp.minimum(g.group_id, G - 1)

    @jax.jit
    def stage_spread(gid, flat_pts, bvalid):
        return flat_pts[gid], bvalid[gid]

    cand_pts, cand_valid = stage_spread(gid, flat_pts, bvalid)
    t_spread, _ = timeit(stage_spread, gid, flat_pts, bvalid)
    print(f"  spread [N={N}] rows of [{V*S},3]: {t_spread:.2f} ms")

    @jax.jit
    def stage_topk(cand_pts, cand_valid, spts):
        d2 = jnp.sum((cand_pts - spts[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_valid, d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, K)
        nbrs = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
        return nbrs, -neg

    t_topk, _ = timeit(stage_topk, cand_pts, cand_valid, g.sorted_pts)
    print(f"  dist+top{K}: {t_topk:.2f} ms")
    print(f"  sum of stages: {t_grp+t_probe+t_bucket+t_spread+t_topk:.2f} ms")

    # ---- alternative spread: block-banded one-hot matmul (MXU gather) ----
    # gid is sorted (group_by_voxel sorts by key), so queries in a tile of
    # T rows touch a contiguous group range of <= T groups.
    TQ = 512  # query tile
    D = V * S * 3  # 648

    @jax.jit
    def spread_mxu(gid, flat_pts):
        # pad so dynamic_slice never clamps (which would shift local indices)
        flat2 = jnp.concatenate(
            [flat_pts.reshape(G, D), jnp.zeros((TQ, D), flat_pts.dtype)])
        starts = gid[::TQ]  # [N/TQ] first group of each tile

        def tile(start, gids):
            local = gids - start  # [TQ] in [0, TQ)
            onehot = (local[:, None] == jnp.arange(TQ)[None, :]).astype(jnp.bfloat16)
            block = jax.lax.dynamic_slice(flat2, (start, 0), (TQ, D))
            return jnp.dot(onehot, block.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        out = jax.vmap(tile)(starts, gid.reshape(-1, TQ))
        return out.reshape(N, V * S, 3)

    t_mxu, out_mxu = timeit(spread_mxu, gid, flat_pts)
    ref = cand_pts
    err = jnp.max(jnp.abs(out_mxu - ref)).item()
    print(f"  ALT spread via one-hot MXU (bf16): {t_mxu:.2f} ms  max_err={err:.4f}")


if __name__ == "__main__":
    main()
