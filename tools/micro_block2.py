"""Stage breakdown of block_map.query_knn on a surface-like cloud
(walls+ground, the geometry scans actually have)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from funny_lidar_slam_tpu.maps import block_map, voxel_hash
from funny_lidar_slam_tpu.ops.voxel import group_by_voxel

N, G, S, C = 16384, 8192, 8, 65536
K = 16
IVS = 1.0  # ICP nn_voxel_size = 1.0


def surface_cloud(n, seed=0):
    """Points on the walls + floor of a 80x80x6 m room (surface-like)."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 1, n)
    xy = rng.uniform(-40, 40, (n, 2))
    z = rng.uniform(0, 6, n)
    pts = np.zeros((n, 3), np.float32)
    wall = u < 0.6
    side = rng.integers(0, 4, n)
    pts[wall, 0] = np.where(side[wall] < 2, np.where(side[wall] == 0, -40, 40),
                            xy[wall, 0])
    pts[wall, 1] = np.where(side[wall] >= 2, np.where(side[wall] == 2, -40, 40),
                            xy[wall, 1])
    pts[wall, 2] = z[wall]
    pts[~wall, :2] = xy[~wall]
    pts[~wall, 2] = 0.05 * rng.standard_normal((~wall).sum())
    pts += rng.normal(0, 0.05, pts.shape)
    return pts.astype(np.float32)


def timeit(f, *args, n=30):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3, r


def main():
    map_np = surface_cloud(60000, 0)
    mpts = jnp.concatenate([jnp.asarray(map_np),
                            jnp.zeros((C - 60000, 3), jnp.float32)])
    mmask = jnp.arange(C) < 60000
    queries = jnp.asarray(surface_cloud(N, 1))

    mv = voxel_hash.build(C, S, mpts, mmask, IVS)
    t, _ = timeit(lambda q: voxel_hash.query_knn(
        mv, q, IVS, k=K, stencil="nearby26", group_capacity=G), queries)
    print(f"voxel_hash grouped k={K}: {t:.2f} ms")

    mb = block_map.build(C, S, mpts, mmask, IVS)
    print(f"block load: {float(block_map.load_factor(mb)):.3f} "
          f"voxels {int(block_map.num_occupied(mb))}")
    t, _ = timeit(lambda q: block_map.query_knn(
        mb, q, IVS, k=K, group_capacity=G), queries)
    print(f"block_map full k={K}: {t:.2f} ms")
    t, _ = timeit(lambda q: block_map.query_knn(
        mb, q, IVS, k=1, group_capacity=G), queries)
    print(f"block_map full k=1:  {t:.2f} ms")

    # ---- stages ----
    g = jax.jit(lambda q: group_by_voxel(q, jnp.ones(N, bool), IVS))(queries)
    t, _ = timeit(jax.jit(lambda q: group_by_voxel(q, jnp.ones(N, bool), IVS)),
                  queries)
    print(f"  group_by_voxel: {t:.2f} ms")

    rep_tgt = jnp.where((g.rank == 0) & (g.group_id < G), g.group_id, G)
    uniq = jnp.zeros((G, 3), jnp.int32).at[rep_tgt].set(g.group_coords,
                                                        mode="drop")

    t, wnd = timeit(jax.jit(lambda u: block_map.gather_cover(mb, u, 8)), uniq)
    print(f"  gather_cover (probe+8 rows): {t:.2f} ms")

    gid = jnp.minimum(g.group_id, G - 1)

    @jax.jit
    def spread(gid, wnd):
        return wnd[gid]

    t, pw = timeit(spread, gid, wnd)
    print(f"  spread [N x {wnd.shape[1]}]: {t:.2f} ms")

    plane = mb.plane

    @jax.jit
    def planes(pw):
        return block_map._planes_from_window(pw, plane)

    t, (x, y, z) = timeit(planes, pw)
    print(f"  planes_from_window: {t:.2f} ms")

    @jax.jit
    def select(x, y, z, spts):
        qx, qy, qz = (spts[:, i:i + 1] for i in range(3))
        d2 = (x - qx) ** 2 + (y - qy) ** 2 + (z - qz) ** 2
        neg, idx = jax.lax.top_k(-d2, K)
        kd2 = -neg
        kx = jnp.take_along_axis(x, idx, axis=1)
        ky = jnp.take_along_axis(y, idx, axis=1)
        kz = jnp.take_along_axis(z, idx, axis=1)
        return kx, ky, kz, kd2

    t, _ = timeit(select, x, y, z, g.sorted_pts)
    print(f"  d2+top{K}+extract: {t:.2f} ms")

    @jax.jit
    def select_d2only(x, y, z, spts):
        qx, qy, qz = (spts[:, i:i + 1] for i in range(3))
        d2 = (x - qx) ** 2 + (y - qy) ** 2 + (z - qz) ** 2
        neg, idx = jax.lax.top_k(-d2, K)
        return -neg

    t, _ = timeit(select_d2only, x, y, z, g.sorted_pts)
    print(f"  d2+top{K} (no extract): {t:.2f} ms")

    @jax.jit
    def scatter_back(kx):
        return jnp.zeros((N, K), jnp.float32).at[g.order].set(kx)

    t, _ = timeit(scatter_back, x[:, :K])
    print(f"  scatter-back one [N,{K}]: {t:.2f} ms")


if __name__ == "__main__":
    main()
