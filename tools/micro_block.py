"""Block map vs voxel hash at the bench shape on the real TPU:
query_knn (the GN stencil gather) and insert (the map update)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from funny_lidar_slam_tpu.maps import block_map, voxel_hash

N, G, S, C = 16384, 8192, 8, 65536
K = 16
IVS = 1.0 / 0.5


def timeit(f, *args, n=30):
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
    queries = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)
    scan = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)
    smask = jnp.ones(N, bool)

    mv = voxel_hash.build(C, S, mpts, mmask, IVS)
    t, _ = timeit(lambda q: voxel_hash.query_knn(
        mv, q, IVS, k=K, stencil="nearby26", group_capacity=G), queries)
    print(f"voxel_hash grouped query k={K}: {t:.2f} ms")

    mb = block_map.build(C, S, mpts, mmask, IVS)
    print(f"block load: {float(block_map.load_factor(mb)):.3f}  "
          f"voxels: {int(block_map.num_occupied(mb))}")
    t, _ = timeit(lambda q: block_map.query_knn(
        mb, q, IVS, k=K, group_capacity=G), queries)
    print(f"block_map  grouped query k={K}: {t:.2f} ms")
    t, _ = timeit(lambda q: block_map.query_knn(
        mb, q, IVS, k=1, group_capacity=G), queries)
    print(f"block_map  grouped query k=1:  {t:.2f} ms")

    # parity spot check on the TPU
    _, d2v, okv = voxel_hash.query_knn(mv, queries[:256], IVS, k=1,
                                       stencil="nearby26")
    _, d2b, okb = block_map.query_knn(mb, queries[:256], IVS, k=1)
    both = np.asarray(okv)[:, 0] & np.asarray(okb)[:, 0]
    dv, db = np.asarray(d2v)[both, 0], np.asarray(d2b)[both, 0]
    print(f"k=1 parity: both-valid {both.sum()}/256, "
          f"block<=voxel: {(db <= dv + 1e-5).mean():.3f}")

    t, _ = timeit(lambda p: voxel_hash.insert(mv, p, smask, IVS), scan)
    print(f"voxel_hash insert 16k: {t:.2f} ms")
    t, _ = timeit(lambda p: block_map.insert(mb, p, smask, IVS), scan)
    print(f"block_map  insert 16k: {t:.2f} ms")
    t, _ = timeit(lambda p: block_map.insert(mb, p, smask, IVS,
                                             center_policy=True, max_age=25),
                  scan)
    print(f"block_map  insert 16k (center+age): {t:.2f} ms")


if __name__ == "__main__":
    main()
