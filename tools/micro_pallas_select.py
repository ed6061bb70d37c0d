import time
import jax, jax.numpy as jnp, numpy as np
from funny_lidar_slam_tpu.maps import block_map
from funny_lidar_slam_tpu.ops import pallas_select
from funny_lidar_slam_tpu.ops.voxel import group_by_voxel
import sys
sys.path.insert(0, "/root/repo/tools")
from micro_block2 import surface_cloud

N, G, S, C, K = 16384, 8192, 8, 65536, 16
IVS = 1.0

def timeit(f, *args, n=30):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3, r

map_np = surface_cloud(60000, 0)
mpts = jnp.concatenate([jnp.asarray(map_np), jnp.zeros((C - 60000, 3), jnp.float32)])
mmask = jnp.arange(C) < 60000
queries = jnp.asarray(surface_cloud(N, 1))
mb = block_map.build(C, S, mpts, mmask, IVS)

g = group_by_voxel(queries, jnp.ones(N, bool), IVS)
rep_tgt = jnp.where((g.rank == 0) & (g.group_id < G), g.group_id, G)
uniq = jnp.zeros((G, 3), jnp.int32).at[rep_tgt].set(g.group_coords, mode="drop")
wnd = block_map.gather_cover(mb, uniq, 8)
gid = jnp.minimum(g.group_id, G - 1)
plane = mb.plane

f_pl = jax.jit(lambda w, gi, q: pallas_select.fused_select(w, gi, q, K, plane))
f_x = jax.jit(lambda w, gi, q: pallas_select.fused_select_xla(w, gi, q, K, plane))

out_p = f_pl(wnd, gid, g.sorted_pts)
out_x = f_x(wnd, gid, g.sorted_pts)
d2p, d2x = np.asarray(out_p[0]), np.asarray(out_x[0])
finite = d2x < 1e18
print("d2 max err (finite):", np.max(np.abs(np.where(finite, d2p - d2x, 0))))
xp, xx = np.asarray(out_p[1]), np.asarray(out_x[1])
print("x max err (finite):", np.max(np.abs(np.where(finite, xp - xx, 0))))
print("finite frac:", finite.mean())

t, _ = timeit(f_pl, wnd, gid, g.sorted_pts)
print(f"pallas fused_select k={K}: {t:.2f} ms")
t, _ = timeit(f_x, wnd, gid, g.sorted_pts)
print(f"xla fallback:             {t:.2f} ms")

# end-to-end: group + gather_cover + pallas select
@jax.jit
def full(q):
    g = group_by_voxel(q, jnp.ones(N, bool), IVS)
    rep_tgt = jnp.where((g.rank == 0) & (g.group_id < G), g.group_id, G)
    uniq = jnp.zeros((G, 3), jnp.int32).at[rep_tgt].set(g.group_coords, mode="drop")
    wnd = block_map.gather_cover(mb, uniq, 8)
    gid = jnp.minimum(g.group_id, G - 1)
    return pallas_select.fused_select(wnd, gid, g.sorted_pts, K, plane)

t, _ = timeit(full, queries)
print(f"full fused query (sorted out) k={K}: {t:.2f} ms")
