"""Block-structured map (maps/block_map.py) tests against brute-force
oracles and against the per-voxel hash it replaces (round-4 NN redesign)."""

import numpy as np
import jax.numpy as jnp

from funny_lidar_slam_tpu.maps import block_map, voxel_hash


def random_cloud(n, scale=10.0, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    mask = np.ones(n, dtype=bool)
    if n_valid is not None:
        mask[n_valid:] = False
        pts[n_valid:] = 1e6  # poison
    return pts, mask


def inserted_points(m: block_map.BlockMap):
    """All LIVE points stored in the map (oracle ground set). Purged blocks
    (fp == 0) keep stale rows until reclaimed but are invisible to queries,
    so they are excluded here too."""
    s = m.bucket_size
    plane = m.plane
    live = np.asarray(m.fp) != 0
    tab = np.asarray(m.tab)[:-1][live]  # drop the miss row + dead blocks
    nb = tab.shape[0]
    cnt = np.asarray(m.counts)[live]  # [nb, 8]
    x = tab[:, 0:plane].reshape(nb, 8, s)
    y = tab[:, plane:2 * plane].reshape(nb, 8, s)
    z = tab[:, 2 * plane:3 * plane].reshape(nb, 8, s)
    pts = np.stack([x, y, z], axis=-1)  # [nb, 8, s, 3]
    valid = (np.arange(s)[None, None, :] < cnt[:, :, None]) & (
        np.abs(pts[..., 0]) < 1e18
    )
    return pts[valid]


def test_insert_stores_all_points():
    pts, mask = random_cloud(2000, scale=8.0, seed=3, n_valid=1800)
    m = block_map.build(4096, 8, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    ins = inserted_points(m)
    assert len(ins) >= 1700  # bucket overflow may drop a handful
    # every stored point is one of the input points (no corruption)
    d = np.min(
        np.sum((ins[:200, None, :] - pts[None, :1800, :]) ** 2, -1), axis=1
    )
    assert np.max(d) < 1e-9
    # poison never enters the table
    assert np.max(np.abs(ins)) < 1e5


def test_knn1_matches_oracle():
    pts, mask = random_cloud(2000, scale=8.0, seed=3, n_valid=1800)
    m = block_map.build(4096, 8, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    queries = pts[:50] + np.random.default_rng(4).normal(0, 0.2, (50, 3)).astype(
        np.float32
    )
    nbrs, d2, ok = block_map.query_knn(m, jnp.asarray(queries), 1.0, k=1)
    d2 = np.asarray(d2)
    ins = inserted_points(m)
    for i, q in enumerate(queries):
        od2 = np.min(np.sum((ins - q) ** 2, axis=-1))
        assert np.asarray(ok)[i, 0]
        assert abs(d2[i, 0] - od2) < 1e-5


def test_knn5_matches_oracle_and_voxel_hash():
    pts, mask = random_cloud(3000, scale=6.0, seed=5)
    m = block_map.build(4096, 16, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    queries = pts[100:140]
    nbrs, d2, ok = block_map.query_knn(m, jnp.asarray(queries), 1.0, k=5)
    d2 = np.asarray(d2)
    ins = inserted_points(m)
    for i, q in enumerate(queries):
        od2 = np.sort(np.sum((ins - q) ** 2, axis=-1))[:5]
        assert np.allclose(np.sort(d2[i]), od2, atol=1e-5)
    # the block cover is a superset of nearby26: block results must be at
    # least as close as the voxel-hash results on its own inserted set
    mv = voxel_hash.build(4096, 16, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    _, d2v, okv = voxel_hash.query_knn(mv, jnp.asarray(queries), 1.0, k=5,
                                       stencil="nearby26")
    assert np.all(np.sort(d2)[:, 0] <= np.sort(np.asarray(d2v))[:, 0] + 1e-5)


def test_group_capacity_truncation():
    pts, mask = random_cloud(512, scale=6.0, seed=8)
    m = block_map.build(1024, 8, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    _, _, ok = block_map.query_knn(m, jnp.asarray(pts), 1.0, k=1,
                                   group_capacity=8)
    ok = np.asarray(ok)
    assert ok[:, 0].sum() >= 8  # the in-capacity groups report neighbors
    assert not ok[:, 0].all()  # beyond-capacity groups report none


def test_incremental_insert_accumulates():
    pts1, m1 = random_cloud(500, scale=5.0, seed=6)
    pts2 = pts1 + np.float32(20.0)  # disjoint region
    m = block_map.build(2048, 8, jnp.asarray(pts1), jnp.asarray(m1), 1.0)
    n1 = int(block_map.num_occupied(m))
    m = block_map.insert(m, jnp.asarray(pts2), jnp.asarray(m1), 1.0)
    n2 = int(block_map.num_occupied(m))
    assert n2 > n1
    _, d2a, oka = block_map.query_knn(m, jnp.asarray(pts1[:10]), 1.0, k=1)
    _, d2b, okb = block_map.query_knn(m, jnp.asarray(pts2[:10]), 1.0, k=1)
    assert np.asarray(oka).all() and np.asarray(okb).all()
    assert np.allclose(np.asarray(d2a)[:, 0], 0, atol=1e-6)
    assert np.allclose(np.asarray(d2b)[:, 0], 0, atol=1e-6)


def test_age_eviction_reclaims_and_wipes():
    pts1, mk = random_cloud(200, scale=3.0, seed=7)
    m = block_map.build(1024, 4, jnp.asarray(pts1), jnp.asarray(mk), 1.0)
    for i in range(5):
        pts_i = pts1 + np.float32(100.0 + 10 * i)
        m = block_map.insert(m, jnp.asarray(pts_i), jnp.asarray(mk), 1.0,
                             max_age=2)
    assert int(block_map.num_blocks(m)) <= m.block_capacity
    _, d2, ok = block_map.query_knn(
        m, jnp.asarray(pts1 + np.float32(140.0))[:5], 1.0, k=1)
    assert np.asarray(ok).all()
    assert np.allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-6)
    # stale data from before eviction must never surface: every stored
    # point belongs to one of the last-3-epoch regions
    ins = inserted_points(m)
    lo = ins.min()
    assert lo > 100.0 - 3.5  # nothing from the original [-3, 3] region


def test_center_policy_keeps_closest():
    # two points in one voxel: with center_policy, the second (closer to
    # center) insertion is kept, a farther later one is dropped
    center = np.array([[0.5, 0.5, 0.5]], np.float32)
    far = np.array([[0.05, 0.05, 0.05]], np.float32)
    mk = np.ones(1, bool)
    m = block_map.create(256, 4)
    m = block_map.insert(m, jnp.asarray(center), jnp.asarray(mk), 1.0,
                         center_policy=True)
    m = block_map.insert(m, jnp.asarray(far), jnp.asarray(mk), 1.0,
                         center_policy=True)
    ins = inserted_points(m)
    assert len(ins) == 1  # far point dropped: voxel already has a closer one
    assert np.allclose(ins[0], center[0])


def test_plane_query_matches_assembled():
    pts, mask = random_cloud(800, scale=5.0, seed=9)
    m = block_map.build(2048, 8, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    q = jnp.asarray(pts[:64])
    nbrs, d2, ok = block_map.query_knn(m, q, 1.0, k=4)
    px, py, pz, d2p, okp, _ = block_map.query_knn_planes(m, q, 1.0, 4)
    assert np.allclose(np.asarray(nbrs)[..., 0], np.asarray(px))
    assert np.allclose(np.asarray(d2), np.asarray(d2p))
    assert np.array_equal(np.asarray(ok), np.asarray(okp))
