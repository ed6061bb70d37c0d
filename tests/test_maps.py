"""Voxel grouping / hash-map / NDT-map tests against brute-force NumPy oracles
(the coverage the reference lacks for its NN structures — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from funny_lidar_slam_tpu.ops.voxel import voxel_downsample, group_by_voxel
from funny_lidar_slam_tpu.maps import voxel_hash, ndt_map


def random_cloud(n, scale=10.0, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    mask = np.ones(n, dtype=bool)
    if n_valid is not None:
        mask[n_valid:] = False
        pts[n_valid:] = 1e6  # poison
    return pts, mask


def test_group_by_voxel_counts():
    pts, mask = random_cloud(500, scale=5.0, seed=1, n_valid=400)
    g = group_by_voxel(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    vox = np.floor(pts[:400]).astype(np.int32)
    uniq = np.unique(vox, axis=0)
    assert int(g.num_groups) == len(uniq)
    # every valid sorted point's coords belong to its group
    sm = np.asarray(g.sorted_mask)
    assert sm.sum() == 400


def test_voxel_downsample_centroids():
    pts, mask = random_cloud(1000, scale=3.0, seed=2, n_valid=900)
    out = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.0, capacity=512)
    got = np.asarray(out.points)[np.asarray(out.mask)]
    # oracle: centroid per occupied voxel
    vox = np.floor(pts[:900]).astype(np.int32)
    uniq, inv = np.unique(vox, axis=0, return_inverse=True)
    oracle = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    for i, p in zip(inv, pts[:900]):
        oracle[i] += p
        cnt[i] += 1
    oracle /= cnt[:, None]
    assert len(got) == len(uniq)
    # order-insensitive comparison
    got_sorted = got[np.lexsort(got.T)]
    oracle_sorted = oracle[np.lexsort(oracle.T)]
    assert np.allclose(got_sorted, oracle_sorted, atol=1e-4)


def brute_knn(queries, map_pts, k, radius):
    """Oracle KNN restricted to the stencil radius in voxel space."""
    out_d = np.full((len(queries), k), np.inf)
    out_p = np.zeros((len(queries), k, 3))
    for i, q in enumerate(queries):
        d2 = np.sum((map_pts - q) ** 2, axis=-1)
        idx = np.argsort(d2)[:k]
        out_d[i, : len(idx)] = d2[idx]
        out_p[i, : len(idx)] = map_pts[idx]
    return out_p, out_d


def test_voxel_hash_insert_and_knn():
    pts, mask = random_cloud(2000, scale=8.0, seed=3, n_valid=1800)
    m = voxel_hash.build(4096, 8, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    # all points should be inserted (few collisions at this density)
    total = int(jnp.sum(m.count))
    assert total >= 1700  # bucket overflow may drop a handful

    queries = pts[:50] + np.random.default_rng(4).normal(0, 0.2, (50, 3)).astype(np.float32)
    nbrs, d2, ok = voxel_hash.query_knn(m, jnp.asarray(queries), 1.0, k=1, stencil="nearby26")
    nbrs, d2, ok = np.asarray(nbrs), np.asarray(d2), np.asarray(ok)
    # oracle over the actually-inserted points
    ins_pts = np.asarray(m.points).reshape(-1, 3)
    ins_valid = (np.arange(8)[None, :] < np.asarray(m.count)[:, None]).reshape(-1)
    ins_pts = ins_pts[ins_valid]
    _, od2 = brute_knn(queries, ins_pts, 1, radius=1)
    # query noise 0.2 << voxel 1.0 so the true NN is inside the 26-stencil
    assert ok[:, 0].all()
    assert np.allclose(d2[:, 0], od2[:, 0], atol=1e-5)


def test_voxel_hash_knn5_matches_oracle():
    pts, mask = random_cloud(3000, scale=6.0, seed=5)
    m = voxel_hash.build(4096, 16, jnp.asarray(pts), jnp.asarray(mask), 1.0)
    queries = pts[100:140]
    nbrs, d2, ok = voxel_hash.query_knn(m, jnp.asarray(queries), 1.0, k=5, stencil="nearby26")
    d2 = np.asarray(d2)
    ins_pts = np.asarray(m.points).reshape(-1, 3)
    ins_valid = (np.arange(16)[None, :] < np.asarray(m.count)[:, None]).reshape(-1)
    ins_pts = ins_pts[ins_valid]
    for i, q in enumerate(queries):
        od2 = np.sort(np.sum((ins_pts - q) ** 2, axis=-1))[:5]
        # oracle searches everywhere; stencil only 1-voxel ring — all 5 NN of a
        # query ON a map point are within 1 voxel at this density
        assert np.allclose(np.sort(d2[i]), od2, atol=1e-5)


def test_incremental_insert_accumulates():
    pts1, m1 = random_cloud(500, scale=5.0, seed=6)
    pts2 = pts1 + np.float32(20.0)  # disjoint region
    m = voxel_hash.build(2048, 8, jnp.asarray(pts1), jnp.asarray(m1), 1.0)
    n1 = int(voxel_hash.num_occupied(m))
    m = voxel_hash.insert(m, jnp.asarray(pts2), jnp.asarray(m1), 1.0)
    n2 = int(voxel_hash.num_occupied(m))
    assert n2 > n1
    # points from both regions queryable
    _, d2a, oka = voxel_hash.query_knn(m, jnp.asarray(pts1[:10]), 1.0, k=1)
    _, d2b, okb = voxel_hash.query_knn(m, jnp.asarray(pts2[:10]), 1.0, k=1)
    assert np.asarray(oka).all() and np.asarray(okb).all()
    assert np.allclose(np.asarray(d2a)[:, 0], 0, atol=1e-6)
    assert np.allclose(np.asarray(d2b)[:, 0], 0, atol=1e-6)


def test_age_eviction():
    pts1, mk = random_cloud(200, scale=3.0, seed=7)
    # capacity holds the ~130-voxel batches within the 2-epoch protection
    # window (~390 protected voxels) with room to claim
    m = voxel_hash.build(1024, 4, jnp.asarray(pts1), jnp.asarray(mk), 1.0)
    # many epochs of inserts elsewhere -> old region expires and can be reclaimed
    for i in range(5):
        pts_i = pts1 + np.float32(100.0 + 10 * i)
        m = voxel_hash.insert(m, jnp.asarray(pts_i), jnp.asarray(mk), 1.0, max_age=2)
    # map stays bounded and functional
    assert int(voxel_hash.num_occupied(m)) <= 1024
    _, d2, ok = voxel_hash.query_knn(m, jnp.asarray(pts1 + np.float32(140.0))[:5], 1.0, k=1)
    assert np.asarray(ok).all()
    assert np.allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-6)


def test_ndt_stats_match_numpy():
    rng = np.random.default_rng(8)
    # 3 clusters in distinct voxels, >5 pts each
    centers = np.array([[0.5, 0.5, 0.5], [3.5, 0.5, 0.5], [0.5, 3.5, 0.5]], dtype=np.float32)
    pts = np.concatenate([
        c + rng.normal(0, 0.05, (20, 3)).astype(np.float32) for c in centers
    ])
    mask = np.ones(len(pts), bool)
    m = ndt_map.create(256)
    m = ndt_map.insert(m, jnp.asarray(pts), jnp.asarray(mask), 1.0, min_points=5)
    occ = np.asarray(m.occupied)
    assert occ.sum() == 3
    means = np.asarray(m.mean)[occ]
    cnts = np.asarray(m.count)[occ]
    assert np.allclose(sorted(cnts), [20, 20, 20])
    oracle_means = np.stack([pts[i * 20 : (i + 1) * 20].mean(0) for i in range(3)])
    got = means[np.lexsort(means.T)]
    want = oracle_means[np.lexsort(oracle_means.T)]
    assert np.allclose(got, want, atol=1e-5)
    # covariance check for one voxel
    est = np.asarray(m.estimated)[occ]
    assert est.all()
    sl = np.where(occ)[0][0]
    # identify the slot's cluster by its mean (the voxel coords are only
    # stored as fingerprints)
    k = int(np.argmin(np.linalg.norm(oracle_means - np.asarray(m.mean)[sl], axis=1)))
    cluster = pts[k * 20 : (k + 1) * 20]
    sigma = np.cov(cluster.T)
    info = np.asarray(m.info)[sl]
    lam = np.linalg.eigvalsh(sigma)
    reg = sigma + max(1e-3 * lam[-1], 1e-6) * np.eye(3)
    assert np.allclose(info, np.linalg.inv(reg), rtol=2e-2, atol=1e-1)


def test_ndt_incremental_merge():
    rng = np.random.default_rng(9)
    cluster = (np.array([0.5, 0.5, 0.5]) + rng.normal(0, 0.1, (40, 3))).astype(np.float32)
    mask20 = np.ones(20, bool)
    m = ndt_map.create(128)
    m = ndt_map.insert(m, jnp.asarray(cluster[:20]), jnp.asarray(mask20), 1.0, min_points=5)
    m = ndt_map.insert(m, jnp.asarray(cluster[20:]), jnp.asarray(mask20), 1.0, min_points=5)
    occ = np.asarray(m.occupied)
    sl = np.where(occ & (np.asarray(m.count) > 0))[0]
    # merged stats equal the full-batch stats
    tot = np.asarray(m.count)[sl].sum()
    assert tot == 40
    big = sl[np.argmax(np.asarray(m.count)[sl])]
    # the slot's voxel is recovered from its mean (fingerprint-only directory)
    vox = np.floor(np.asarray(m.mean)[big]).astype(int)
    inside = np.floor(cluster).astype(int) == vox
    members = cluster[inside.all(1)]
    assert np.allclose(np.asarray(m.mean)[big], members.mean(0), atol=1e-5)
    m2_oracle = (members - members.mean(0)).T @ (members - members.mean(0))
    assert np.allclose(np.asarray(m.m2)[big], m2_oracle, atol=1e-3)


def test_ndt_estimate_all_single_point():
    pts = np.array([[0.5, 0.5, 0.5]], dtype=np.float32)
    m = ndt_map.create(64)
    m = ndt_map.insert(m, jnp.asarray(pts), jnp.ones(1, bool), 1.0, estimate_all=True)
    occ = np.asarray(m.occupied)
    sl = np.where(occ)[0][0]
    assert bool(np.asarray(m.estimated)[sl])
    assert np.allclose(np.asarray(m.info)[sl], 100.0 * np.eye(3))


def test_ndt_query_stencil():
    rng = np.random.default_rng(10)
    pts = (np.array([0.5, 0.5, 0.5]) + rng.normal(0, 0.1, (30, 3))).astype(np.float32)
    m = ndt_map.create(128)
    m = ndt_map.insert(m, jnp.asarray(pts), jnp.ones(30, bool), 1.0, min_points=5)
    q = jnp.asarray([[0.6, 0.4, 0.5], [10.0, 10.0, 10.0]], jnp.float32)
    mean, info, valid = ndt_map.query_stencil(m, q, 1.0)
    valid = np.asarray(valid)
    assert valid[0, 0]  # center voxel hit for first query
    assert not valid[1].any()  # empty region
