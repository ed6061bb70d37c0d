"""Dense modulo-grid map (maps/grid_map.py): parity against the hashed
block map it can replace, plus the grid-specific semantics (modulo
aliasing, eager eviction wiping rows, center policy)."""

import numpy as np
import jax.numpy as jnp

from funny_lidar_slam_tpu.maps import block_map, grid_map

DIMS = (32, 32, 8)  # 64 x 64 x 16 m at 1 m voxels


def scene(n=4000, seed=0, extent=30.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, extent, (n, 3)).astype(np.float32)
    pts[:, 2] *= 10.0 / extent  # flatten z into the grid
    return pts


def padded(pts, cap):
    out = np.zeros((cap, 3), np.float32)
    msk = np.zeros(cap, bool)
    out[: len(pts)] = pts
    msk[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(msk)


def test_insert_stores_all_points():
    pts, msk = padded(scene(3000), 4096)
    m = grid_map.build(DIMS, 8, pts, msk, 1.0)
    assert int(grid_map.num_occupied(m)) > 0
    # every inserted point must be findable as its own NN at distance 0
    nbrs, d2, ok = block_map.query_knn(m, pts[:3000], 1.0, k=1)
    assert bool(ok[:, 0].all())
    np.testing.assert_allclose(np.asarray(d2[:, 0]), 0.0, atol=1e-9)


def test_knn_matches_block_map():
    """Same data, same queries: the grid must return the same neighbors as
    the hashed block map (low load: no bucket overflow, no aliasing)."""
    map_pts, map_msk = padded(scene(3000, seed=1), 4096)
    m_g = grid_map.build(DIMS, 8, map_pts, map_msk, 1.0)
    m_b = block_map.build(16384, 8, map_pts, map_msk, 1.0)
    q = jnp.asarray(scene(512, seed=2))
    _, d2_g, ok_g = block_map.query_knn(m_g, q, 1.0, k=5)
    _, d2_b, ok_b = block_map.query_knn(m_b, q, 1.0, k=5)
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok_b))
    fin = np.asarray(ok_b)
    np.testing.assert_allclose(np.asarray(d2_g)[fin], np.asarray(d2_b)[fin],
                               rtol=1e-6)


def test_aliased_far_block_self_filters():
    """A block exactly dims*2 voxels away shares a slot; after the newest
    writer re-claims it, queries near the OLD location find nothing."""
    a = np.array([[5.2, 5.3, 2.1]], np.float32)
    b = a + np.array([[DIMS[0] * 2.0, 0, 0]], np.float32)  # same slot
    pa, ma = padded(a, 128)
    m = grid_map.build(DIMS, 8, pa, ma, 1.0)
    _, d2, ok = block_map.query_knn(m, jnp.asarray(a), 1.0, k=1)
    assert bool(ok[0, 0]) and float(d2[0, 0]) < 1e-9
    pb, mb = padded(b, 128)
    m = grid_map.insert(m, pb, mb, 1.0)  # newest writer takes the slot
    _, d2a, ok_a = block_map.query_knn(m, jnp.asarray(a), 1.0, k=1)
    _, d2b, ok_b = block_map.query_knn(m, jnp.asarray(b), 1.0, k=1)
    assert bool(ok_b[0, 0]) and float(d2b[0, 0]) < 1e-9
    # the old point is gone (rows wiped on re-claim) or, at worst, far
    assert (not bool(ok_a[0, 0])) or float(d2a[0, 0]) > 100.0


def test_age_eviction_wipes_rows():
    """max_age purges untouched blocks AND wipes their rows — the grid
    gather has no liveness check, so stale rows must not serve points."""
    old = np.array([[3.3, 3.3, 1.0]], np.float32)
    po, mo = padded(old, 128)
    m = grid_map.build(DIMS, 8, po, mo, 1.0)
    fresh = np.array([[20.0, 20.0, 5.0]], np.float32)
    pf, mf = padded(fresh, 128)
    for _ in range(4):  # advance epochs past max_age without touching `old`
        m = grid_map.insert(m, pf, mf, 1.0, max_age=2)
    _, _, ok = block_map.query_knn(m, jnp.asarray(old), 1.0, k=1)
    assert not bool(ok[0, 0]), "evicted block still served points"
    _, d2f, okf = block_map.query_knn(m, jnp.asarray(fresh), 1.0, k=1)
    assert bool(okf[0, 0]) and float(d2f[0, 0]) < 1e-9


def test_center_policy_keeps_closest():
    """iVox rule: a voxel keeps the point closest to its center."""
    near = np.array([[5.5, 5.5, 0.5]], np.float32)  # voxel (5,5,0) center
    far = np.array([[5.9, 5.9, 0.9]], np.float32)  # same voxel, off-center
    p1, m1 = padded(near, 128)
    m = grid_map.build((16, 16, 4), 8, p1, m1, 1.0)
    p2, m2 = padded(far, 128)
    m = grid_map.insert(m, p2, m2, 1.0, center_policy=True)
    nbrs, d2, ok = block_map.query_knn(m, jnp.asarray(far), 1.0, k=2)
    # the off-center point was skipped: only the near point is stored
    assert int(np.asarray(ok).sum()) == 1
    np.testing.assert_allclose(np.asarray(nbrs[0, 0]), near[0], atol=1e-6)


def test_icp_matcher_grid_layout():
    """End-to-end: IcpMatcher with map_layout='grid' recovers a known
    transform exactly like the block layout."""
    from funny_lidar_slam_tpu.registration import matchers
    from funny_lidar_slam_tpu.core.lie import se3_exp, se3_inv, se3_log

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 10, (4000, 3)).astype(np.float32)
    cfg = matchers.IcpConfig(
        source_capacity=4096, cloud_capacity=4096, merged_capacity=8192,
        map_capacity=8192, max_correspond_distance=1.5, bucket_size=16,
        source_filter_size=0.01, map_filter_size=0.01,
        position_converge_thresh=1e-4, rotation_converge_thresh=1e-4,
        map_layout="grid", grid_dims=(16, 16, 16),
    )
    m = matchers.IcpMatcher(cfg)
    t_true = np.asarray(se3_exp(jnp.asarray(
        [0.3, -0.2, 0.1, 0.02, 0.04, -0.03], jnp.float32)))
    src_pts = (pts - t_true[:3, 3]) @ t_true[:3, :3]
    cap = 4096

    def as_cloud(p):
        from funny_lidar_slam_tpu.core.cloud import Cloud
        buf = np.zeros((cap, 3), np.float32)
        msk = np.zeros(cap, bool)
        buf[: len(p)] = p[:cap]
        msk[: min(len(p), cap)] = True
        return Cloud(jnp.asarray(buf), jnp.asarray(msk))

    s = m.create_state()
    s = m.add_first(s, as_cloud(pts), jnp.eye(4))
    s, res = m.match(s, as_cloud(src_pts), jnp.eye(4))
    d = np.asarray(se3_log(se3_inv(res.t_mat) @ jnp.asarray(t_true)))
    assert bool(res.converged)
    assert np.linalg.norm(d[:3]) < 0.05 and np.linalg.norm(d[3:]) < 0.01


def test_p2plane_ivox_grid_layout():
    """PointToPlane_IVOX with map_layout='grid': recovers the transform on
    the plane scene like the block-map ivox matcher."""
    from funny_lidar_slam_tpu.core.cloud import Cloud
    from funny_lidar_slam_tpu.core.lie import se3_exp, se3_inv, se3_log
    from funny_lidar_slam_tpu.registration import matchers

    g = np.arange(0.1, 8.0, 0.25, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = np.concatenate([
        np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], 1),
        np.stack([xx.ravel(), np.zeros(xx.size), yy.ravel()], 1),
        np.stack([np.zeros(xx.size), xx.ravel(), yy.ravel()], 1),
    ]).astype(np.float32) + np.asarray([3.0, 4.0, 5.0], np.float32)

    cfg = matchers.PointToPlaneConfig(
        mode="ivox", source_capacity=4096, map_capacity=16384, bucket_size=8,
        ivox_voxel_size=0.5, stencil="nearby18",
        map_layout="grid", grid_dims=(32, 32, 32),  # 32 m extent at 0.5 m
    )
    m = matchers.PointToPlaneMatcher(cfg)
    t_true = np.asarray(se3_exp(jnp.asarray(
        [0.08, -0.05, 0.04, 0.01, 0.02, -0.015], jnp.float32)))
    src_pts = (pts - t_true[:3, 3]) @ t_true[:3, :3]

    def as_cloud(p, cap=4096):
        buf = np.zeros((cap, 3), np.float32)
        msk = np.zeros(cap, bool)
        buf[: len(p)] = p[:cap]
        msk[: min(len(p), cap)] = True
        return Cloud(jnp.asarray(buf), jnp.asarray(msk))

    s = m.create_state()
    s = m.add_first(s, as_cloud(pts), jnp.eye(4))
    s, res = m.match(s, as_cloud(src_pts), jnp.eye(4))
    d = np.asarray(se3_log(se3_inv(res.t_mat) @ jnp.asarray(t_true)))
    assert bool(res.converged)
    assert np.linalg.norm(d[:3]) < 0.02 and np.linalg.norm(d[3:]) < 0.005
