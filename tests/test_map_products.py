"""Map products: PCD IO round trips, host voxel filter, tile-map split/load
(SplitMap::Split split_map.cpp:22-55, tile consumers localization.cpp:306-365)."""

import numpy as np
import pytest

from funny_lidar_slam_tpu.io.pcd import read_pcd, voxel_downsample_np, write_pcd
from funny_lidar_slam_tpu.maps import split_map


def test_pcd_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    inten = rng.uniform(size=257).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    write_pcd(p, pts, inten, binary=True)
    pts2, inten2 = read_pcd(p)
    np.testing.assert_allclose(pts2, pts, rtol=0, atol=0)
    np.testing.assert_allclose(inten2, inten, rtol=0, atol=0)


def test_pcd_roundtrip_ascii(tmp_path):
    pts = np.array([[1.5, -2.25, 3.0], [0.0, 0.125, -7.5]], np.float32)
    p = str(tmp_path / "a.pcd")
    write_pcd(p, pts, binary=False)
    pts2, inten2 = read_pcd(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    assert inten2 is None


def test_voxel_downsample_np_centroids():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.0, 5.0, 5.0]], np.float32
    )
    out = voxel_downsample_np(pts, 1.0)
    assert len(out) == 2
    got = sorted(out.tolist())
    np.testing.assert_allclose(got[0], [0.2, 0.2, 0.2], atol=1e-6)
    np.testing.assert_allclose(got[1], [5.0, 5.0, 5.0], atol=1e-6)


def test_split_partitions_all_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-250, 250, size=(5000, 3)).astype(np.float32)
    tiles = split_map.split(pts, 100.0)
    assert sum(len(v) for v in tiles.values()) == len(pts)
    for (gx, gy), tile in tiles.items():
        idx = split_map.tile_index_of(tile[:, :2], 100.0)
        assert (idx[:, 0] == gx).all() and (idx[:, 1] == gy).all()


def test_save_load_tiles_and_loader(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-150, 150, size=(3000, 3)).astype(np.float32)
    d = str(tmp_path)
    indices = split_map.save_tiles(d, pts, 100.0)
    assert indices == split_map.load_tile_indices(d)

    loader = split_map.TileMapLoader(d, tile_size=100.0, eviction_distance=2)
    changed = loader.update([0.0, 0.0])
    assert changed
    # 3x3 block around tile (0,0) minus missing tiles
    for key in loader.loaded:
        assert max(abs(key[0]), abs(key[1])) <= 1
    n_before = len(loader.loaded)
    assert not loader.update([1.0, 1.0])  # same tile: no change
    assert len(loader.loaded) == n_before
    # moving far evicts old tiles (Chebyshev distance > 2 from new center)
    pos = [-149.0, -149.0]
    loader.update(pos)
    for key in loader.loaded:
        assert max(abs(key[0] - (-2)), abs(key[1] - (-2))) <= 2
    assert loader.local_cloud().shape[1] == 3


def test_tile_loader_missing_index(tmp_path):
    with pytest.raises(FileNotFoundError):
        split_map.TileMapLoader(str(tmp_path / "nope"))
