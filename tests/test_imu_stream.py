"""IMU stream / segment extraction unit tests (the reference's
data_searcher_ut.cpp + imu_data_searcher_ut.cpp boundary cases, plus the
consuming DataSynchronizer variant, src/imu/data_synchronizer.cpp)."""

import numpy as np

from funny_lidar_slam_tpu.imu.stream import DataSynchronizer, ImuStream


def _fill(stream, n=50, dt=0.01):
    for i in range(n):
        t = i * dt
        stream.push(t, [0.0, 0.0, 0.1 * i], [0.0, 0.0, 9.81])
    return stream


def test_segment_boundary_interpolation():
    s = _fill(ImuStream(require_static_init=False))
    seg = s.get_segment(0.105, 0.205, 32)
    assert seg is not None
    n = int(seg.mask.sum())
    # boundaries exactly at the requested stamps
    assert abs(seg.t[0] - 0.105) < 1e-12
    assert abs(seg.t[n - 1] - 0.205) < 1e-12
    # interior samples are the raw stamps strictly inside
    assert abs(seg.t[1] - 0.11) < 1e-9
    # lerped boundary gyro: 0.1*i at i=10.5 -> 1.05
    np.testing.assert_allclose(seg.gyro[0, 2], 1.05, atol=1e-9)


def test_segment_requires_coverage():
    s = _fill(ImuStream(require_static_init=False))
    assert s.get_segment(-0.5, 0.1, 32) is None  # before first sample
    assert s.get_segment(0.3, 9.9, 32) is None  # beyond last sample
    assert s.get_segment(0.2, 0.2, 32) is None  # empty span


def test_data_synchronizer_consumes():
    s = _fill(ImuStream(require_static_init=False))
    sync = DataSynchronizer(s)
    seg1 = sync.get_segment(0.10, 0.20, 32)
    assert seg1 is not None
    # consumed: samples strictly before the bracketing sample of 0.20 gone
    assert s.t[0] <= 0.20 <= s.t[1] + 1e-12
    # the NEXT adjacent segment still interpolates its left boundary
    seg2 = sync.get_segment(0.20, 0.30, 32)
    assert seg2 is not None
    assert abs(seg2.t[0] - 0.20) < 1e-12
    n2 = int(seg2.mask.sum())
    assert abs(seg2.t[n2 - 1] - 0.30) < 1e-12
    # gyro continuity across the handoff: both sides see the same value at 0.2
    n1 = int(seg1.mask.sum())
    np.testing.assert_allclose(seg1.gyro[n1 - 1], seg2.gyro[0], atol=1e-9)
    # buffer stays bounded as further spans are consumed
    len_before = len(s.t)
    sync.get_segment(0.30, 0.40, 32)
    assert len(s.t) <= len_before


def test_static_init_gates():
    """Static init succeeds after >200 quiet samples (system.cpp:409-455)."""
    s = ImuStream(require_static_init=True)
    rng = np.random.default_rng(0)
    for i in range(230):
        s.push(i * 0.01, rng.normal(0, 1e-4, 3),
               [0.0, 0.0, 9.81] + rng.normal(0, 1e-3, 3))
    assert s.initialized
    # gravity aligned to -mean acc
    np.testing.assert_allclose(s.gravity, [0, 0, -9.81], atol=0.05)
