"""Motion deskew: rotation-only per-point distortion correction, vectorized.

Device-side equivalent of LidarDistortionCorrector
(src/lidar/lidar_distortion_corrector.cpp:18-64): every point is moved into
the scan-start frame with p' = q_ref^-1 * q(t) * (T_l2i * p), where q(t) is
linearly interpolated between the bracketing IMU orientation samples. The
reference acknowledges translation compensation as TODO
(lidar_distortion_corrector.cpp:34); same rotation-only model here.

One `searchsorted` + gather replaces the per-point DataSearcher binary search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lie import quat_nlerp, quat_to_mat
from ..core.state import ImuSegment


def deskew(
    points: jax.Array,  # [N, 3] lidar-frame points
    rel_times: jax.Array,  # [N] seconds relative to scan reference time
    mask: jax.Array,  # [N]
    ref_time: jax.Array,  # [] absolute scan reference time (s)
    segment: ImuSegment,  # IMU span covering the scan
    t_lidar_to_imu: jax.Array,  # [4, 4]
):
    """Returns (deskewed points [N, 3] in the IMU frame at ref_time, mask)."""
    dtype = points.dtype
    seg_t = jnp.where(segment.mask, segment.t, jnp.inf).astype(dtype)
    n_seg = jnp.sum(segment.mask, dtype=jnp.int32)

    def q_at(t):
        # bracketing index: last sample with seg_t <= t
        j = jnp.clip(jnp.searchsorted(seg_t, t, side="right") - 1, 0, n_seg - 2)
        t0, t1 = seg_t[j], seg_t[j + 1]
        r = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        return quat_nlerp(segment.quat[j].astype(dtype), segment.quat[j + 1].astype(dtype), r)

    q_ref = q_at(ref_time.astype(dtype))
    r_ref_inv = quat_to_mat(q_ref).T

    t_abs = ref_time.astype(dtype) + rel_times
    j = jnp.clip(jnp.searchsorted(seg_t, t_abs, side="right") - 1, 0, n_seg - 2)
    t0 = seg_t[j]
    t1 = seg_t[j + 1]
    r = jnp.clip((t_abs - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    q0 = segment.quat[j].astype(dtype)
    q1 = segment.quat[j + 1].astype(dtype)
    q_t = quat_nlerp(q0, q1, r)
    r_t = quat_to_mat(q_t)  # [N, 3, 3]

    p_imu = points @ t_lidar_to_imu[:3, :3].T + t_lidar_to_imu[:3, 3]
    p_rot = jnp.einsum("nij,nj->ni", r_t, p_imu)
    p_out = p_rot @ r_ref_inv.T
    return p_out, mask
