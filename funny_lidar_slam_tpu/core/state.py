"""Navigation-state containers (pytrees).

TPU-native equivalent of the reference's NavStateData
(include/common/sensor_data_type.h:36-62): rotation, velocity, position,
gyro/accel biases, and the 15x15 information matrix of the rolling prior.
Stored as plain arrays so the whole state threads through `jax.jit` /
`lax.scan` unchanged.

State ordering convention (matches the reference fusion graph,
src/slam/frontend.cpp:262-319): [R(3), V(3), P(3), bg(3), ba(3)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lie import make_se3


class NavState(NamedTuple):
    """Single navigation state. All arrays may carry leading batch dims."""

    r: jax.Array  # [..., 3, 3] rotation body->world
    v: jax.Array  # [..., 3] velocity in world
    p: jax.Array  # [..., 3] position in world
    bg: jax.Array  # [..., 3] gyro bias
    ba: jax.Array  # [..., 3] accel bias
    info: jax.Array  # [..., 15, 15] prior information matrix
    t: jax.Array  # [...] timestamp, seconds (f64 on host, f32 on device)

    @property
    def pose(self) -> jax.Array:
        return make_se3(self.r, self.p)

    @staticmethod
    def identity(dtype=jnp.float32, batch: tuple = ()) -> "NavState":
        return NavState(
            r=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
            v=jnp.zeros(batch + (3,), dtype),
            p=jnp.zeros(batch + (3,), dtype),
            bg=jnp.zeros(batch + (3,), dtype),
            ba=jnp.zeros(batch + (3,), dtype),
            info=jnp.zeros(batch + (15, 15), dtype),
            t=jnp.zeros(batch, dtype),
        )

    def with_pose(self, t_mat: jax.Array) -> "NavState":
        return self._replace(r=t_mat[..., :3, :3], p=t_mat[..., :3, 3])


class ImuSegment(NamedTuple):
    """A padded span of IMU samples covering one lidar scan.

    TPU equivalent of the reference's `std::vector<IMUData>` slice produced by
    IMUDataSearcher::GetDataSegment (include/imu/imu_data_searcher.h:16-119):
    fixed capacity, boundary samples interpolated, `mask` marks valid rows.
    """

    t: jax.Array  # [..., N] seconds
    gyro: jax.Array  # [..., N, 3]
    accel: jax.Array  # [..., N, 3]
    quat: jax.Array  # [..., N, 4] orientation (w,x,y,z); identity if 6-axis
    mask: jax.Array  # [..., N] bool
