"""Error-state Kalman filter LiDAR-IMU fusion.

The reference declares this fusion mode (`TightCouplingKF`,
include/common/constant_variable.h:27-29) but aborts with
`LOG(FATAL) << "Kalman filter will be supported soon!"`
(src/slam/frontend.cpp:200-201). Implemented here in the FAST-LIO style the
reference's iVox frontend is modeled after: 15-dof error state
[dR, dV, dP, dbg, dba], IMU propagation as one `lax.scan`, and a pose-
measurement update from the scan matcher.

Error-state conventions: right perturbation R = R_hat Exp(dR); gravity is a
known constant (from the static initializer).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import so3_exp, so3_hat, so3_jr_inv, so3_log
from ..core.state import ImuSegment, NavState


class EskfParams(NamedTuple):
    gyro_noise_var: jax.Array  # [3]
    acc_noise_var: jax.Array  # [3]
    gyro_rw_var: jax.Array  # [3] bias random walk
    acc_rw_var: jax.Array  # [3]

    @staticmethod
    def from_std(gyro_std, acc_std, gyro_rw_std=1e-4, acc_rw_std=1e-4, dtype=jnp.float32):
        b = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype) ** 2, (3,))
        return EskfParams(b(gyro_std), b(acc_std), b(gyro_rw_std), b(acc_rw_std))


class EskfState(NamedTuple):
    nav: NavState  # mean (info field unused; cov below is the truth)
    cov: jax.Array  # [15, 15] error covariance [dR, dV, dP, dbg, dba]


def create(nav: NavState, init_cov_diag=None) -> EskfState:
    dtype = nav.r.dtype
    if init_cov_diag is None:
        d = jnp.concatenate([
            jnp.full(3, 1e-6, dtype), jnp.full(3, 1e-2, dtype), jnp.full(3, 1e-6, dtype),
            jnp.full(3, 1e-6, dtype), jnp.full(3, 1e-4, dtype),
        ])
    else:
        d = jnp.asarray(init_cov_diag, dtype)
    return EskfState(nav=nav, cov=jnp.diag(d))


def predict(s: EskfState, segment: ImuSegment, params: EskfParams, gravity) -> EskfState:
    """Propagate mean + covariance through the padded IMU segment."""
    dtype = s.nav.r.dtype
    g = jnp.asarray(gravity, dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    t = segment.t.astype(dtype)
    dts = t[1:] - t[:-1]
    valid = (segment.mask[1:] & segment.mask[:-1]) & (dts > 0)
    inputs = (dts, segment.gyro[:-1].astype(dtype), segment.accel[:-1].astype(dtype),
              segment.gyro[1:].astype(dtype), segment.accel[1:].astype(dtype), valid)

    def step(carry, inp):
        r, v, p, bg, ba, cov = carry
        dt, g0, a0, g1, a1, ok = inp
        gyro = 0.5 * (g0 + g1) - bg
        acc = 0.5 * (a0 + a1) - ba

        r_step = so3_exp(gyro * dt)
        acc_world = r @ acc

        new_r = r @ r_step
        new_v = v + (acc_world + g) * dt
        new_p = p + v * dt + 0.5 * (acc_world + g) * dt * dt

        # error-state transition (right-perturbation ESKF)
        f = jnp.eye(15, dtype=dtype)
        f = f.at[0:3, 0:3].set(r_step.T)
        f = f.at[0:3, 9:12].set(-eye3 * dt)
        f = f.at[3:6, 0:3].set(-r @ so3_hat(acc) * dt)
        f = f.at[3:6, 12:15].set(-r * dt)
        f = f.at[6:9, 3:6].set(eye3 * dt)

        q = jnp.zeros((15, 15), dtype)
        q = q.at[0:3, 0:3].set(jnp.diag(params.gyro_noise_var) * dt)
        q = q.at[3:6, 3:6].set(jnp.diag(params.acc_noise_var) * dt)
        q = q.at[9:12, 9:12].set(jnp.diag(params.gyro_rw_var) * dt)
        q = q.at[12:15, 12:15].set(jnp.diag(params.acc_rw_var) * dt)

        new_cov = f @ cov @ f.T + q
        new = (new_r, new_v, new_p, bg, ba, new_cov)
        out = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, carry)
        return out, None

    init = (s.nav.r, s.nav.v, s.nav.p, s.nav.bg, s.nav.ba, s.cov)
    (r, v, p, bg, ba, cov), _ = jax.lax.scan(step, init, inputs)
    return EskfState(nav=s.nav._replace(r=r, v=v, p=p, bg=bg, ba=ba), cov=cov)


def update_pose(
    s: EskfState,
    pose_meas: jax.Array,  # [4, 4] matcher pose
    rot_std: float,
    pos_std: float,
) -> EskfState:
    """Kalman update with the scan-match pose measurement.

    Measurement residual (same factors as the tight fusion's lidar edges,
    rotation_edge.cpp / position_edge.cpp):
      r_rot = Log(R_meas^T R_hat), H_rot = Jr(r_rot)^-1 on the dR block
      r_pos = p_hat - p_meas,      H_pos = I on the dP block
    Injected on the right: R <- R Exp(-dx_R) ... actually x <- x (-) dx with
    dx = K r (standard ESKF correction of the error estimate).
    """
    dtype = s.nav.r.dtype
    r_meas = pose_meas[:3, :3].astype(dtype)
    p_meas = pose_meas[:3, 3].astype(dtype)

    e_rot = so3_log(r_meas.T @ s.nav.r)
    e_pos = s.nav.p - p_meas
    resid = jnp.concatenate([e_rot, e_pos])  # [6]

    h = jnp.zeros((6, 15), dtype)
    h = h.at[0:3, 0:3].set(so3_jr_inv(e_rot))
    h = h.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype))

    r_cov = jnp.diag(
        jnp.concatenate([jnp.full(3, rot_std**2, dtype), jnp.full(3, pos_std**2, dtype)])
    )

    pht = s.cov @ h.T
    innov = h @ pht + r_cov
    k = pht @ jnp.linalg.inv(innov)  # [15, 6]
    dx = k @ resid  # correction of the error state

    new_r = s.nav.r @ so3_exp(-dx[0:3])
    new_v = s.nav.v - dx[3:6]
    new_p = s.nav.p - dx[6:9]
    new_bg = s.nav.bg - dx[9:12]
    new_ba = s.nav.ba - dx[12:15]

    ikh = jnp.eye(15, dtype=dtype) - k @ h
    new_cov = ikh @ s.cov @ ikh.T + k @ r_cov @ k.T  # Joseph form

    nav = s.nav._replace(r=new_r, v=new_v, p=new_p, bg=new_bg, ba=new_ba)
    return EskfState(nav=nav, cov=new_cov)
