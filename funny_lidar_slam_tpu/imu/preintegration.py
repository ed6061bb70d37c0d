"""Forster-style IMU preintegration as a single `lax.scan`.

TPU-native re-design of the reference PreIntegration class
(src/imu/pre_integration.cpp:24-110): instead of a stateful object fed one
sample at a time from a queue, the whole padded IMU segment of a scan is
integrated in one fused scan on device, producing (dR, dV, dP), the 9x9
covariance, and the five bias Jacobians in one shot.

Semantics match the reference exactly:
  * midpoint (average) gyro/accel between consecutive samples,
  * update order P, V, R using the *previous* dR (pre_integration.cpp:83-85),
  * bias Jacobians updated before the deltas with the previous dR
    (pre_integration.cpp:76-80),
  * noise propagation cov = A cov A^T + B (Sigma/dt) B^T plus integration
    noise on the position block (pre_integration.cpp:60-95).

Covariance/Jacobian state ordering: [rotation(0:3), velocity(3:6),
position(6:9)] — same as the reference.

Validated against the golden matrices of test/preintegration_ut.cpp:47-83.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import so3_exp, so3_hat, so3_jr
from ..core.state import ImuSegment, NavState


class PreintState(NamedTuple):
    """Preintegrated IMU increments between two scans."""

    d_r: jax.Array  # [3, 3]
    d_v: jax.Array  # [3]
    d_p: jax.Array  # [3]
    cov: jax.Array  # [9, 9] (rot, vel, pos)
    dr_dbg: jax.Array  # [3, 3]
    dv_dbg: jax.Array  # [3, 3]
    dv_dba: jax.Array  # [3, 3]
    dp_dbg: jax.Array  # [3, 3]
    dp_dba: jax.Array  # [3, 3]
    dt: jax.Array  # [] total integration time (s)
    bg: jax.Array  # [3] gyro bias used during integration
    ba: jax.Array  # [3] accel bias used during integration

    @staticmethod
    def zero(dtype=jnp.float32, bg=None, ba=None) -> "PreintState":
        z33 = jnp.zeros((3, 3), dtype)
        z3 = jnp.zeros(3, dtype)
        return PreintState(
            d_r=jnp.eye(3, dtype=dtype),
            d_v=z3,
            d_p=z3,
            cov=jnp.zeros((9, 9), dtype),
            dr_dbg=z33,
            dv_dbg=z33,
            dv_dba=z33,
            dp_dbg=z33,
            dp_dba=z33,
            dt=jnp.zeros((), dtype),
            bg=z3 if bg is None else jnp.asarray(bg, dtype),
            ba=z3 if ba is None else jnp.asarray(ba, dtype),
        )


class PreintParams(NamedTuple):
    """Noise parameters (reference: PreIntegration::ConfigPara)."""

    gyro_noise_var: jax.Array  # [3] gyro noise std^2
    acc_noise_var: jax.Array  # [3]
    integration_noise_var: jax.Array  # [3] position integration noise cov

    @staticmethod
    def from_std(gyro_std, acc_std, integration_cov=1.0e-8, dtype=jnp.float32):
        g = jnp.broadcast_to(jnp.asarray(gyro_std, dtype) ** 2, (3,))
        a = jnp.broadcast_to(jnp.asarray(acc_std, dtype) ** 2, (3,))
        i = jnp.broadcast_to(jnp.asarray(integration_cov, dtype), (3,))
        return PreintParams(g, a, i)


def _step(state: PreintState, inp, params: PreintParams) -> PreintState:
    """One midpoint integration step (pre_integration.cpp:24-96)."""
    dt, gyro0, acc0, gyro1, acc1, valid = inp
    dtype = state.d_r.dtype

    gyro = 0.5 * (gyro0 + gyro1) - state.bg
    acc = 0.5 * (acc0 + acc1) - state.ba

    safe_dt = jnp.maximum(dt, jnp.asarray(1e-9, dtype))

    r_step = so3_exp(gyro * dt)
    acc_hat = so3_hat(acc)
    jr = so3_jr(gyro * dt)

    d_r, d_v, d_p = state.d_r, state.d_v, state.d_p

    # noise transfer matrices (formula (13) in the reference's derivation)
    eye3 = jnp.eye(3, dtype=dtype)
    a_mat = jnp.zeros((9, 9), dtype)
    a_mat = a_mat.at[0:3, 0:3].set(r_step.T)
    a_mat = a_mat.at[3:6, 0:3].set(-d_r @ acc_hat * dt)
    a_mat = a_mat.at[6:9, 0:3].set(-0.5 * d_r @ acc_hat * dt * dt)
    a_mat = a_mat.at[3:6, 3:6].set(eye3)
    a_mat = a_mat.at[6:9, 3:6].set(dt * eye3)
    a_mat = a_mat.at[6:9, 6:9].set(eye3)

    b_mat = jnp.zeros((9, 6), dtype)
    b_mat = b_mat.at[0:3, 0:3].set(jr * dt)
    b_mat = b_mat.at[3:6, 3:6].set(d_r * dt)
    b_mat = b_mat.at[6:9, 3:6].set(0.5 * d_r * dt * dt)

    # bias Jacobians before delta updates (pre_integration.cpp:76-80)
    dp_dbg = state.dp_dbg + state.dv_dbg * dt - 0.5 * d_r @ acc_hat @ state.dr_dbg * dt * dt
    dp_dba = state.dp_dba + state.dv_dba * dt - 0.5 * d_r * dt * dt
    dv_dbg = state.dv_dbg - d_r @ acc_hat @ state.dr_dbg * dt
    dv_dba = state.dv_dba - d_r * dt
    dr_dbg = r_step.T @ state.dr_dbg - jr * dt

    # delta updates in the order P, V, R (pre_integration.cpp:83-85)
    new_d_p = d_p + d_v * dt + 0.5 * d_r @ acc * dt * dt
    new_d_v = d_v + d_r @ acc * dt
    new_d_r = d_r @ r_step

    noise = jnp.concatenate([params.gyro_noise_var, params.acc_noise_var]).astype(dtype)
    cov = a_mat @ state.cov @ a_mat.T + b_mat @ ((noise / safe_dt)[:, None] * b_mat.T)
    cov = cov.at[6:9, 6:9].add(jnp.diag(params.integration_noise_var.astype(dtype)) * dt)

    new = PreintState(
        d_r=new_d_r,
        d_v=new_d_v,
        d_p=new_d_p,
        cov=cov,
        dr_dbg=dr_dbg,
        dv_dbg=dv_dbg,
        dv_dba=dv_dba,
        dp_dbg=dp_dbg,
        dp_dba=dp_dba,
        dt=state.dt + dt,
        bg=state.bg,
        ba=state.ba,
    )
    # masked-out (padded) samples leave the state untouched
    return jax.tree.map(lambda n, o: jnp.where(valid, n, o), new, state)


def preintegrate(
    segment: ImuSegment,
    params: PreintParams,
    bg: jax.Array,
    ba: jax.Array,
    init: PreintState | None = None,
) -> PreintState:
    """Integrate a padded IMU segment in one `lax.scan`.

    `segment` rows must be time-ordered; `segment.mask` marks valid samples.
    Equivalent to PreIntegration::IntegrateDataSegment
    (src/imu/pre_integration.cpp:16-22) with the first valid sample seeding
    `last_imu_data_`.
    """
    dtype = segment.gyro.dtype
    if init is None:
        state = PreintState.zero(dtype, bg=bg, ba=ba)
    else:
        state = init._replace(bg=jnp.asarray(bg, dtype), ba=jnp.asarray(ba, dtype))

    t = segment.t.astype(dtype)
    dts = t[1:] - t[:-1]
    valid = (segment.mask[1:] & segment.mask[:-1]) & (dts > 0)
    inputs = (
        dts,
        segment.gyro[:-1],
        segment.accel[:-1],
        segment.gyro[1:],
        segment.accel[1:],
        valid,
    )

    def body(carry, inp):
        return _step(carry, inp, params), None

    final, _ = jax.lax.scan(body, state, inputs)
    return final


def predict(state: PreintState, nav: NavState, gravity: jax.Array) -> NavState:
    """Propagate the last nav state through the preintegrated increments.

    (reference: PreIntegration::Predict, src/imu/pre_integration.cpp:98-110)
    """
    dt = state.dt
    g = jnp.asarray(gravity, state.d_v.dtype)
    p = nav.r @ state.d_p + nav.p + nav.v * dt + 0.5 * g * dt * dt
    v = nav.r @ state.d_v + nav.v + g * dt
    r = nav.r @ state.d_r
    return nav._replace(r=r, v=v, p=p)
