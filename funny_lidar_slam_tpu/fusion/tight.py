"""Tight LiDAR-IMU coupling: the per-frame 30-dof fusion solve.

Replaces the reference's g2o graph of 10 vertices / 6 edge types
(FrontEnd::Optimize, src/slam/frontend.cpp:250-431; duplicated in
Localization::Optimize, localization.cpp:442-623) with a fixed-structure
analytic Gauss-Newton: residuals and Jacobians of all factors are assembled
directly into the 30x30 normal equations — no graph library.

State ordering (frontend.cpp:388-418):
  [R_i(0) V_i(3) P_i(6) bg_i(9) ba_i(12) R_j(15) V_j(18) P_j(21) bg_j(24) ba_j(27)]

Factors (reference files in fusion/factors docstrings below):
  prior(last 15-dof)              src/optimization/g2o/prior_nav_state_edge.cpp
  lidar rotation (curr R)         rotation_edge.cpp
  lidar position (curr P)         position_edge.cpp
  preintegration (9-dim)          pre_integration_edge.cpp
  gyro / accel bias random walk   gyro_bias_rw_edge.cpp / accel_bias_rw_edge.cpp

All rotation vertices use RIGHT perturbation R <- R Exp(d)
(vertex_type.h:78-81). After the solve, the posterior information is the sum
of per-factor J^T Λ J, and the old state is Schur-marginalized out
(Marginalize(posterior, 0, 14), frontend.cpp:425) to become the next prior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import marginalize, so3_exp, so3_hat, so3_jr, so3_jr_inv, so3_log
from ..core.state import NavState
from ..imu.preintegration import PreintState
from ..ops.lin3 import inv3


class TightFusionConfig(NamedTuple):
    # LM budget: the solve early-exits on convergence; 12 bounds the tail
    # (reference g2o runs 10-15, frontend.cpp:375; measured round 5: 20 -> 12
    # saves ~2 ms/frame with slightly BETTER sim ATE, 0.033 -> 0.026)
    iterations: int = 12
    lidar_rotation_std: float = 0.005
    lidar_position_std: float = 0.01
    gyro_rw_std: float = 1.0e-4
    acc_rw_std: float = 1.0e-4


class FusionStates(NamedTuple):
    r_i: jax.Array
    v_i: jax.Array
    p_i: jax.Array
    bg_i: jax.Array
    ba_i: jax.Array
    r_j: jax.Array
    v_j: jax.Array
    p_j: jax.Array
    bg_j: jax.Array
    ba_j: jax.Array


def _full_j(blocks, edim: int, dtype):
    """Blocks [(state_offset, J[edim, 3])] -> dense J [edim, 30].

    Static offsets, so the scatter is compile-time slicing; the factor's
    H/b contribution then becomes two small matmuls instead of O(blocks^2)
    slice-adds — on TPU the slice-add form costs hundreds of tiny ops per
    assembly (~170 ms/frame measured for the 40 assemblies of the LM loop)."""
    j = jnp.zeros((edim, 30), dtype)
    for off, jb in blocks:
        j = j.at[:, off : off + 3].set(jb)
    return j


def _accumulate(h, b, cost, blocks, lam, err):
    """h += J^T Λ J, b += J^T Λ e, cost += e^T Λ e (matmul form)."""
    j = _full_j(blocks, err.shape[0], err.dtype)
    lam_j = lam @ j
    lam_e = lam @ err
    h = h + j.T @ lam_j
    b = b + j.T @ lam_e
    cost = cost + err @ lam_e
    return h, b, cost


def _preint_residual_blocks(s: FusionStates, pre: PreintState, gravity, dtype):
    """EdgePreIntegration error + Jacobian blocks
    (pre_integration_edge.cpp:18-192)."""
    g = jnp.asarray(gravity, dtype)
    dt = pre.dt
    dbg = s.bg_i - pre.bg
    dba = s.ba_i - pre.ba

    corrected_dr = pre.d_r @ so3_exp(pre.dr_dbg @ dbg)
    e_r = so3_log(corrected_dr.T @ s.r_i.T @ s.r_j)
    e_v = s.r_i.T @ (s.v_j - s.v_i - g * dt) - (pre.d_v + pre.dv_dbg @ dbg + pre.dv_dba @ dba)
    e_p = s.r_i.T @ (s.p_j - s.p_i - s.v_i * dt - 0.5 * g * dt * dt) - (
        pre.d_p + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    )
    err = jnp.concatenate([e_r, e_v, e_p])

    jr_inv = so3_jr_inv(e_r)
    z = jnp.zeros((3, 3), dtype)

    j_ri = jnp.concatenate(
        [
            -jr_inv @ s.r_j.T @ s.r_i,
            so3_hat(s.r_i.T @ (s.v_j - s.v_i - g * dt)),
            so3_hat(s.r_i.T @ (s.p_j - s.p_i - s.v_i * dt - 0.5 * g * dt * dt)),
        ]
    )
    j_vi = jnp.concatenate([z, -s.r_i.T, -s.r_i.T * dt])
    j_pi = jnp.concatenate([z, z, -s.r_i.T])
    j_bg = jnp.concatenate(
        [
            -jr_inv @ so3_exp(e_r).T @ so3_jr(pre.dr_dbg @ dbg) @ pre.dr_dbg,
            -pre.dv_dbg,
            -pre.dp_dbg,
        ]
    )
    j_ba = jnp.concatenate([z, -pre.dv_dba, -pre.dp_dba])
    j_rj = jnp.concatenate([jr_inv, z, z])
    j_vj = jnp.concatenate([z, s.r_i.T, z])
    j_pj = jnp.concatenate([z, z, s.r_i.T])

    blocks = [
        (0, j_ri), (3, j_vi), (6, j_pi), (9, j_bg), (12, j_ba),
        (15, j_rj), (18, j_vj), (21, j_pj),
    ]
    return err, blocks


def _all_factors(
    s: FusionStates,
    last: NavState,
    pre: PreintState,
    lidar_r: jax.Array,
    lidar_p: jax.Array,
    gravity,
    cfg: TightFusionConfig,
    dtype,
):
    """Yield (err, blocks, lam) for every factor in the frame graph."""
    eye3 = jnp.eye(3, dtype=dtype)
    z = jnp.zeros((3, 3), dtype)
    factors = []

    # --- prior on the last nav state (prior_nav_state_edge.cpp) ---
    # error = measure(-)estimate; J_R = Jr(e_rot)^-1, others -I
    e_rot = so3_log(last.r.T @ s.r_i)
    err = jnp.concatenate(
        [e_rot, last.v - s.v_i, last.p - s.p_i, last.bg - s.bg_i, last.ba - s.ba_i]
    )
    z15 = jnp.zeros((15, 3), dtype)
    j_r = z15.at[0:3].set(so3_jr_inv(e_rot))
    j_v = z15.at[3:6].set(-eye3)
    j_p = z15.at[6:9].set(-eye3)
    j_bg = z15.at[9:12].set(-eye3)
    j_ba = z15.at[12:15].set(-eye3)
    factors.append(
        (err, [(0, j_r), (3, j_v), (6, j_p), (9, j_bg), (12, j_ba)], last.info.astype(dtype))
    )

    # --- lidar rotation on current R (rotation_edge.cpp) ---
    e = so3_log(lidar_r.T @ s.r_j)
    lam = eye3 / (cfg.lidar_rotation_std**2)
    factors.append((e, [(15, so3_jr_inv(e))], lam))

    # --- lidar position on current P (position_edge.cpp) ---
    e = lidar_p - s.p_j
    lam = eye3 / (cfg.lidar_position_std**2)
    factors.append((e, [(21, -eye3)], lam))

    # --- preintegration (pre_integration_edge.cpp) ---
    err, blocks = _preint_residual_blocks(s, pre, gravity, dtype)
    # info = cov^-1 (9x9); solve instead of explicit inverse
    lam = jnp.linalg.inv(
        pre.cov + 1e-16 * jnp.eye(9, dtype=dtype)
    )
    factors.append((err, blocks, lam))

    # --- bias random walks (gyro_bias_rw_edge.cpp / accel_bias_rw_edge.cpp) ---
    e = s.bg_j - s.bg_i
    lam = eye3 / (cfg.gyro_rw_std**2)
    factors.append((e, [(9, -eye3), (24, eye3)], lam))
    e = s.ba_j - s.ba_i
    lam = eye3 / (cfg.acc_rw_std**2)
    factors.append((e, [(12, -eye3), (27, eye3)], lam))

    return factors


def _apply_dx(s: FusionStates, dx: jax.Array) -> FusionStates:
    return FusionStates(
        r_i=s.r_i @ so3_exp(dx[0:3]),
        v_i=s.v_i + dx[3:6],
        p_i=s.p_i + dx[6:9],
        bg_i=s.bg_i + dx[9:12],
        ba_i=s.ba_i + dx[12:15],
        r_j=s.r_j @ so3_exp(dx[15:18]),
        v_j=s.v_j + dx[18:21],
        p_j=s.p_j + dx[21:24],
        bg_j=s.bg_j + dx[24:27],
        ba_j=s.ba_j + dx[27:30],
    )


def fuse(
    last: NavState,
    pre: PreintState,
    lidar_pose: jax.Array,
    predict_nav: NavState,
    gravity,
    cfg: TightFusionConfig,
) -> NavState:
    """Run the per-frame fusion and return the current NavState with its
    marginalized prior information (FrontEnd::Optimize semantics).

    `predict_nav` seeds the current vertices (frontend.cpp:216-219 uses the
    IMU-predicted pose/velocity, NOT the lidar pose, as the initial value).
    Bias vertices start at the last state's biases (frontend.cpp:299-319).
    """
    dtype = last.r.dtype
    lidar_r = lidar_pose[:3, :3].astype(dtype)
    lidar_p = lidar_pose[:3, 3].astype(dtype)

    s0 = FusionStates(
        r_i=last.r, v_i=last.v, p_i=last.p, bg_i=last.bg, ba_i=last.ba,
        r_j=predict_nav.r, v_j=predict_nav.v, p_j=predict_nav.p,
        bg_j=last.bg, ba_j=last.ba,
    )

    def _assemble(s: FusionStates):
        h = jnp.zeros((30, 30), dtype)
        b = jnp.zeros(30, dtype)
        cost = jnp.zeros((), dtype)
        for err, blocks, lam in _all_factors(s, last, pre, lidar_r, lidar_p, gravity, cfg, dtype):
            h, b, cost = _accumulate(h, b, cost, blocks, lam, err)
        return 0.5 * (h + h.T), b, cost

    # Levenberg-Marquardt, like the reference's g2o optimizer
    # (frontend.cpp:375-376 runs OptimizationAlgorithmLevenberg): pure GN is
    # NOT safe here — the f32 Schur-marginalized prior can be slightly
    # indefinite (eigenvalues ~ -1e-7 after Jacobi scaling), and a GN
    # iteration then runs away along the negative-curvature bias direction
    # (observed |ba| -> hundreds within one frame). The accept/reject test
    # keeps the cost monotone. H is Jacobi-preconditioned (D^-1/2 H D^-1/2)
    # before the solve — the TPU-friendly alternative to g2o's f64.
    #
    # The carry holds (h, b, cost) of the CURRENT state so each iteration
    # assembles exactly once: an accepted step's trial assembly becomes next
    # iteration's current assembly, a rejected step reuses the previous one
    # (the naive accept/reject shape assembles twice per iteration and once
    # more for the posterior — measured ~120 ms/frame of pure overhead).
    class LmCarry(NamedTuple):
        s: FusionStates
        h: jax.Array
        b: jax.Array
        cost: jax.Array
        lm_lambda: jax.Array
        it: jax.Array
        done: jax.Array

    def lm_cond(c: LmCarry):
        return (c.it < cfg.iterations) & ~c.done

    def lm_step(c: LmCarry) -> LmCarry:
        d_inv = jax.lax.rsqrt(jnp.maximum(jnp.diag(c.h), 1e-12))
        hs = c.h * d_inv[:, None] * d_inv[None, :]
        dx = d_inv * jnp.linalg.solve(
            hs + c.lm_lambda * jnp.eye(30, dtype=dtype), -(c.b * d_inv)
        )
        s_try = _apply_dx(c.s, dx)
        h_try, b_try, cost_try = _assemble(s_try)
        accept = cost_try < c.cost
        pick = lambda a, r: jnp.where(accept, a, r)
        lam_new = jnp.where(accept, jnp.maximum(c.lm_lambda * 0.5, 1e-6),
                            jnp.minimum(c.lm_lambda * 8.0, 1e2))
        # converged when an accepted step barely moves the state; also stop
        # after a rejected step at the lambda ceiling (no progress possible)
        tiny = jnp.linalg.norm(dx) < 1e-6
        stuck = ~accept & (c.lm_lambda >= 1e2)
        return LmCarry(
            s=jax.tree.map(pick, s_try, c.s),
            h=pick(h_try, c.h), b=pick(b_try, c.b),
            cost=pick(cost_try, c.cost),
            lm_lambda=lam_new, it=c.it + 1, done=(accept & tiny) | stuck,
        )

    h0, b0, cost0 = _assemble(s0)
    init = LmCarry(s0, h0, b0, cost0, jnp.asarray(1e-4, dtype),
                   jnp.zeros((), jnp.int32), jnp.asarray(False))
    final = jax.lax.while_loop(lm_cond, lm_step, init)
    s = final.s

    # posterior information at the optimum -> marginalize old state.
    # One fresh assembly: XLA rounds the in-loop (while_loop-fused) assembly
    # slightly differently from an out-of-loop one, and the marginalized
    # prior is sensitive enough that reusing final.h shifted downstream
    # behavior; one 30x30 assembly per frame is cheap — the saving that
    # matters is the per-LM-iteration one above.
    h_fin, _, _ = _assemble(s)
    info_new = marginalize(h_fin, 0, 14)[15:, 15:]
    # an information matrix must be PSD; the f32 Schur complement can leave
    # tiny negative eigenvalues that destabilize the NEXT frame's LM solve,
    # so project back onto the PSD cone unconditionally (the 15x15 eigh
    # measures 0.034 ms on the v5e — a Cholesky witness that skips it was
    # tried and missed sub-rounding indefiniteness, regressing the NDT e2e)
    info_new = 0.5 * (info_new + info_new.T)
    w, v = jnp.linalg.eigh(info_new)
    info_new = (v * jnp.maximum(w, 0.0)) @ v.T

    return NavState(
        r=s.r_j, v=s.v_j, p=s.p_j, bg=s.bg_j, ba=s.ba_j,
        info=info_new, t=predict_nav.t,
    )
