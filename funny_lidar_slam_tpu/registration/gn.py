"""Shared Gauss-Newton iteration driver for all scan-to-map matchers.

The reference implements the same skeleton five times (per-matcher `Match`
loops, e.g. icp_optimized.h:65-163, loam_full_kdtree.h:106-204,
incremental_ndt.h:229-337): iterate {evaluate residuals -> reduce H,g ->
solve 6x6 -> apply update -> convergence test}. Here it is one
`lax.while_loop` with the whole loop body on device — the convergence check
never syncs to the host (SURVEY.md §7 "hard parts").

Update conventions (matching the reference exactly, see residuals.py):
  UPDATE_ICP:  dx = [t, r]; P += dt; R := R Exp(dr)
  UPDATE_LOAM: dx = [r, t]; R := Exp(dr) R; P += dt
  UPDATE_NDT:  dx = [r, t]; R := R Exp(dr); P += dt

Convergence (loam_full_kdtree.h:159-176): |dx_rot| < eps_r and |dx_pos| <
eps_p, or the change of both norms between iterations < 1e-4 (stall).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import so3_exp
from ..ops.lin3 import solve6_damped
from .residuals import HG

UPDATE_ICP = "icp"
UPDATE_LOAM = "loam"
UPDATE_NDT = "ndt"


class GNConfig(NamedTuple):
    max_iters: int = 30
    rotation_eps: float = 0.05
    position_eps: float = 0.01
    stall_eps: float = 1.0e-4
    update: str = UPDATE_LOAM
    use_stall_check: bool = True  # LOAM matchers only in the reference
    # convergence requires at least this many valid correspondences (the
    # reference's det(H)==0 'continue' guard, icp_optimized.h:130-132)
    min_valid: int = 10


class GNResult(NamedTuple):
    t_mat: jax.Array  # [4, 4] final pose
    converged: jax.Array  # [] bool (dx-based convergence reached)
    iters: jax.Array  # [] int32
    num_valid: jax.Array  # [] int32 valid correspondences at last iteration
    total_res: jax.Array  # [] residual sum at last iteration


def apply_update(t_mat: jax.Array, dx: jax.Array, update: str) -> jax.Array:
    out = t_mat
    if update == UPDATE_ICP:
        dt, dr = dx[:3], dx[3:]
        out = out.at[:3, 3].add(dt)
        out = out.at[:3, :3].set(t_mat[:3, :3] @ so3_exp(dr))
    elif update == UPDATE_LOAM:
        dr, dt = dx[:3], dx[3:]
        out = out.at[:3, :3].set(so3_exp(dr) @ t_mat[:3, :3])
        out = out.at[:3, 3].add(dt)
    elif update == UPDATE_NDT:
        dr, dt = dx[:3], dx[3:]
        out = out.at[:3, :3].set(t_mat[:3, :3] @ so3_exp(dr))
        out = out.at[:3, 3].add(dt)
    else:
        raise ValueError(update)
    return out


def _dx_split(dx: jax.Array, update: str):
    if update == UPDATE_ICP:
        return dx[3:], dx[:3]  # (rot, pos)
    return dx[:3], dx[3:]


def run_gn(hg_fn: Callable[[jax.Array], HG], t0: jax.Array, cfg: GNConfig) -> GNResult:
    """Iterate GN from `t0` with residual evaluator `hg_fn(T) -> HG`."""
    dtype = t0.dtype
    big = jnp.asarray(1e9, dtype)

    class Carry(NamedTuple):
        t_mat: jax.Array
        it: jax.Array
        done: jax.Array
        converged: jax.Array
        last_rot: jax.Array
        last_pos: jax.Array
        num_valid: jax.Array
        total_res: jax.Array

    def cond(c: Carry):
        return (c.it < cfg.max_iters) & ~c.done

    def body(c: Carry):
        hg = hg_fn(c.t_mat)
        dx = solve6_damped(hg.h, hg.g)
        t_new = apply_update(c.t_mat, dx, cfg.update)
        rot, pos = _dx_split(dx, cfg.update)
        rn, pn = jnp.linalg.norm(rot), jnp.linalg.norm(pos)
        enough = hg.num_valid >= cfg.min_valid
        conv = (rn < cfg.rotation_eps) & (pn < cfg.position_eps) & enough
        stall = (
            (jnp.abs(rn - c.last_rot) < cfg.stall_eps)
            & (jnp.abs(pn - c.last_pos) < cfg.stall_eps)
            if cfg.use_stall_check
            else jnp.asarray(False)
        )
        return Carry(
            t_mat=t_new,
            it=c.it + 1,
            done=conv | stall,
            converged=conv | (stall & enough),
            last_rot=rn,
            last_pos=pn,
            num_valid=hg.num_valid,
            total_res=hg.total_res,
        )

    init = Carry(
        t_mat=t0,
        it=jnp.zeros((), jnp.int32),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
        last_rot=big,
        last_pos=big,
        num_valid=jnp.zeros((), jnp.int32),
        total_res=jnp.zeros((), dtype),
    )
    final = jax.lax.while_loop(cond, body, init)
    return GNResult(final.t_mat, final.converged, final.it, final.num_valid, final.total_res)
