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
    # correspondence-cache schedule: the NN gather + surface fit runs every
    # `corr_every` iterations; the iterations in between re-linearize on the
    # frozen matches (classic two-loop ICP; 1 = the reference's
    # search-every-iteration semantics). Convergence only counts on a fresh
    # gather — a converged stale iteration forces a re-gather instead.
    corr_every: int = 1
    # trust-region re-gather skip: if the pose has moved less than
    # `skip_regather_dist` metres since the candidates were gathered
    # (translation + rotation scaled by the scene radius), re-selection
    # among the cached candidates is exact to within the candidate margin,
    # so both the corr_every refresh AND the convergence-confirm gather are
    # skipped — a converged stale iteration inside the trust region is
    # final. With an IMU-predicted t0 the typical solve then runs ONE
    # stencil gather instead of three (the gather is the GN iteration on
    # the v5e, docs/ROOFLINE.md kernel 1). 0 disables the skip (round-2
    # semantics: every refresh fires, convergence only fresh).
    skip_regather_dist: float = 0.0
    # fallback rotation-displacement radius; callers should pass the actual
    # source max range to run_gn_corr(`regather_radius`) instead — far
    # points move by theta*range under rotation, so a fixed radius smaller
    # than the true range understates displacement and can declare
    # convergence on stale candidate sets (round-3 advisor finding)
    regather_radius: float = 20.0


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
    """Iterate GN from `t0` with residual evaluator `hg_fn(T) -> HG`
    (re-gathers correspondences every iteration, the reference semantics)."""
    return run_gn_corr(lambda t: None, lambda t, _corr: hg_fn(t), t0,
                       cfg._replace(corr_every=1))


def run_gn_corr(
    corr_fn: Callable[[jax.Array], object],
    hg_fn: Callable[[jax.Array, object], HG],
    t0: jax.Array,
    cfg: GNConfig,
    regather_radius: jax.Array | float | None = None,
) -> GNResult:
    """Two-loop GN: `corr_fn(T)` produces the (expensive) correspondence set,
    `hg_fn(T, corr)` linearizes on it. The gather runs on iteration 0 and
    then every `cfg.corr_every` iterations — or immediately after an
    iteration that converged on stale matches, so `converged` is only ever
    declared against freshly gathered correspondences.

    The stale-iteration bodies are pure [N]-vector arithmetic + a 6x6 solve;
    on the v5e the gather is ~90% of an iteration, so corr_every=k cuts the
    GN wall clock by nearly k for gather-bound matchers."""
    dtype = t0.dtype
    big = jnp.asarray(1e9, dtype)
    # rotation-displacement radius for the trust region: the caller's
    # (possibly traced) source max range, falling back to the config value
    radius = jnp.asarray(
        cfg.regather_radius if regather_radius is None else regather_radius,
        dtype,
    )
    # max_iters bounds GATHERS (one reference iteration = one correspondence
    # search); the cheap stale relinearizations get their own looser bound
    max_total = cfg.max_iters * max(int(cfg.corr_every), 1)

    class Carry(NamedTuple):
        t_mat: jax.Array
        t_gather: jax.Array  # pose at which the candidates were gathered
        corr: object
        it: jax.Array  # total linearizations (cheap)
        gathers: jax.Array  # correspondence searches (expensive)
        since_gather: jax.Array  # iterations since the matches were gathered
        force_gather: jax.Array  # converged on stale matches -> re-gather now
        done: jax.Array
        converged: jax.Array
        last_rot: jax.Array
        last_pos: jax.Array
        num_valid: jax.Array
        total_res: jax.Array

    def cond(c: Carry):
        return (c.gathers < cfg.max_iters) & (c.it < max_total) & ~c.done

    def body(c: Carry):
        if cfg.skip_regather_dist > 0.0:
            # pose displacement since the gather: translation + small-angle
            # rotation scaled by the source max range
            # (|dR - I|_F = 2 sqrt(2) sin(theta/2) ~= sqrt(2) theta)
            dt = jnp.linalg.norm(c.t_mat[:3, 3] - c.t_gather[:3, 3])
            dr = c.t_mat[:3, :3] @ c.t_gather[:3, :3].T
            theta = jnp.linalg.norm(dr - jnp.eye(3, dtype=dtype)) / jnp.sqrt(
                jnp.asarray(2.0, dtype))
            moved = dt + theta * radius > cfg.skip_regather_dist
        else:
            moved = jnp.asarray(True)
        want = (c.since_gather >= cfg.corr_every) | c.force_gather
        refresh = (want & moved) | (c.it == 0)
        corr = jax.lax.cond(refresh, corr_fn, lambda _t: c.corr, c.t_mat)
        hg = hg_fn(c.t_mat, corr)
        dx = solve6_damped(hg.h, hg.g)
        t_new = apply_update(c.t_mat, dx, cfg.update)
        rot, pos = _dx_split(dx, cfg.update)
        rn, pn = jnp.linalg.norm(rot), jnp.linalg.norm(pos)
        enough = hg.num_valid >= cfg.min_valid
        conv = (rn < cfg.rotation_eps) & (pn < cfg.position_eps) & enough
        # linearizations that are fresh OR still inside the trust region
        # (re-selection provably matches a fresh gather) count as exact
        exact = refresh | ~moved
        # the stall test compares successive dx norms of EXACT linearizations
        # (loam_full_kdtree.h:159-176 semantics — every reference iteration
        # is fresh; in-region stale iterations are treated as fresh
        # everywhere else, and excluding them would make the stall exit
        # unreachable while the pose oscillates inside the trust region,
        # burning all max_iters*corr_every iterations and dropping the scan
        # — round-3 advisor finding)
        stall = (
            exact
            & (jnp.abs(rn - c.last_rot) < cfg.stall_eps)
            & (jnp.abs(pn - c.last_pos) < cfg.stall_eps)
            if cfg.use_stall_check
            else jnp.asarray(False)
        )
        settled = conv | stall
        # a solve may end on any exact iteration; a settled stale iteration
        # outside the region triggers an immediate re-gather instead
        return Carry(
            t_mat=t_new,
            t_gather=jnp.where(refresh, c.t_mat, c.t_gather),
            corr=corr,
            it=c.it + 1,
            gathers=c.gathers + refresh.astype(jnp.int32),
            since_gather=jnp.where(refresh, 1, c.since_gather + 1),
            force_gather=settled & ~exact,
            done=settled & exact,
            converged=(conv | (stall & enough)) & exact,
            last_rot=jnp.where(exact, rn, c.last_rot),
            last_pos=jnp.where(exact, pn, c.last_pos),
            num_valid=hg.num_valid,
            total_res=hg.total_res,
        )

    corr0 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(corr_fn, t0)
    )
    init = Carry(
        t_mat=t0,
        t_gather=t0,
        corr=corr0,
        it=jnp.zeros((), jnp.int32),
        gathers=jnp.zeros((), jnp.int32),
        since_gather=jnp.zeros((), jnp.int32),
        force_gather=jnp.asarray(False),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
        last_rot=big,
        last_pos=big,
        num_valid=jnp.zeros((), jnp.int32),
        total_res=jnp.zeros((), dtype),
    )
    final = jax.lax.while_loop(cond, body, init)
    return GNResult(final.t_mat, final.converged, final.gathers, final.num_valid, final.total_res)
