"""Pose-only optimization: the per-frame PnL/PnP refine of the tracking path.

SURVEY §4.2: ``PoseOptimization(frame)`` — LM over a single SE(3) pose with
landmarks held fixed, 4 rounds with chi-squared outlier re-gating between
rounds (the reference-class behavior). Implemented as one jitted program:
``lax.scan`` over rounds, each round = inner LM iterations + mask update.

Fully vmap-able over a batch of frames (used by the multi-sequence batched
mapping configuration, SURVEY §3.3 item 3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.backend.residuals import huber_weight, line_residual, point_residual
from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.se3 import se3_retract

_EPS = 1e-8


class PoseOptConfig(NamedTuple):
    rounds: int = 4
    iters_per_round: int = 4
    lam0: float = 1e-3
    huber_line: float = 2.0
    huber_point: float = 2.45
    chi2_line: float = 7.378  # 95% for 2 DoF (reference-class thresholds)
    chi2_point: float = 5.991


class PoseOptResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4)
    inlier_lines: jnp.ndarray  # (KL,) final line-observation inlier mask
    inlier_points: jnp.ndarray  # (KP,)
    cost: jnp.ndarray  # final robust cost
    num_inliers: jnp.ndarray  # total inlier count (int32)


def _residuals_jacobians(T, lines, l_endpoints, l_sigma, points, p_uv, p_sigma, cam):
    def lr(Lw, ep):
        f = lambda xi: line_residual(xi, jnp.zeros(4), T, Lw, ep, cam)
        return f(jnp.zeros(6)), jax.jacfwd(f)(jnp.zeros(6))

    rl, Jl = jax.vmap(lr)(lines, l_endpoints)
    rl = rl / l_sigma[:, None]
    Jl = Jl / l_sigma[:, None, None]

    def pr(Xw, uv):
        f = lambda xi: point_residual(xi, jnp.zeros(3), T, Xw, uv, cam)
        return f(jnp.zeros(6)), jax.jacfwd(f)(jnp.zeros(6))

    rp, Jp = jax.vmap(pr)(points, p_uv)
    rp = rp / p_sigma[:, None]
    Jp = Jp / p_sigma[:, None, None]
    return rl, Jl, rp, Jp


def _whitened(T, lines, l_endpoints, l_sigma, points, p_uv, p_sigma, cam):
    rl = jax.vmap(lambda Lw, ep: line_residual(jnp.zeros(6), jnp.zeros(4), T, Lw, ep, cam))(
        lines, l_endpoints
    ) / l_sigma[:, None]
    rp = jax.vmap(lambda Xw, uv: point_residual(jnp.zeros(6), jnp.zeros(3), T, Xw, uv, cam))(
        points, p_uv
    ) / p_sigma[:, None]
    return rl, rp


def pose_optimize(
    T_init: jnp.ndarray,
    lines: jnp.ndarray,  # (KL, 6) world Pluecker lines matched to this frame
    l_endpoints: jnp.ndarray,  # (KL, 2, 2) detected segment endpoints
    l_valid: jnp.ndarray,  # (KL,)
    points: jnp.ndarray,  # (KP, 3)
    p_uv: jnp.ndarray,  # (KP, 2)
    p_valid: jnp.ndarray,  # (KP,)
    cam: Intrinsics,
    cfg: PoseOptConfig = PoseOptConfig(),
    l_sigma: jnp.ndarray | None = None,
    p_sigma: jnp.ndarray | None = None,
) -> PoseOptResult:
    """Optimize one camera pose against fixed landmarks with outlier re-gating."""
    KL = lines.shape[0]
    KP = points.shape[0]
    if l_sigma is None:
        l_sigma = jnp.ones((KL,), T_init.dtype)
    if p_sigma is None:
        p_sigma = jnp.ones((KP,), T_init.dtype)

    def robust_cost(T, ml, mp):
        rl, rp = _whitened(T, lines, l_endpoints, l_sigma, points, p_uv, p_sigma, cam)

        def huber(sq, delta):
            n = jnp.sqrt(sq + _EPS)
            return jnp.where(n <= delta, sq, 2.0 * delta * n - delta * delta)

        return jnp.sum(huber(jnp.sum(rl * rl, -1), cfg.huber_line) * ml) + jnp.sum(
            huber(jnp.sum(rp * rp, -1), cfg.huber_point) * mp
        )

    def lm_iter(carry, _):
        T, lam, cost, ml, mp = carry
        rl, Jl, rp, Jp = _residuals_jacobians(
            T, lines, l_endpoints, l_sigma, points, p_uv, p_sigma, cam
        )
        wl = huber_weight(jnp.linalg.norm(rl, -1), cfg.huber_line) * ml
        wp = huber_weight(jnp.linalg.norm(rp, -1), cfg.huber_point) * mp
        H = jnp.einsum("oia,o,oib->ab", Jl, wl, Jl) + jnp.einsum(
            "oia,o,oib->ab", Jp, wp, Jp
        )
        b = -(jnp.einsum("oia,o,oi->a", Jl, wl, rl) + jnp.einsum("oia,o,oi->a", Jp, wp, rp))
        Hd = H + lam * jnp.diag(jnp.diag(H)) + _EPS * jnp.eye(6, dtype=H.dtype)
        dx = jnp.linalg.solve(Hd, b)
        T_cand = se3_retract(T, dx)
        new_cost = robust_cost(T_cand, ml, mp)
        accept = new_cost < cost
        T_next = jnp.where(accept, T_cand, T)
        lam_next = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e4)
        cost_next = jnp.where(accept, new_cost, cost)
        return (T_next, lam_next, cost_next, ml, mp), None

    def round_body(carry, _):
        T, ml, mp = carry
        lam0 = jnp.asarray(cfg.lam0, T.dtype)
        cost0 = robust_cost(T, ml, mp)
        (T, _, _, _, _), _ = jax.lax.scan(
            lm_iter, (T, lam0, cost0, ml, mp), None, length=cfg.iters_per_round
        )
        # chi2 re-gating against the *original* candidate sets (observations
        # can be re-admitted if the refined pose explains them, matching the
        # reference-class behavior)
        rl, rp = _whitened(T, lines, l_endpoints, l_sigma, points, p_uv, p_sigma, cam)
        ml = (jnp.sum(rl * rl, -1) < cfg.chi2_line).astype(T.dtype) * l_valid
        mp = (jnp.sum(rp * rp, -1) < cfg.chi2_point).astype(T.dtype) * p_valid
        return (T, ml, mp), None

    (T, ml, mp), _ = jax.lax.scan(
        round_body, (T_init, l_valid, p_valid), None, length=cfg.rounds
    )
    return PoseOptResult(
        pose=T,
        inlier_lines=ml,
        inlier_points=mp,
        cost=robust_cost(T, ml, mp),
        num_inliers=(jnp.sum(ml) + jnp.sum(mp)).astype(jnp.int32),
    )
