"""Batched Levenberg-Marquardt with explicit Schur elimination of landmarks.

The g2o/Ceres replacement (SURVEY §2 L4, §5 "LM with Schur"): one jitted XLA
program per problem capacity bucket. Problem layout is fixed-capacity and
mask-padded (SURVEY §9.4 item 2):

- ``P`` poses (SE(3), 6-DoF tangent, gauge-fixed poses masked via
  ``pose_free``), ``L`` line landmarks (Pluecker, 4-DoF orthonormal tangent),
  ``M`` point landmarks (3-DoF), ``OL``/``OP`` line/point observations.
- Per-observation 2-vector residuals and Jacobians come from vmapped
  ``jax.jacfwd`` through the retractions at zero tangent.
- Hessian assembly is scatter-free: ``jax.ops.segment_sum`` into block
  structures; the pose-landmark coupling ``W[l, p] = J_p^T J_l`` is stored
  dense over (landmark, pose) pairs — MXU-friendly einsums produce the
  reduced camera system

      S = Hpp - sum_l W_l Hll_l^-1 W_l^T,   S dp = bp - W Hll^-1 bl

  solved by Cholesky; landmark increments by back-substitution.
- Robustness: Huber IRLS weights, Marquardt damping with accept/reject,
  per-observation measurement sigmas (pyramid level), all inside a
  ``lax.scan`` — no host round-trips during the solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.backend.residuals import huber_weight, line_residual, point_residual
from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.plucker import plucker_normalize, plucker_retract
from tpuslam.geometry.se3 import se3_retract

_EPS = 1e-8


class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem (a pytree of arrays)."""

    poses: jnp.ndarray  # (P, 4, 4) T_cw linearization points
    pose_free: jnp.ndarray  # (P,) 1.0 = optimized, 0.0 = held fixed (gauge)
    lines: jnp.ndarray  # (L, 6) Pluecker world lines
    line_valid: jnp.ndarray  # (L,)
    points: jnp.ndarray  # (M, 3) world points
    point_valid: jnp.ndarray  # (M,)
    # line observations, padded to OL
    l_pose: jnp.ndarray  # (OL,) int32
    l_line: jnp.ndarray  # (OL,) int32
    l_endpoints: jnp.ndarray  # (OL, 2, 2) detected segment endpoints (px)
    l_valid: jnp.ndarray  # (OL,)
    l_sigma: jnp.ndarray  # (OL,) measurement std in px
    # point observations, padded to OP
    p_pose: jnp.ndarray  # (OP,) int32
    p_point: jnp.ndarray  # (OP,) int32
    p_uv: jnp.ndarray  # (OP, 2)
    p_valid: jnp.ndarray  # (OP,)
    p_sigma: jnp.ndarray  # (OP,)


class LMConfig(NamedTuple):
    max_iters: int = 10
    lam0: float = 1e-4
    lam_up: float = 4.0
    lam_down: float = 0.5
    huber_line: float = 2.0  # in sigma units (sqrt of chi2 threshold-ish)
    huber_point: float = 2.45
    min_lam: float = 1e-8
    max_lam: float = 1e4


class BAState(NamedTuple):
    poses: jnp.ndarray
    lines: jnp.ndarray
    points: jnp.ndarray
    lam: jnp.ndarray
    cost: jnp.ndarray


def _whitened_residuals(state_poses, state_lines, state_points, prob: BAProblem, cam: Intrinsics):
    """Per-observation whitened residuals (no robust weighting)."""
    zl6 = jnp.zeros((prob.l_pose.shape[0], 6), state_poses.dtype)
    zl4 = jnp.zeros((prob.l_pose.shape[0], 4), state_poses.dtype)

    rl = jax.vmap(
        lambda xi, d, T, Lw, ep: line_residual(xi, d, T, Lw, ep, cam)
    )(zl6, zl4, state_poses[prob.l_pose], state_lines[prob.l_line], prob.l_endpoints)
    rl = rl / prob.l_sigma[:, None]

    zp6 = jnp.zeros((prob.p_pose.shape[0], 6), state_poses.dtype)
    zp3 = jnp.zeros((prob.p_pose.shape[0], 3), state_poses.dtype)
    rp = jax.vmap(
        lambda xi, d, T, Xw, uv: point_residual(xi, d, T, Xw, uv, cam)
    )(zp6, zp3, state_poses[prob.p_pose], state_points[prob.p_point], prob.p_uv)
    rp = rp / prob.p_sigma[:, None]
    return rl, rp


def _robust_cost(rl, rp, prob: BAProblem, cfg: LMConfig):
    """True Huber objective (used for accept/reject decisions)."""

    def huber(sq_norm, delta):
        n = jnp.sqrt(sq_norm + _EPS)
        return jnp.where(n <= delta, sq_norm, 2.0 * delta * n - delta * delta)

    cl = huber(jnp.sum(rl * rl, axis=-1), cfg.huber_line) * prob.l_valid
    cp = huber(jnp.sum(rp * rp, axis=-1), cfg.huber_point) * prob.p_valid
    return jnp.sum(cl) + jnp.sum(cp)


def _lm_iteration(state: BAState, prob: BAProblem, cam: Intrinsics, cfg: LMConfig):
    P = prob.poses.shape[0]
    Lc = prob.lines.shape[0]
    M = prob.points.shape[0]

    # ---- residuals + Jacobians at zero tangent -------------------------
    def line_rj(T, Lw, ep):
        f = lambda xi, d: line_residual(xi, d, T, Lw, ep, cam)
        r = f(jnp.zeros(6), jnp.zeros(4))
        Jp, Jl = jax.jacfwd(f, argnums=(0, 1))(jnp.zeros(6), jnp.zeros(4))
        return r, Jp, Jl

    rl, Jlp, Jll = jax.vmap(line_rj)(
        state.poses[prob.l_pose], state.lines[prob.l_line], prob.l_endpoints
    )

    def point_rj(T, Xw, uv):
        f = lambda xi, d: point_residual(xi, d, T, Xw, uv, cam)
        r = f(jnp.zeros(6), jnp.zeros(3))
        Jp, Jx = jax.jacfwd(f, argnums=(0, 1))(jnp.zeros(6), jnp.zeros(3))
        return r, Jp, Jx

    rp, Jpp, Jpx = jax.vmap(point_rj)(
        state.poses[prob.p_pose], state.points[prob.p_point], prob.p_uv
    )

    # ---- whitening + robust IRLS weights + masks -----------------------
    rl = rl / prob.l_sigma[:, None]
    Jlp = Jlp / prob.l_sigma[:, None, None]
    Jll = Jll / prob.l_sigma[:, None, None]
    rp = rp / prob.p_sigma[:, None]
    Jpp = Jpp / prob.p_sigma[:, None, None]
    Jpx = Jpx / prob.p_sigma[:, None, None]

    wl = huber_weight(jnp.linalg.norm(rl, axis=-1), cfg.huber_line) * prob.l_valid
    wp = huber_weight(jnp.linalg.norm(rp, axis=-1), cfg.huber_point) * prob.p_valid
    swl = jnp.sqrt(wl)[:, None]
    swp = jnp.sqrt(wp)[:, None]
    rl_w, Jlp_w, Jll_w = rl * swl, Jlp * swl[..., None], Jll * swl[..., None]
    rp_w, Jpp_w, Jpx_w = rp * swp, Jpp * swp[..., None], Jpx * swp[..., None]

    # gauge: zero out Jacobian columns of fixed poses
    Jlp_w = Jlp_w * prob.pose_free[prob.l_pose][:, None, None]
    Jpp_w = Jpp_w * prob.pose_free[prob.p_pose][:, None, None]
    # invalid landmarks: zero their Jacobians (observations of them are
    # already masked by *_valid, but be safe)
    Jll_w = Jll_w * prob.line_valid[prob.l_line][:, None, None]
    Jpx_w = Jpx_w * prob.point_valid[prob.p_point][:, None, None]

    # ---- block assembly ------------------------------------------------
    def tb(Ja, Jb):  # (O, 2, a), (O, 2, b) -> (O, a, b)
        return jnp.einsum("oia,oib->oab", Ja, Jb)

    Hpp = jax.ops.segment_sum(tb(Jlp_w, Jlp_w), prob.l_pose, P) + jax.ops.segment_sum(
        tb(Jpp_w, Jpp_w), prob.p_pose, P
    )  # (P, 6, 6)
    bp = -(
        jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jlp_w, rl_w), prob.l_pose, P)
        + jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jpp_w, rp_w), prob.p_pose, P)
    )  # (P, 6)

    Hll = jax.ops.segment_sum(tb(Jll_w, Jll_w), prob.l_line, Lc)  # (L, 4, 4)
    bl = -jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jll_w, rl_w), prob.l_line, Lc)

    Hxx = jax.ops.segment_sum(tb(Jpx_w, Jpx_w), prob.p_point, M)  # (M, 3, 3)
    bx = -jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jpx_w, rp_w), prob.p_point, M)

    # pose-landmark coupling, dense over (landmark, pose) pairs
    Wl = jax.ops.segment_sum(
        tb(Jlp_w, Jll_w), prob.l_line * P + prob.l_pose, Lc * P
    ).reshape(Lc, P, 6, 4)
    Wx = jax.ops.segment_sum(
        tb(Jpp_w, Jpx_w), prob.p_point * P + prob.p_pose, M * P
    ).reshape(M, P, 6, 3)

    # ---- damping -------------------------------------------------------
    lam = state.lam

    def damp(H, extra_eps):
        d = jnp.diagonal(H, axis1=-2, axis2=-1)
        return H + (lam * d + extra_eps)[..., None] * jnp.eye(
            H.shape[-1], dtype=H.dtype
        )

    eye6 = jnp.eye(6, dtype=Hpp.dtype)
    fixed = (prob.pose_free < 0.5)[:, None, None]
    Hpp_d = jnp.where(fixed, eye6, damp(Hpp, _EPS))
    Hll_d = jnp.where(
        (prob.line_valid < 0.5)[:, None, None],
        jnp.eye(4, dtype=Hll.dtype),
        damp(Hll, _EPS),
    )
    Hxx_d = jnp.where(
        (prob.point_valid < 0.5)[:, None, None],
        jnp.eye(3, dtype=Hxx.dtype),
        damp(Hxx, _EPS),
    )

    Hll_inv = jnp.linalg.inv(Hll_d)
    Hxx_inv = jnp.linalg.inv(Hxx_d)

    # ---- Schur complement: reduced camera system -----------------------
    # flatten (P, 6) into one axis so every contraction is a plain batched
    # matmul (2-D outputs keep the Mosaic/XLA lowering simple; 4-D-output
    # einsums ballooned the remote compile, PERF_NOTES.md)
    Al = Wl.transpose(0, 3, 1, 2).reshape(Lc, 4, P * 6)  # (L, 4, P6)
    Ax = Wx.transpose(0, 3, 1, 2).reshape(M, 3, P * 6)  # (M, 3, P6)
    # block-diagonal Hpp placement, scatter-free
    S_full = jnp.einsum("pik,pq->piqk", Hpp_d, jnp.eye(P, dtype=Hpp.dtype)).reshape(
        P * 6, P * 6
    )
    HinvAl = jnp.einsum("lab,lbj->laj", Hll_inv, Al)  # (L, 4, P6)
    HinvAx = jnp.einsum("mab,mbj->maj", Hxx_inv, Ax)
    S_full = S_full - jnp.einsum("lai,laj->ij", Al, HinvAl)
    S_full = S_full - jnp.einsum("mai,maj->ij", Ax, HinvAx)
    rhs = (
        bp.reshape(P * 6)
        - jnp.einsum("laj,la->j", HinvAl, bl)
        - jnp.einsum("maj,ma->j", HinvAx, bx)
    )

    S_full = S_full + _EPS * jnp.eye(P * 6, dtype=S_full.dtype)
    dp = jnp.linalg.solve(S_full, rhs).reshape(P, 6)
    dp = dp * prob.pose_free[:, None]

    # ---- back-substitution --------------------------------------------
    dl = jnp.einsum(
        "lab,lb->la", Hll_inv, bl - jnp.einsum("lpia,pi->la", Wl, dp)
    ) * prob.line_valid[:, None]
    dx = jnp.einsum(
        "mab,mb->ma", Hxx_inv, bx - jnp.einsum("mpia,pi->ma", Wx, dp)
    ) * prob.point_valid[:, None]

    # ---- candidate + accept/reject ------------------------------------
    cand_poses = jax.vmap(se3_retract)(state.poses, dp)
    cand_lines = plucker_normalize(jax.vmap(plucker_retract)(state.lines, dl))
    cand_points = state.points + dx

    rl_new, rp_new = _whitened_residuals(cand_poses, cand_lines, cand_points, prob, cam)
    new_cost = _robust_cost(rl_new, rp_new, prob, cfg)
    accept = new_cost < state.cost

    sel = lambda a, b: jnp.where(accept, a, b)
    next_state = BAState(
        poses=jnp.where(accept, cand_poses, state.poses),
        lines=jnp.where(accept, cand_lines, state.lines),
        points=jnp.where(accept, cand_points, state.points),
        lam=jnp.clip(
            sel(state.lam * cfg.lam_down, state.lam * cfg.lam_up),
            cfg.min_lam,
            cfg.max_lam,
        ),
        cost=sel(new_cost, state.cost),
    )
    return next_state


def run_lm(prob: BAProblem, cam: Intrinsics, cfg: LMConfig = LMConfig()) -> BAState:
    """Run ``cfg.max_iters`` LM iterations; jit-compatible end to end."""
    rl0, rp0 = _whitened_residuals(prob.poses, prob.lines, prob.points, prob, cam)
    state = BAState(
        poses=prob.poses,
        lines=plucker_normalize(prob.lines),
        points=prob.points,
        lam=jnp.asarray(cfg.lam0, prob.poses.dtype),
        cost=_robust_cost(rl0, rp0, prob, cfg),
    )

    def step(s, _):
        return _lm_iteration(s, prob, cam, cfg), None

    state, _ = jax.lax.scan(step, state, None, length=cfg.max_iters)
    return state


def chi2_outlier_mask(
    state: BAState, prob: BAProblem, cam: Intrinsics, chi2_line: float, chi2_point: float
):
    """Per-observation inlier masks from whitened squared residual norms."""
    rl, rp = _whitened_residuals(state.poses, state.lines, state.points, prob, cam)
    inl_l = (jnp.sum(rl * rl, axis=-1) < chi2_line).astype(prob.l_valid.dtype) * prob.l_valid
    inl_p = (jnp.sum(rp * rp, axis=-1) < chi2_point).astype(prob.p_valid.dtype) * prob.p_valid
    return inl_l, inl_p
