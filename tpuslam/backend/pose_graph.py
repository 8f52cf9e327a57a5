"""Pose-graph optimization over SE(3) (SURVEY §2 'OptimizeEssentialGraph').

The reference's essential-graph optimization is g2o LM over SE(3) vertices
with relative-pose edges (spanning tree + loop edges + strong covisibility).
TPU formulation: fixed-capacity edge list, residuals

    r_e = log( T_meas_e^-1 @ T_i @ T_j^-1 )  in R^6

with Jacobians by AD through left-perturbations at zero, Gauss-Newton/LM
iterations fully inside `lax.scan`, and the (P*6)^2 normal system solved by
dense Cholesky — pose graphs at SLAM scale (hundreds of keyframes) are tiny
for the MXU; sparsity tricks would only add host logic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.se3 import se3_inverse, se3_log, se3_retract

_EPS = 1e-8


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray  # (P, 4, 4) T_cw initial values
    pose_free: jnp.ndarray  # (P,) 1.0 = optimized
    e_i: jnp.ndarray  # (E,) int32 edge endpoints
    e_j: jnp.ndarray  # (E,)
    e_meas: jnp.ndarray  # (E, 4, 4) measured T_i @ T_j^-1
    e_valid: jnp.ndarray  # (E,)
    e_weight: jnp.ndarray  # (E,) information scale (e.g. covis weight)


class PoseGraphConfig(NamedTuple):
    max_iters: int = 12
    lam0: float = 1e-6
    lam_up: float = 4.0
    lam_down: float = 0.5


def _edge_residual(xi_i, xi_j, T_i, T_j, T_meas):
    Ti = se3_retract(T_i, xi_i)
    Tj = se3_retract(T_j, xi_j)
    return se3_log(se3_inverse(T_meas) @ Ti @ se3_inverse(Tj))


def _residuals(poses, prob: PoseGraphProblem):
    z6 = jnp.zeros((prob.e_i.shape[0], 6), poses.dtype)
    r = jax.vmap(_edge_residual)(
        z6, z6, poses[prob.e_i], poses[prob.e_j], prob.e_meas
    )
    return r * jnp.sqrt(prob.e_weight)[:, None] * prob.e_valid[:, None]


def _iteration(carry, prob: PoseGraphProblem, cfg: PoseGraphConfig):
    poses, lam, cost = carry
    P = poses.shape[0]

    def rj(Ti, Tj, Tm):
        f = lambda xi, xj: _edge_residual(xi, xj, Ti, Tj, Tm)
        r = f(jnp.zeros(6), jnp.zeros(6))
        Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(jnp.zeros(6), jnp.zeros(6))
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(rj)(poses[prob.e_i], poses[prob.e_j], prob.e_meas)
    sw = (jnp.sqrt(prob.e_weight) * prob.e_valid)[:, None]
    r = r * sw
    Ji = Ji * sw[..., None] * prob.pose_free[prob.e_i][:, None, None]
    Jj = Jj * sw[..., None] * prob.pose_free[prob.e_j][:, None, None]

    # assemble the full (P*6, P*6) system from edge blocks
    def blocks(Ja, Jb):
        return jnp.einsum("eia,eib->eab", Ja, Jb)

    H = jnp.zeros((P, P, 6, 6), r.dtype)
    H = H.at[prob.e_i, prob.e_i].add(blocks(Ji, Ji))
    H = H.at[prob.e_j, prob.e_j].add(blocks(Jj, Jj))
    H = H.at[prob.e_i, prob.e_j].add(blocks(Ji, Jj))
    H = H.at[prob.e_j, prob.e_i].add(blocks(Jj, Ji))
    b = jnp.zeros((P, 6), r.dtype)
    b = b.at[prob.e_i].add(-jnp.einsum("eia,ei->ea", Ji, r))
    b = b.at[prob.e_j].add(-jnp.einsum("eia,ei->ea", Jj, r))

    Hf = jnp.transpose(H, (0, 2, 1, 3)).reshape(P * 6, P * 6)
    diag = jnp.diagonal(Hf)
    # fixed poses: identity rows (their b is already zero via pose_free masks)
    free_mask = jnp.repeat(prob.pose_free, 6)
    Hf = Hf * free_mask[:, None] * free_mask[None, :]
    Hf = Hf + jnp.diag(lam * diag + _EPS + (1.0 - free_mask))
    dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hf), b.reshape(-1))
    dx = dx.reshape(P, 6) * prob.pose_free[:, None]

    cand = jax.vmap(se3_retract)(poses, dx)
    new_cost = jnp.sum(_residuals(cand, prob) ** 2)
    accept = new_cost < cost
    poses = jnp.where(accept, cand, poses)
    lam = jnp.clip(
        jnp.where(accept, lam * cfg.lam_down, lam * cfg.lam_up), 1e-10, 1e6
    )
    cost = jnp.where(accept, new_cost, cost)
    return (poses, lam, cost)


@partial(jax.jit, static_argnums=(1,))
def optimize_pose_graph(prob: PoseGraphProblem, cfg: PoseGraphConfig = PoseGraphConfig()):
    """Returns (optimized poses (P, 4, 4), final cost)."""
    cost0 = jnp.sum(_residuals(prob.poses, prob) ** 2)
    lam0 = jnp.asarray(cfg.lam0, prob.poses.dtype)

    def step(c, _):
        return _iteration(c, prob, cfg), None

    (poses, _, cost), _ = jax.lax.scan(
        step, (prob.poses, lam0, cost0), None, length=cfg.max_iters
    )
    return poses, cost


# ---------------------------------------------------------------------------
# Sim(3) essential graph for monocular loop closure (SURVEY §4.4 'mono: Sim3')
# ---------------------------------------------------------------------------

from tpuslam.geometry.sim3 import sim3_chart_log, sim3_inverse, sim3_retract  # noqa: E402


class Sim3GraphProblem(NamedTuple):
    sims: jnp.ndarray  # (P, 4, 4) world->camera similarities S_cw
    pose_free: jnp.ndarray  # (P,) 1.0 = optimized
    e_i: jnp.ndarray  # (E,) int32
    e_j: jnp.ndarray  # (E,)
    e_meas: jnp.ndarray  # (E, 4, 4) measured S_i @ S_j^-1
    e_valid: jnp.ndarray  # (E,)
    e_weight: jnp.ndarray  # (E,)


def _sim3_edge_residual(xi_i, xi_j, S_i, S_j, S_meas):
    Si = sim3_retract(S_i, xi_i)
    Sj = sim3_retract(S_j, xi_j)
    return sim3_chart_log(sim3_inverse(S_meas) @ Si @ sim3_inverse(Sj))


def _sim3_residuals(sims, prob: Sim3GraphProblem):
    z7 = jnp.zeros((prob.e_i.shape[0], 7), sims.dtype)
    r = jax.vmap(_sim3_edge_residual)(z7, z7, sims[prob.e_i], sims[prob.e_j], prob.e_meas)
    return r * jnp.sqrt(prob.e_weight)[:, None] * prob.e_valid[:, None]


def _sim3_iteration(carry, prob: Sim3GraphProblem, cfg: PoseGraphConfig):
    sims, lam, cost = carry
    P = sims.shape[0]
    D = 7

    def rj(Si, Sj, Sm):
        f = lambda xi, xj: _sim3_edge_residual(xi, xj, Si, Sj, Sm)
        r = f(jnp.zeros(D), jnp.zeros(D))
        Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(jnp.zeros(D), jnp.zeros(D))
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(rj)(sims[prob.e_i], sims[prob.e_j], prob.e_meas)
    sw = (jnp.sqrt(prob.e_weight) * prob.e_valid)[:, None]
    r = r * sw
    Ji = Ji * sw[..., None] * prob.pose_free[prob.e_i][:, None, None]
    Jj = Jj * sw[..., None] * prob.pose_free[prob.e_j][:, None, None]

    def blocks(Ja, Jb):
        return jnp.einsum("eia,eib->eab", Ja, Jb)

    H = jnp.zeros((P, P, D, D), r.dtype)
    H = H.at[prob.e_i, prob.e_i].add(blocks(Ji, Ji))
    H = H.at[prob.e_j, prob.e_j].add(blocks(Jj, Jj))
    H = H.at[prob.e_i, prob.e_j].add(blocks(Ji, Jj))
    H = H.at[prob.e_j, prob.e_i].add(blocks(Jj, Ji))
    b = jnp.zeros((P, D), r.dtype)
    b = b.at[prob.e_i].add(-jnp.einsum("eia,ei->ea", Ji, r))
    b = b.at[prob.e_j].add(-jnp.einsum("eia,ei->ea", Jj, r))

    Hf = jnp.transpose(H, (0, 2, 1, 3)).reshape(P * D, P * D)
    diag = jnp.diagonal(Hf)
    free_mask = jnp.repeat(prob.pose_free, D)
    Hf = Hf * free_mask[:, None] * free_mask[None, :]
    Hf = Hf + jnp.diag(lam * diag + _EPS + (1.0 - free_mask))
    dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hf), b.reshape(-1))
    dx = dx.reshape(P, D) * prob.pose_free[:, None]

    cand = jax.vmap(sim3_retract)(sims, dx)
    new_cost = jnp.sum(_sim3_residuals(cand, prob) ** 2)
    accept = new_cost < cost
    sims = jnp.where(accept, cand, sims)
    lam = jnp.clip(jnp.where(accept, lam * cfg.lam_down, lam * cfg.lam_up), 1e-10, 1e6)
    cost = jnp.where(accept, new_cost, cost)
    return (sims, lam, cost)


@partial(jax.jit, static_argnums=(1,))
def optimize_pose_graph_sim3(prob: Sim3GraphProblem, cfg: PoseGraphConfig = PoseGraphConfig()):
    """Returns (optimized similarities (P, 4, 4), final cost)."""
    cost0 = jnp.sum(_sim3_residuals(prob.sims, prob) ** 2)
    lam0 = jnp.asarray(cfg.lam0, prob.sims.dtype)

    def step(c, _):
        return _sim3_iteration(c, prob, cfg), None

    (sims, _, cost), _ = jax.lax.scan(
        step, (prob.sims, lam0, cost0), None, length=cfg.max_iters
    )
    return sims, cost
