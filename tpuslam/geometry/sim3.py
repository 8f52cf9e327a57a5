"""Sim(3) operations for monocular loop closure (SURVEY §4.4 'mono: Sim3').

Monocular SLAM drifts in SCALE as well as pose; closing a loop with an SE(3)
correction leaves the accumulated scale error in the map. The reference
closes mono loops with a 7-DoF similarity (g2o `sim3` types); this module is
the TPU rebuild's equivalent.

Representation: a similarity is stored as a 4x4 matrix ``S = [[s*R, t],[0,1]]``
acting on points as ``x' = s*R*x + t``. The tangent chart used for LM
retraction is the product chart ``xi = [rho(3), phi(3), lam(1)]`` with

    chart(xi) = [[exp(lam) * so3_exp(phi), rho], [0, 1]]

— not the exact Sim(3) exponential (which differs only in how rho couples to
phi/lam), but a valid smooth retraction with chart(0) = I and an exact local
inverse (`sim3_chart_log`), which is all LM-with-AD-Jacobians requires. The
residual ``log(S_meas^-1 S_i S_j^-1)`` is zero exactly when the edge is
consistent, independent of chart choice.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry.se3 import so3_exp, so3_log

_EPS = 1e-12


def sim3_make(s, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(scale, (...,3,3), (...,3)) -> (...,4,4) similarity matrix."""
    s = jnp.asarray(s)
    top = jnp.concatenate([s[..., None, None] * R, t[..., :, None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def sim3_scale(S: jnp.ndarray) -> jnp.ndarray:
    """Recover s from the sR block (det(sR) = s^3)."""
    det = jnp.linalg.det(S[..., :3, :3])
    return jnp.cbrt(jnp.maximum(det, _EPS))


def sim3_decompose(S: jnp.ndarray):
    """-> (s, R, t)."""
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    return s, R, S[..., :3, 3]


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    s, R, t = sim3_decompose(S)
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return sim3_make(s_inv, Rt, t_inv)


def sim3_apply(S: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Similarity action x' = s*R*x + t; pts (..., 3)."""
    return jnp.einsum("...ij,...j->...i", S[..., :3, :3], pts) + S[..., :3, 3]


def sim3_chart(xi: jnp.ndarray) -> jnp.ndarray:
    """xi (..., 7) = [rho, phi, lam] -> (..., 4, 4) similarity."""
    rho, phi, lam = xi[..., :3], xi[..., 3:6], xi[..., 6]
    return sim3_make(jnp.exp(lam), so3_exp(phi), rho)


def sim3_chart_log(S: jnp.ndarray) -> jnp.ndarray:
    """Inverse of sim3_chart: (..., 4, 4) -> (..., 7)."""
    s, R, t = sim3_decompose(S)
    return jnp.concatenate(
        [t, so3_log(R), jnp.log(jnp.maximum(s, _EPS))[..., None]], axis=-1
    )


def sim3_retract(S: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-perturbation retraction S <- chart(xi) @ S (AD-safe at xi=0)."""
    return sim3_chart(xi) @ S


def sim3_from_se3(T: jnp.ndarray, s=1.0) -> jnp.ndarray:
    """SE(3) pose (R, t) + scale -> similarity (s*R, t)."""
    return sim3_make(jnp.asarray(s, T.dtype), T[..., :3, :3], T[..., :3, 3])


def se3_from_sim3(S: jnp.ndarray) -> jnp.ndarray:
    """Corrected camera pose from a world->camera similarity: T = [R | t/s]
    (the standard mono loop-closure convention: dividing the translation by
    the scale re-expresses the camera center in the rescaled world)."""
    s, R, t = sim3_decompose(S)
    top = jnp.concatenate([R, (t / s[..., None])[..., :, None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], S.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def plucker_transform_sim3(S: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Transform a Pluecker line (n, v) by a similarity S = (s, R, t).

    For points p' = s*R*p + t on the transformed line:
        v' = R v            (direction, scale-free up to line scale)
        n' = s*R*n + [t]x R v
    (derived from p' x q' = s(s R n + t x R v); lines are defined up to
    scale, so the common factor s is dropped)."""
    s, R, t = sim3_decompose(S)
    n, v = L[..., :3], L[..., 3:]
    Rv = jnp.einsum("...ij,...j->...i", R, v)
    Rn = jnp.einsum("...ij,...j->...i", R, n)
    n_new = s[..., None] * Rn + jnp.cross(t, Rv)
    return jnp.concatenate([n_new, Rv], axis=-1)
