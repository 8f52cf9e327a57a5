"""Pluecker 3D line representation and the orthonormal 4-DoF parameterization.

Math spec per SURVEY §5 (grounded in PAPERS.md: "Camera Pose Estimation from
Lines using Pluecker Coordinates", "Robust Visual SLAM with Point and Line
Features"):

- Pluecker line ``L = (n, v)`` stored as a (..., 6) array: ``v`` direction,
  ``n = p x q`` moment for points p, q on the line. Klein constraint
  ``n . v = 0``; defined up to scale -> 4 DoF.
- Orthonormal representation ``(U, theta) in SO(3) x SO(2)``:
  ``U = [n/|n|, v/|v|, (n x v)/|n x v|]``, ``theta = atan2(|v|, |n|)`` so that
  ``(w1, w2) = (cos theta, sin theta) ~ (|n|, |v|)``.
- BA retraction (4-DoF tangent ``delta``): ``U <- U exp([d0,d1,d2]^)``,
  ``theta <- theta + d3`` (:func:`plucker_retract`). Jacobians by AD.
- Rigid transform: ``[n_c; v_c] = [[R, [t]x R],[0, R]] [n_w; v_w]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry.se3 import so3_exp, so3_hat

_EPS = 1e-9


def plucker_from_points(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Line through 3D points p, q: (..., 6) = [n, v], v = q - p, n = p x q."""
    v = q - p
    n = jnp.cross(p, q)
    return jnp.concatenate([n, v], axis=-1)


def plucker_transform(T: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Transform (..., 6) Pluecker line by (..., 4, 4) SE(3): world -> camera."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n, v = L[..., :3], L[..., 3:]
    Rv = (R @ v[..., None])[..., 0]
    n_c = (R @ n[..., None])[..., 0] + jnp.cross(t, Rv)
    return jnp.concatenate([n_c, Rv], axis=-1)


def plucker_normalize(L: jnp.ndarray) -> jnp.ndarray:
    """Canonical storage form: |v| = 1 and the Klein constraint re-projected.

    Removes the v-parallel component of n (n <- n - (n.v_hat) v_hat): exact
    for true lines, and repairs the f32 cancellation error that accumulates
    when lines are triangulated from poorly-scaled image-line coefficients.
    """
    n, v = L[..., :3], L[..., 3:]
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v_hat = v / jnp.maximum(v_norm, _EPS)
    n_proj = n - jnp.sum(n * v_hat, axis=-1, keepdims=True) * v_hat
    return jnp.concatenate([n_proj, v_hat * v_norm], axis=-1) / jnp.maximum(
        v_norm, _EPS
    )


def plucker_to_orthonormal(L: jnp.ndarray):
    """(..., 6) -> (U (..., 3, 3), theta (...,)).

    Degenerate case |n| ~ 0 (line through origin) handled with a safe
    orthogonal complement for u1.
    """
    n, v = L[..., :3], L[..., 3:]
    n_norm = jnp.linalg.norm(n, axis=-1)
    v_norm = jnp.linalg.norm(v, axis=-1)
    v_hat = v / jnp.maximum(v_norm, _EPS)[..., None]

    # u1 = n/|n|, with fallback: any unit vector orthogonal to v.
    # Fallback construction: cross v with the axis least aligned with it.
    abs_v = jnp.abs(v_hat)
    smallest = jnp.argmin(abs_v, axis=-1)
    basis = jnp.eye(3, dtype=L.dtype)
    e = basis[smallest]
    fallback = jnp.cross(v_hat, e)
    fallback = fallback / jnp.maximum(
        jnp.linalg.norm(fallback, axis=-1, keepdims=True), _EPS
    )
    degen = (n_norm < 1e-7)[..., None]
    u1 = jnp.where(degen, fallback, n / jnp.maximum(n_norm, _EPS)[..., None])
    # Gram-Schmidt u1 against u2 so U is orthogonal even when the input
    # violates the Klein constraint (e.g. f32 triangulation error); keeps the
    # retraction from baking a constraint violation into updated landmarks.
    u1 = u1 - jnp.sum(u1 * v_hat, axis=-1, keepdims=True) * v_hat
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), _EPS)
    u2 = v_hat
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)  # columns
    theta = jnp.arctan2(v_norm, n_norm)
    return U, theta


def orthonormal_to_plucker(U: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`plucker_to_orthonormal` (up to the global line scale)."""
    w1 = jnp.cos(theta)[..., None]
    w2 = jnp.sin(theta)[..., None]
    n = w1 * U[..., :, 0]
    v = w2 * U[..., :, 1]
    return jnp.concatenate([n, v], axis=-1)


def plucker_retract(L: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """4-DoF orthonormal update around L; the BA landmark retraction.

    delta: (..., 4) = [dU (3,), dtheta]. Returns an (un-normalized) Pluecker
    vector; scale-invariant consumers (projection residuals) need no
    normalization, storage paths should call :func:`plucker_normalize`.
    """
    U, theta = plucker_to_orthonormal(L)
    U_new = U @ so3_exp(delta[..., :3])
    theta_new = theta + delta[..., 3]
    return orthonormal_to_plucker(U_new, theta_new)


def plucker_closest_point(L: jnp.ndarray) -> jnp.ndarray:
    """Point on the line closest to the origin: p0 = (v x n) / |v|^2."""
    n, v = L[..., :3], L[..., 3:]
    v2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return jnp.cross(v, n) / jnp.maximum(v2, _EPS)


def plucker_distance_to_origin(L: jnp.ndarray) -> jnp.ndarray:
    """d = |n| / |v|."""
    n, v = L[..., :3], L[..., 3:]
    return jnp.linalg.norm(n, axis=-1) / jnp.maximum(
        jnp.linalg.norm(v, axis=-1), _EPS
    )


def plucker_point_at(L: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Point p0 + t * v_hat on the (normalized-direction) line."""
    n, v = L[..., :3], L[..., 3:]
    v_hat = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
    return plucker_closest_point(L) + t[..., None] * v_hat


__all__ = [
    "plucker_from_points",
    "plucker_transform",
    "plucker_normalize",
    "plucker_to_orthonormal",
    "orthonormal_to_plucker",
    "plucker_retract",
    "plucker_closest_point",
    "plucker_distance_to_origin",
    "plucker_point_at",
    "so3_hat",
]
