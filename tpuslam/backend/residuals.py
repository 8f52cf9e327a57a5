"""Reprojection residuals for line and point landmarks (SURVEY §5).

Line residual: signed distances of the *detected* segment endpoints to the
*projected* infinite line — the standard point+line SLAM error (PAPERS.md
"Robust Visual SLAM with Point and Line Features"):

    l = K_L n_c,   e = [x_s^T l, x_e^T l] / sqrt(l1^2 + l2^2)

Point residual: standard 2D pixel reprojection error.

Each function maps ONE observation; solvers vmap them over the padded
observation arrays and differentiate through the retractions at zero tangent
(the AD replacement for the reference's hand-derived g2o edge Jacobians).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry.camera import Intrinsics, line_projection_matrix, project_points
from tpuslam.geometry.plucker import plucker_retract, plucker_transform
from tpuslam.geometry.se3 import se3_apply, se3_retract

_EPS = 1e-9


def line_residual(
    xi: jnp.ndarray,
    delta: jnp.ndarray,
    T_cw: jnp.ndarray,
    L_w: jnp.ndarray,
    endpoints: jnp.ndarray,
    cam: Intrinsics,
) -> jnp.ndarray:
    """Residual of one line observation at tangent (xi (6,), delta (4,)).

    endpoints: (2, 2) detected segment endpoints [x_s, x_e] in pixels.
    Returns (2,) signed endpoint-to-line distances in pixels.
    """
    T = se3_retract(T_cw, xi)
    L = plucker_retract(L_w, delta)
    L_c = plucker_transform(T, L)
    KL = line_projection_matrix(cam)
    l = KL @ L_c[:3]
    norm = jnp.sqrt(l[0] ** 2 + l[1] ** 2 + _EPS)
    xs = jnp.concatenate([endpoints[0], jnp.ones((1,), endpoints.dtype)])
    xe = jnp.concatenate([endpoints[1], jnp.ones((1,), endpoints.dtype)])
    return jnp.stack([xs @ l, xe @ l]) / norm


def point_residual(
    xi: jnp.ndarray,
    dx: jnp.ndarray,
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,
    uv: jnp.ndarray,
    cam: Intrinsics,
) -> jnp.ndarray:
    """Residual of one point observation at tangent (xi (6,), dx (3,)).

    Returns (2,) pixel error (projected - measured).
    """
    T = se3_retract(T_cw, xi)
    X_c = se3_apply(T, X_w + dx)
    return project_points(cam, X_c) - uv


def huber_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel: w = min(1, delta / |r|)."""
    return jnp.minimum(1.0, delta / jnp.maximum(r_norm, _EPS))
