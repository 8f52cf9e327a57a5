"""Two-view triangulation of points and Pluecker lines.

SURVEY §5: a 3D line is the intersection of the two planes back-projected
from its image lines: ``pi_i = P_i^T l_i`` with ``P_i = K [R_i | t_i]``
(3x4, world->image). Writing ``pi_i = (a_i, d_i)``:

    v = a_1 x a_2            (line direction)
    n = d_1 a_2 - d_2 a_1    (line moment, n = p x v for p on the line)

which is the closed form of extracting (n, v) from the dual Pluecker matrix
``L* = pi_1 pi_2^T - pi_2 pi_1^T``.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.se3 import se3_inverse

_EPS = 1e-9


def projection_matrix(cam: Intrinsics, T_cw: jnp.ndarray) -> jnp.ndarray:
    """World->image 3x4 projection P = K [R | t] from world->camera pose."""
    return cam.K @ T_cw[..., :3, :4]


def plane_from_image_line(P: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    """Back-project (..., 3) image line through (..., 3, 4) P: pi = P^T l."""
    return (jnp.swapaxes(P, -1, -2) @ l[..., None])[..., 0]


def triangulate_plucker_two_view(
    P1: jnp.ndarray, P2: jnp.ndarray, l1: jnp.ndarray, l2: jnp.ndarray
) -> jnp.ndarray:
    """Image lines in two views -> world-frame Pluecker (..., 6) = [n, v].

    Degenerate when the two back-projected planes are parallel (line on the
    epipolar plane / pure translation along the line): |v| ~ 0. Callers gate
    on direction norm.
    """
    pi1 = plane_from_image_line(P1, l1)
    pi2 = plane_from_image_line(P2, l2)
    # Per-plane normalization (legitimate: scales (n, v) uniformly) — keeps
    # the f32 cancellation in n = d1*a2 - d2*a1 well-conditioned despite the
    # large pixel-scale coefficients of P^T l.
    pi1 = pi1 / jnp.maximum(jnp.linalg.norm(pi1[..., :3], axis=-1, keepdims=True), _EPS)
    pi2 = pi2 / jnp.maximum(jnp.linalg.norm(pi2[..., :3], axis=-1, keepdims=True), _EPS)
    a1, d1 = pi1[..., :3], pi1[..., 3]
    a2, d2 = pi2[..., :3], pi2[..., 3]
    v = jnp.cross(a1, a2)
    n = d1[..., None] * a2 - d2[..., None] * a1
    return jnp.concatenate([n, v], axis=-1)


def triangulate_points(
    P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """DLT point triangulation, batched: (..., 2) pixels in two views -> (..., 3).

    Solves the 4x4 homogeneous system with a closed-form smallest-singular-
    vector via normal equations (A^T A smallest eigenvector), which is
    jit/vmap friendly (no variable-size SVD on device).
    """
    rows = []
    for P, uv in ((P1, uv1), (P2, uv2)):
        u = uv[..., 0:1]
        v = uv[..., 1:2]
        rows.append(u * P[..., 2, :] - P[..., 0, :])
        rows.append(v * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    # Smallest eigenvector of symmetric 4x4.
    w, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]
    Xh = X / jnp.where(jnp.abs(X[..., 3:4]) < _EPS, _EPS, X[..., 3:4])
    return Xh[..., :3]


def line_ray_endpoints(L: jnp.ndarray, rays: jnp.ndarray):
    """Clamp detected-segment extent onto a 3D line via viewing rays.

    L: (..., 6) Pluecker lines in the CAMERA frame; rays: (..., 2, 3) unit
    viewing rays of the two detected endpoints (camera origin). Returns
    (points (..., 2, 3) on L closest to each ray, s (..., 2) the ray
    parameter — s <= 0 means the closest point is behind the camera).

    Used to attach 3D endpoints to triangulated lines (visualization,
    culling, projection gating) — the optimized state stays Pluecker.
    """
    n, v = L[..., :3], L[..., 3:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    u = v / jnp.maximum(vn, _EPS)  # (..., 3)
    p0 = jnp.cross(v, n) / jnp.maximum(vn * vn, _EPS)  # closest point to origin
    u2 = u[..., None, :]  # (..., 1, 3)
    p02 = p0[..., None, :]
    b = jnp.sum(u2 * rays, axis=-1)  # (..., 2)
    w = p02  # ray origin is 0, so w = p0 - 0
    wu = jnp.sum(w * u2, axis=-1)
    wr = jnp.sum(w * rays, axis=-1)
    denom = jnp.maximum(1.0 - b * b, 1e-9)
    t = (b * wr - wu) / denom
    s = (wr - b * wu) / denom
    pts = p02 + t[..., None] * u2  # (..., 2, 3)
    return pts, s


def stereo_depth_from_disparity(cam: Intrinsics, disparity: jnp.ndarray) -> jnp.ndarray:
    """Rectified stereo: z = fx * b / d."""
    return cam.fx * cam.baseline / jnp.maximum(disparity, 1e-6)


def relative_pose(T1_cw: jnp.ndarray, T2_cw: jnp.ndarray) -> jnp.ndarray:
    """T_21 mapping camera-1 coords to camera-2 coords."""
    return T2_cw @ se3_inverse(T1_cw)
