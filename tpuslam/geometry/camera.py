"""Pinhole camera model: point projection and Pluecker line projection.

SURVEY §5: projection of a camera-frame Pluecker line (n_c, v_c) to the image
line ``l = K_L n_c`` with the line-projection matrix

    K_L = [[fy, 0, 0], [0, fx, 0], [-fy*cx, -fx*cy, fx*fy]]  (= fx*fy * K^-T)

so a pixel x (homogeneous) lies on the projected line iff x^T l = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-9


class Intrinsics(NamedTuple):
    """Pinhole intrinsics (static per sequence; a pytree of scalars)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 640
    height: int = 480
    baseline: float = 0.0  # stereo baseline in meters (0 => monocular)

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def line_projection_matrix(cam: Intrinsics) -> jnp.ndarray:
    """K_L such that l = K_L @ n_c projects the line moment to image-line coeffs."""
    return jnp.array(
        [
            [cam.fy, 0.0, 0.0],
            [0.0, cam.fx, 0.0],
            [-cam.fy * cam.cx, -cam.fx * cam.cy, cam.fx * cam.fy],
        ],
        dtype=jnp.float32,
    )


def project_points(cam: Intrinsics, pts_c: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame (..., 3) points -> (..., 2) pixels. No distortion
    (rectified/undistorted inputs assumed, as in the reference's rectified
    stereo pipelines)."""
    z = jnp.maximum(pts_c[..., 2:3], _EPS)
    x = pts_c[..., 0:1] / z
    y = pts_c[..., 1:2] / z
    u = cam.fx * x + cam.cx
    v = cam.fy * y + cam.cy
    return jnp.concatenate([u, v], axis=-1)


def backproject_pixels(cam: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) pixels + (...,) depth -> (..., 3) camera-frame points."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def project_plucker_line(cam: Intrinsics, L_c: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame Pluecker (..., 6) -> image line coeffs (..., 3)."""
    KL = line_projection_matrix(cam)
    return (KL @ L_c[..., :3, None])[..., 0]


def image_line_through(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous image line through two (..., 2) pixels: l = p_h x q_h."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    qh = jnp.concatenate([q, jnp.ones_like(q[..., :1])], axis=-1)
    return jnp.cross(ph, qh)


def point_line_distance(l: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of (..., 2) pixels to (..., 3) homogeneous image lines."""
    num = l[..., 0] * uv[..., 0] + l[..., 1] * uv[..., 1] + l[..., 2]
    den = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    return num / jnp.maximum(den, _EPS)


class Distortion(NamedTuple):
    """Radial-tangential (OpenCV 'radtan') distortion coefficients.

    The reference's per-dataset YAMLs carry Camera.k1/k2/p1/p2; rectified
    stereo pipelines have zeros, TUM fr1/fr2 and raw EuRoC do not."""

    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    @property
    def is_zero(self) -> bool:
        return self.k1 == 0.0 and self.k2 == 0.0 and self.p1 == 0.0 and self.p2 == 0.0


def _distort_normalized(dist: Distortion, x, y):
    r2 = x * x + y * y
    radial = 1.0 + dist.k1 * r2 + dist.k2 * r2 * r2
    xd = x * radial + 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
    return xd, yd


def undistort_pixels(
    cam: Intrinsics, dist: Distortion, uv: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """(..., 2) DISTORTED pixels -> (..., 2) undistorted (ideal pinhole)
    pixels, by the standard fixed-point inversion of the radtan model
    (OpenCV undistortPoints iteration). Fully vectorized, no gathers —
    feature-level undistortion keeps the TPU image path remap-free."""
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + dist.k1 * r2 + dist.k2 * r2 * r2
        dx = 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
        dy = dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
        x = (xd - dx) / jnp.maximum(radial, 1e-6)
        y = (yd - dy) / jnp.maximum(radial, 1e-6)
    return jnp.stack([cam.fx * x + cam.cx, cam.fy * y + cam.cy], axis=-1)


def distort_pixels(cam: Intrinsics, dist: Distortion, uv: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) ideal pinhole pixels -> distorted pixels (forward model;
    used by tests/synthetic rendering)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    xd, yd = _distort_normalized(dist, x, y)
    return jnp.stack([cam.fx * xd + cam.cx, cam.fy * yd + cam.cy], axis=-1)
