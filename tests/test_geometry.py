"""Unit tests for the geometry core (SURVEY §6.2 'unit: geometry').

Oracles: closed-form group identities, scipy.spatial.transform.Rotation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from tpuslam.geometry import (
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_apply,
    se3_retract,
    plucker_from_points,
    plucker_transform,
    plucker_normalize,
    plucker_to_orthonormal,
    orthonormal_to_plucker,
    plucker_retract,
    plucker_closest_point,
    plucker_distance_to_origin,
    Intrinsics,
    project_points,
    backproject_pixels,
    project_plucker_line,
    image_line_through,
    triangulate_points,
    triangulate_plucker_two_view,
)
from tpuslam.geometry.camera import point_line_distance
from tpuslam.geometry.triangulate import projection_matrix

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480)


def random_rotvecs(rng, n, scale=1.5):
    return rng.normal(size=(n, 3)).astype(np.float32) * scale / 3


def random_poses(rng, n):
    xi = np.concatenate(
        [rng.normal(size=(n, 3)), random_rotvecs(rng, n)], axis=-1
    ).astype(np.float32)
    return se3_exp(jnp.asarray(xi))


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        phi = random_rotvecs(rng, 64)
        R = np.asarray(so3_exp(jnp.asarray(phi)))
        R_ref = ScipyRot.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_log_roundtrip(self, rng):
        phi = random_rotvecs(rng, 64)
        phi_rt = np.asarray(so3_log(so3_exp(jnp.asarray(phi))))
        np.testing.assert_allclose(phi_rt, phi, atol=1e-4)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]], dtype=jnp.float32)
        R = so3_exp(phi)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)

    def test_grad_finite_at_zero(self):
        # AD through exp at phi=0 must be finite (used by every LM retraction).
        g = jax.jacobian(lambda p: so3_exp(p).reshape(-1))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [rng.normal(size=(32, 3)), random_rotvecs(rng, 32)], axis=-1
        ).astype(np.float32)
        xi_rt = np.asarray(se3_log(se3_exp(jnp.asarray(xi))))
        np.testing.assert_allclose(xi_rt, xi, atol=1e-4)

    def test_inverse(self, rng):
        T = random_poses(rng, 16)
        eye = np.asarray(T @ se3_inverse(T))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_apply(self, rng):
        T = random_poses(rng, 8)
        p = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        q = se3_apply(T, p)
        q_ref = (np.asarray(T[..., :3, :3]) @ p[..., None].__array__())[..., 0] + np.asarray(
            T[..., :3, 3]
        )
        np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)

    def test_retract_at_zero_is_identity(self, rng):
        T = random_poses(rng, 4)
        T2 = se3_retract(T, jnp.zeros((4, 6)))
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-6)


class TestPlucker:
    def _random_lines(self, rng, n):
        p = rng.normal(size=(n, 3)).astype(np.float32) * 2
        q = p + rng.normal(size=(n, 3)).astype(np.float32)
        return plucker_from_points(jnp.asarray(p), jnp.asarray(q)), p, q

    def test_klein_constraint(self, rng):
        L, _, _ = self._random_lines(rng, 32)
        nv = np.asarray(jnp.sum(L[..., :3] * L[..., 3:], axis=-1))
        np.testing.assert_allclose(nv, 0.0, atol=1e-4)

    def test_transform_matches_point_transform(self, rng):
        L, p, q = self._random_lines(rng, 16)
        T = random_poses(rng, 16)
        L_c = plucker_transform(T, L)
        p_c = se3_apply(T, jnp.asarray(p))
        q_c = se3_apply(T, jnp.asarray(q))
        L_ref = plucker_from_points(p_c, q_c)
        np.testing.assert_allclose(np.asarray(L_c), np.asarray(L_ref), atol=1e-4)

    def test_orthonormal_roundtrip(self, rng):
        L, _, _ = self._random_lines(rng, 32)
        Ln = plucker_normalize(L)
        U, theta = plucker_to_orthonormal(Ln)
        L_rt = plucker_normalize(orthonormal_to_plucker(U, theta))
        np.testing.assert_allclose(np.asarray(L_rt), np.asarray(Ln), atol=1e-4)

    def test_orthonormal_U_is_rotation(self, rng):
        L, _, _ = self._random_lines(rng, 16)
        U, _ = plucker_to_orthonormal(L)
        UUt = np.asarray(U @ jnp.swapaxes(U, -1, -2))
        np.testing.assert_allclose(UUt, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4)
        det = np.linalg.det(np.asarray(U))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_retract_zero_identity(self, rng):
        L, _, _ = self._random_lines(rng, 8)
        Ln = plucker_normalize(L)
        L2 = plucker_normalize(plucker_retract(Ln, jnp.zeros((8, 4))))
        np.testing.assert_allclose(np.asarray(L2), np.asarray(Ln), atol=1e-4)

    def test_retract_grad_finite(self, rng):
        L, _, _ = self._random_lines(rng, 1)
        Ln = plucker_normalize(L)[0]
        J = jax.jacobian(lambda d: plucker_retract(Ln, d))(jnp.zeros(4))
        assert np.all(np.isfinite(np.asarray(J)))
        # 4 DoF: jacobian should have full column rank
        assert np.linalg.matrix_rank(np.asarray(J), tol=1e-5) == 4

    def test_closest_point_and_distance(self, rng):
        L, p, q = self._random_lines(rng, 16)
        p0 = np.asarray(plucker_closest_point(L))
        v = (q - p) / np.linalg.norm(q - p, axis=-1, keepdims=True)
        # p0 lies on the line: (p0 - p) parallel to v
        cross = np.cross(p0 - p, v)
        np.testing.assert_allclose(cross, 0.0, atol=1e-3)
        # p0 orthogonal to direction
        np.testing.assert_allclose(np.sum(p0 * v, axis=-1), 0.0, atol=1e-3)
        d = np.asarray(plucker_distance_to_origin(L))
        np.testing.assert_allclose(d, np.linalg.norm(p0, axis=-1), atol=1e-3)


class TestCamera:
    def test_project_backproject(self, rng):
        depth = rng.uniform(1.0, 10.0, size=(32,)).astype(np.float32)
        uv = np.stack(
            [
                rng.uniform(0, CAM.width, size=32),
                rng.uniform(0, CAM.height, size=32),
            ],
            axis=-1,
        ).astype(np.float32)
        pts = backproject_pixels(CAM, jnp.asarray(uv), jnp.asarray(depth))
        uv_rt = np.asarray(project_points(CAM, pts))
        np.testing.assert_allclose(uv_rt, uv, atol=1e-3)

    def test_line_projection_consistency(self, rng):
        """Project 3D line via K_L vs projecting two points and joining."""
        p = rng.normal(size=(16, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32)
        q = p + rng.normal(size=(16, 3)).astype(np.float32)
        L_c = plucker_from_points(jnp.asarray(p), jnp.asarray(q))
        l = project_plucker_line(CAM, L_c)
        uv_p = project_points(CAM, jnp.asarray(p))
        uv_q = project_points(CAM, jnp.asarray(q))
        # Both projected endpoints must lie on the projected line
        d_p = np.asarray(point_line_distance(l, uv_p))
        d_q = np.asarray(point_line_distance(l, uv_q))
        np.testing.assert_allclose(d_p, 0.0, atol=1e-2)
        np.testing.assert_allclose(d_q, 0.0, atol=1e-2)


class TestTriangulation:
    def test_point_triangulation(self, rng):
        X = rng.normal(size=(32, 3)).astype(np.float32) + np.array([0, 0, 6], np.float32)
        T1 = se3_exp(jnp.asarray(np.zeros((1, 6), np.float32)))[0]
        T2 = se3_exp(
            jnp.asarray(np.array([[0.3, 0.05, 0.02, 0.01, 0.1, 0.02]], np.float32))
        )[0]
        P1 = projection_matrix(CAM, T1)
        P2 = projection_matrix(CAM, T2)
        uv1 = project_points(CAM, se3_apply(T1, jnp.asarray(X)))
        uv2 = project_points(CAM, se3_apply(T2, jnp.asarray(X)))
        X_hat = np.asarray(triangulate_points(P1, P2, uv1, uv2))
        np.testing.assert_allclose(X_hat, X, atol=2e-2)

    def test_line_triangulation_reprojects(self, rng):
        p = rng.normal(size=(16, 3)).astype(np.float32) + np.array([0, 0, 6], np.float32)
        q = p + rng.normal(size=(16, 3)).astype(np.float32)
        T1 = se3_exp(jnp.zeros((6,), jnp.float32))
        T2 = se3_exp(jnp.asarray(np.array([0.4, -0.1, 0.05, 0.02, 0.15, -0.03], np.float32)))
        P1 = projection_matrix(CAM, T1)
        P2 = projection_matrix(CAM, T2)

        def obs_line(T):
            uv_p = project_points(CAM, se3_apply(T, jnp.asarray(p)))
            uv_q = project_points(CAM, se3_apply(T, jnp.asarray(q)))
            return image_line_through(uv_p, uv_q)

        l1, l2 = obs_line(T1), obs_line(T2)
        L_w = triangulate_plucker_two_view(P1, P2, l1, l2)

        # Reproject into a third view; endpoints must lie on the projected line.
        T3 = se3_exp(jnp.asarray(np.array([-0.2, 0.3, 0.1, -0.05, 0.08, 0.1], np.float32)))
        L_c3 = plucker_transform(T3, L_w)
        l3 = project_plucker_line(CAM, L_c3)
        uv_p3 = project_points(CAM, se3_apply(T3, jnp.asarray(p)))
        uv_q3 = project_points(CAM, se3_apply(T3, jnp.asarray(q)))
        np.testing.assert_allclose(np.asarray(point_line_distance(l3, uv_p3)), 0.0, atol=0.1)
        np.testing.assert_allclose(np.asarray(point_line_distance(l3, uv_q3)), 0.0, atol=0.1)

    def test_triangulated_line_matches_plucker_from_points(self, rng):
        p = np.array([[1.0, 0.5, 6.0]], np.float32)
        q = np.array([[2.0, -0.5, 7.0]], np.float32)
        T1 = se3_exp(jnp.zeros((6,), jnp.float32))
        T2 = se3_exp(jnp.asarray(np.array([0.5, 0.0, 0.0, 0.0, 0.1, 0.0], np.float32)))
        P1 = projection_matrix(CAM, T1)
        P2 = projection_matrix(CAM, T2)
        uv_p1 = project_points(CAM, se3_apply(T1, jnp.asarray(p)))
        uv_q1 = project_points(CAM, se3_apply(T1, jnp.asarray(q)))
        uv_p2 = project_points(CAM, se3_apply(T2, jnp.asarray(p)))
        uv_q2 = project_points(CAM, se3_apply(T2, jnp.asarray(q)))
        l1 = image_line_through(uv_p1, uv_q1)
        l2 = image_line_through(uv_p2, uv_q2)
        L_hat = plucker_normalize(triangulate_plucker_two_view(P1, P2, l1, l2))
        L_ref = plucker_normalize(plucker_from_points(jnp.asarray(p), jnp.asarray(q)))
        # Same line up to overall sign
        Lh, Lr = np.asarray(L_hat)[0], np.asarray(L_ref)[0]
        if np.dot(Lh[3:], Lr[3:]) < 0:
            Lh = -Lh
        np.testing.assert_allclose(Lh, Lr, atol=5e-3)
