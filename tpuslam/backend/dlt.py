"""DLT-Lines: initialization-free camera pose from 3D-line <-> 2D-line
correspondences (SURVEY §5, PAPERS.md [P:9]).

The iterative PnL solver (backend.pose_opt) needs a pose seed; tracking has
the motion model, but relocalization does not — LM from a distant candidate
keyframe's pose can diverge. DLT-Lines is the linear fallback: every image
line l (homogeneous 3-vector) and any point X on its 3D line satisfy

    l^T P X~ = 0,    P = K [R | t]

so two known 3D points per line (we use the landmark endpoints) give two
linear equations in the 12 entries of P. The least-squares null vector of
the stacked system (12x12 eigenproblem — trivially jittable) yields P up to
scale; the signed cube root of det(K^-1 P [:, :3]) recovers scale AND sign
in one step, and an SVD re-orthonormalizes R.

Fixed-shape: rows are weight-masked, so the program compiles once per
capacity. World points are Hartley-normalized for f32 conditioning.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpuslam.geometry.camera import Intrinsics


@partial(jax.jit, static_argnums=(3,))
def dlt_lines_pose(
    l2d: jnp.ndarray,  # (M, 3) pixel-frame image-line coefficients
    Xw: jnp.ndarray,  # (M, 2, 3) two world points per corresponding 3D line
    w: jnp.ndarray,  # (M,) f32 {0,1} correspondence validity
    cam: Intrinsics,
):
    """Returns (T_cw (4,4), ok (f32 scalar)): ok < 0.5 flags a degenerate
    system (insufficient/ill-conditioned correspondences)."""
    M = l2d.shape[0]
    f32 = jnp.float32
    nw = jnp.maximum(jnp.sum(w), 1e-6)
    # Conditioning is everything here: the normal-equations eigensolve runs
    # in f32, so both sides of every row must be O(1).
    # (a) express image lines in NORMALIZED camera coords (x' = K^-1 x maps
    #     lines by l' = K^T l) — kills the ~1e5 pixel-offset coefficient and
    #     makes P = [R | t] directly, no K^-1 peel afterwards;
    # (b) Hartley-normalize the world points.
    KT = jnp.array(
        [[cam.fx, 0.0, 0.0], [0.0, cam.fy, 0.0], [cam.cx, cam.cy, 1.0]], f32
    )
    l = l2d @ KT.T
    l = l / (jnp.linalg.norm(l[:, :2], axis=-1, keepdims=True) + 1e-12)
    mu = jnp.sum(w[:, None, None] * Xw, axis=(0, 1)) / (2.0 * nw)
    dev = (Xw - mu) * w[:, None, None]
    sc = jnp.sqrt(jnp.sum(dev**2) / (6.0 * nw)) + 1e-9
    Xn = (Xw - mu) / sc  # (M, 2, 3)

    # rows: coeff of P'_{ij} is l_i * X~_j  (P' acts on normalized coords)
    Xh = jnp.concatenate([Xn, jnp.ones((M, 2, 1), f32)], axis=-1)  # (M, 2, 4)
    A = (l[:, None, :, None] * Xh[:, :, None, :]).reshape(M * 2, 12)
    A = A * jnp.repeat(w, 2)[:, None]
    G = A.T @ A  # (12, 12)
    evals, evecs = jnp.linalg.eigh(G)
    p = evecs[:, 0]  # eigenvector of the smallest eigenvalue
    Pn = p.reshape(3, 4)
    # denormalize: X~ = T_n X  with  T_n = [[I/sc, -mu/sc], [0, 1]]
    Tn = jnp.concatenate(
        [jnp.eye(3, dtype=f32) / sc, (-mu / sc)[:, None]], axis=1
    )
    Tn = jnp.concatenate([Tn, jnp.array([[0.0, 0.0, 0.0, 1.0]], f32)], axis=0)
    B = Pn @ Tn  # (3, 4) ~ [R | t] up to signed scale

    det = jnp.linalg.det(B[:, :3])
    s = jnp.cbrt(det)  # SIGNED scale: det(sR) = s^3 resolves the DLT sign
    ok_scale = jnp.abs(s) > 1e-12
    s_safe = jnp.where(ok_scale, s, 1.0)
    B = B / s_safe
    U, S, Vt = jnp.linalg.svd(B[:, :3])
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], f32).at[2].set(jnp.linalg.det(U @ Vt)))
    R = U @ D @ Vt
    t = B[:, 3]
    T = jnp.eye(4, dtype=f32)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)

    # degeneracy flags: enough rows, non-vanishing scale, near-orthonormal B
    # (a valid projective solution has near-equal singular values; the LM
    # re-gate downstream does the precise validation)
    enough = nw >= 6.0
    rot_dev = jnp.max(jnp.abs(S / jnp.maximum(S[0], 1e-9) - 1.0))
    ok = enough.astype(f32) * ok_scale.astype(f32) * (rot_dev < 0.5).astype(f32)
    return T, ok


def image_line_coeffs(endpoints: jnp.ndarray) -> jnp.ndarray:
    """(K, 2, 2) segment pixel endpoints -> (K, 3) homogeneous line coeffs."""
    p0 = jnp.concatenate([endpoints[:, 0], jnp.ones_like(endpoints[:, 0, :1])], -1)
    p1 = jnp.concatenate([endpoints[:, 1], jnp.ones_like(endpoints[:, 1, :1])], -1)
    return jnp.cross(p0, p1)
