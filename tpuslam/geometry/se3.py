"""SE(3) Lie group operations on 4x4 homogeneous matrices.

Conventions (SURVEY §5):
- Pose ``T`` is a (..., 4, 4) world->camera transform ``T_cw``.
- Tangent vector ``xi = [rho, phi]`` with ``rho`` the translational part and
  ``phi`` the rotational part, ``exp(xi^) = [[exp(phi^), V(phi) rho],[0, 1]]``.
- LM retraction is a *left* perturbation: ``T <- exp(xi^) @ T`` (increment in
  the camera frame), see :func:`se3_retract`. Jacobians of residuals w.r.t.
  ``xi`` are obtained by automatic differentiation through the retraction at
  ``xi = 0`` — the JAX-native replacement for the reference's hand-derived
  analytic Jacobians (SURVEY §2 "g2o custom types").

All functions broadcast over leading batch dimensions and are vmap/jit safe
(no data-dependent control flow; small-angle branches via jnp.where with
safe denominators).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix [w]_x."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta2_coeffs(t2: jnp.ndarray):
    """sinc/cosc/sinc3 coefficients as AD-safe functions of theta^2.

    All three are even functions of theta, so they are smooth in t2 = theta^2;
    expressing them this way (with a safe sqrt in the untaken branch) keeps
    gradients finite at theta = 0 — required because every LM retraction
    differentiates through exp at the origin.
    """
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)  # sin(x)/x
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / safe_t2)  # (1-cos)/x^2
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (safe_t2 * t))  # (x-sin)/x^3
    return a, b, c


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    t2 = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _theta2_coeffs(t2)
    W = so3_hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle.

    Accurate away from theta == pi; near pi falls back to the eigenvector
    route via the symmetric part (adequate for SLAM increments, which are
    small; pose-graph edges near pi are handled upstream by composing).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = so3_vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    s2 = jnp.sum(w * w, axis=-1)  # sin^2(theta)

    # Generic branch: phi = theta / sin(theta) * w, AD-safe at identity via
    # the even-function trick (theta/sin(theta) is smooth in sin^2 near 0).
    small = s2 < 1e-10
    sin_safe = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta_g = jnp.arctan2(sin_safe, cos_theta)
    scale = jnp.where(small, 1.0 + s2 / 6.0, theta_g / sin_safe)
    phi_generic = scale[..., None] * w
    theta = jnp.where(small, jnp.sqrt(jnp.maximum(s2, 0.0)), theta_g)

    # Near pi: axis from diagonal of (R + I)/2 = axis axis^T (1+cos)/... ;
    # use sqrt of diagonal with signs from off-diagonals.
    near_pi = cos_theta < -0.999
    Rp = R + jnp.eye(3, dtype=R.dtype)
    # Column with largest diagonal of R + I
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)
    phi_pi = theta[..., None] * axis

    return jnp.where(near_pi[..., None], phi_pi, phi_generic)


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(phi) = I + cosc*W + sinc3*W^2 (AD-safe at 0)."""
    t2 = jnp.sum(phi * phi, axis=-1)
    _, b, c = _theta2_coeffs(t2)
    W = so3_hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian, AD-safe at 0.

    V^-1 = I - W/2 + k(theta) W^2 with k = (1 - theta*cot(theta/2)/2)/theta^2,
    an even function of theta.
    """
    t2 = jnp.sum(phi * phi, axis=-1)
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(safe_t2)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - 0.5 * t / jnp.tan(0.5 * t)) / safe_t2,
    )
    W = so3_hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [rho, phi] -> (..., 4, 4) homogeneous transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) [rho, phi]."""
    phi = so3_log(T[..., :3, :3])
    rho = (_left_jacobian_inv(phi) @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def se3_orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block onto SO(3) (Gram-Schmidt), keep t.

    Needed wherever poses FEED BACK through products without a host
    round-trip: ``se3_inverse`` is the transpose-inverse, so once R drifts
    off O(3) by eps, a chain like ``T @ se3_inverse(T') @ T`` amplifies the
    drift ~x2-3 per application — measured 1.2e-7 -> 1.7 over 19 frames in
    the device-resident motion-model chain before this projection existed
    (the host path is immune only because ``np.linalg.inv`` computes a true
    inverse). One projection per cycle keeps the error at f32 eps.
    """
    R = T[..., :3, :3]
    r0 = R[..., :, 0]
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-12)
    r1 = R[..., :, 1]
    r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = jnp.cross(r0, r1)
    Rn = jnp.stack([r0, r1, r2], axis=-1)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rn)
    out = out.at[..., :3, 3].set(T[..., :3, 3])
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """T_a @ T_b (apply T_b first)."""
    return Ta @ Tb


def se3_apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform (..., 3) points by (..., 4, 4)."""
    return (T[..., :3, :3] @ pts[..., None])[..., 0] + T[..., :3, 3]


def se3_retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-perturbation retraction T <- exp(xi^) @ T used by all LM solvers."""
    return se3_exp(xi) @ T
