"""Monocular two-view bootstrap (SURVEY §2 'Initializer').

Strategy (reference-class, reformulated batch-parallel): match line segments
between a reference frame and the current frame; treat matched segment
ENDPOINTS as point correspondences; robustly estimate the essential matrix
with a fully vmapped 8-point RANSAC (all hypotheses solved in one device
program); recover (R, t) by cheirality voting; triangulate the matched lines
from their back-projected planes (geometry/triangulate.py).

Implemented in `initializer.py` stages below; `MonoInitializer.try_initialize`
is the host wrapper that keeps the reference frame and resets when parallax
or match count is too low.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.frontend.frame import FrameFeatures
from tpuslam.geometry.camera import Intrinsics, image_line_through
from tpuslam.geometry.se3 import se3_inverse
from tpuslam.geometry.triangulate import (
    projection_matrix,
    triangulate_plucker_two_view,
    triangulate_points,
)
from tpuslam.kernels.match import MatchParams, match_descriptors


class MonoInitParams(NamedTuple):
    min_matches: int = 12
    n_hypotheses: int = 256  # RANSAC hypotheses, all evaluated in parallel
    inlier_px: float = 2.0  # Sampson distance threshold
    min_inlier_ratio: float = 0.5
    min_parallax_px: float = 12.0  # median endpoint displacement
    max_frame_gap: int = 40
    match: MatchParams = MatchParams(max_dist=100.0, ratio=0.9)


def _essential_from_8(uv0n: jnp.ndarray, uv1n: jnp.ndarray) -> jnp.ndarray:
    """8-point algorithm on normalized coords: (8, 2) x2 -> (3, 3) E."""
    x0, y0 = uv0n[:, 0], uv0n[:, 1]
    x1, y1 = uv1n[:, 0], uv1n[:, 1]
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, jnp.ones_like(x0)],
        axis=-1,
    )  # (8, 9)
    # smallest right singular vector via eigh of A^T A (jit/vmap friendly)
    _, V = jnp.linalg.eigh(A.T @ A)
    E = V[:, 0].reshape(3, 3)
    # project onto the essential manifold: singular values (1, 1, 0)
    U, _, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def _sampson_sq(E: jnp.ndarray, uv0n: jnp.ndarray, uv1n: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance of correspondences under E (normalized)."""
    ones = jnp.ones_like(uv0n[..., :1])
    x0 = jnp.concatenate([uv0n, ones], axis=-1)  # (N, 3)
    x1 = jnp.concatenate([uv1n, ones], axis=-1)
    Ex0 = x0 @ E.T  # (N, 3)
    Etx1 = x1 @ E
    num = jnp.sum(x1 * Ex0, axis=-1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnums=(3,))
def ransac_essential(
    uv0n: jnp.ndarray,  # (N, 2) normalized coords frame 0
    uv1n: jnp.ndarray,  # (N, 2)
    valid: jnp.ndarray,  # (N,)
    params: MonoInitParams,
    seed: jnp.ndarray = None,
):
    """Batched 8-point RANSAC: all hypotheses as one vmapped solve.

    Returns (E (3,3), inliers (N,) bool, n_inliers).
    """
    N = uv0n.shape[0]
    key = jax.random.PRNGKey(0) if seed is None else seed
    validf = valid.astype(jnp.float32)
    # sample from valid indices via categorical over validity logits
    logits = (validf - 1.0) * 1e9
    samples = jax.random.categorical(
        key, logits, shape=(params.n_hypotheses, 8)
    )  # (H, 8)

    def solve(idx):
        return _essential_from_8(uv0n[idx], uv1n[idx])

    Es = jax.vmap(solve)(samples)  # (H, 3, 3)
    thr = (params.inlier_px / 1.0) ** 2  # scaled by focal below by caller
    d2 = jax.vmap(lambda E: _sampson_sq(E, uv0n, uv1n))(Es)  # (H, N)
    inlf = (d2 < thr).astype(jnp.float32) * validf[None, :]
    scores = jnp.sum(inlf, axis=1)
    best = jnp.argmax(scores)
    return Es[best], inlf[best], scores[best]


@jax.jit
def recover_pose(E: jnp.ndarray, uv0n: jnp.ndarray, uv1n: jnp.ndarray, inliers: jnp.ndarray):
    """Decompose E into the 4 (R, t) candidates; pick by cheirality voting.

    `inliers` is an f32 {0,1} mask. Returns T_10 (4, 4) with unit-norm
    translation (mono scale is free).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]

    ones = jnp.ones_like(uv0n[..., :1])
    P0 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)

    def count_front(R, tt):
        P1 = jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate_points(P0, P1, uv0n, uv1n)  # (N, 3) in frame 0
        z0 = X[:, 2]
        X1 = (R @ X.T).T + tt
        z1 = X1[:, 2]
        return jnp.sum(
            (z0 > 0).astype(jnp.float32) * (z1 > 0).astype(jnp.float32) * inliers
        )

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    votes = jnp.stack([count_front(R, tt) for R, tt in cands])
    best = jnp.argmax(votes)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    T = jnp.eye(4, dtype=E.dtype)
    T = T.at[:3, :3].set(Rb)
    T = T.at[:3, 3].set(tb)
    return T, votes[best]


class MonoInitializer:
    """Holds a reference frame; attempts 2-view bootstrap per new frame."""

    def __init__(self, cam: Intrinsics, params: MonoInitParams = MonoInitParams()):
        self.cam = cam
        self.params = params
        self.ref: Optional[FrameFeatures] = None
        self.ref_t = 0.0
        self.ref_idx = -1
        self.ref_aux = None  # opaque per-frame payload (e.g. PointFeatures)

    def _set_ref(self, feats, timestamp, frame_idx, aux=None):
        self.ref = feats
        self.ref_t = timestamp
        self.ref_idx = frame_idx
        self.ref_aux = aux

    def try_initialize(
        self, feats: FrameFeatures, timestamp: float, frame_idx: int, aux=None
    ):
        p = self.params
        if self.ref is None or frame_idx - self.ref_idx > p.max_frame_gap:
            self._set_ref(feats, timestamp, frame_idx, aux)
            return None
        m = match_descriptors(
            self.ref.desc_bits, self.ref.valid, feats.desc_bits, feats.valid, p.match
        )
        mvalid = np.asarray(m.valid)
        n = int(mvalid.sum())
        # hybrid bootstrap ([P:6]): matched corners join the essential-matrix
        # RANSAC as additional rows — on line-sparse scenes the 2-view pose
        # comes mostly from points, exactly like the reference-class hybrid
        # initializers
        p_slots0 = p_slots1 = None
        p_uv0 = p_uv1 = np.zeros((0, 2), np.float32)
        if aux is not None and self.ref_aux is not None:
            pm = match_descriptors(
                self.ref_aux.desc_bits, self.ref_aux.valid,
                aux.desc_bits, aux.valid, p.match,
            )
            pmv = np.asarray(pm.valid) > 0.5
            p_slots0 = np.nonzero(pmv)[0]
            p_slots1 = np.asarray(pm.idx)[p_slots0]
            p_uv0 = np.asarray(self.ref_aux.uv)[p_slots0]
            p_uv1 = np.asarray(aux.uv)[p_slots1]
        n_pts = len(p_uv0)
        if 2 * n + n_pts < 2 * p.min_matches:
            if n < 5 and n_pts < 10:
                self._set_ref(feats, timestamp, frame_idx, aux)
            return None
        idx = np.asarray(m.idx)
        ep0 = np.asarray(self.ref.endpoints)  # (K, 2, 2)
        ep1 = np.asarray(feats.endpoints)
        slots0 = np.nonzero(mvalid)[0]
        slots1 = idx[slots0]
        # endpoint correspondences (2 per match) — order endpoints
        # consistently by projecting onto the segment direction
        a0 = ep0[slots0]  # (n, 2, 2)
        a1 = ep1[slots1]
        # align endpoint order: flip a1 if reversed w.r.t. a0 direction
        d0 = a0[:, 1] - a0[:, 0]
        d1 = a1[:, 1] - a1[:, 0]
        flip = np.sum(d0 * d1, axis=-1) < 0
        a1[flip] = a1[flip][:, ::-1]
        disp = np.concatenate(
            [
                np.linalg.norm(a0 - a1, axis=-1).mean(axis=-1),
                np.linalg.norm(p_uv0 - p_uv1, axis=-1),
            ]
        )
        if np.median(disp) < p.min_parallax_px:
            return None

        n_line_rows = 2 * n
        uv0 = np.concatenate([a0.reshape(-1, 2), p_uv0.astype(np.float32)])
        uv1 = np.concatenate([a1.reshape(-1, 2), p_uv1.astype(np.float32)])
        f = 0.5 * (self.cam.fx + self.cam.fy)
        K = np.array([[self.cam.fx, 0, self.cam.cx], [0, self.cam.fy, self.cam.cy], [0, 0, 1]], np.float32)
        Kinv = np.linalg.inv(K)
        uv0n = (uv0 - [self.cam.cx, self.cam.cy]) / [self.cam.fx, self.cam.fy]
        uv1n = (uv1 - [self.cam.cx, self.cam.cy]) / [self.cam.fx, self.cam.fy]
        # threshold in normalized units
        params_n = p._replace(inlier_px=p.inlier_px / f)
        E, inl, score = ransac_essential(
            jnp.asarray(uv0n, jnp.float32),
            jnp.asarray(uv1n, jnp.float32),
            jnp.ones(len(uv0n), jnp.float32),
            params_n,
            jax.random.PRNGKey(frame_idx),
        )
        if int(score) < 2 * p.min_matches * p.min_inlier_ratio:
            return None
        T10, votes = recover_pose(E, jnp.asarray(uv0n, jnp.float32), jnp.asarray(uv1n, jnp.float32), inl)
        if int(votes) < int(score) * 0.6:
            return None
        T10 = np.array(T10)  # writable host copy

        # triangulate matched lines from back-projected planes
        P0 = np.asarray(projection_matrix(self.cam, jnp.eye(4)))
        P1 = np.asarray(projection_matrix(self.cam, jnp.asarray(T10)))
        l0 = np.asarray(image_line_through(jnp.asarray(a0[:, 0]), jnp.asarray(a0[:, 1])))
        l1 = np.asarray(image_line_through(jnp.asarray(a1[:, 0]), jnp.asarray(a1[:, 1])))
        L = np.asarray(
            triangulate_plucker_two_view(
                jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(l0), jnp.asarray(l1)
            )
        )  # (n, 6) world (= frame-0) Pluecker
        # endpoint 3D positions: intersect line with endpoint viewing rays
        ep3d = np.zeros((len(slots0), 2, 3), np.float32)
        ok = np.zeros(len(slots0), bool)
        inl_np = np.asarray(inl) > 0.5
        inl2 = inl_np[:n_line_rows].reshape(-1, 2)
        for i in range(len(slots0)):
            nvec, v = L[i, :3], L[i, 3:]
            vn = np.linalg.norm(v)
            if vn < 1e-6 or not inl2[i].all():
                continue
            # closest point param of each endpoint ray to the line
            good = True
            for e in range(2):
                ray = Kinv @ np.array([a0[i, e, 0], a0[i, e, 1], 1.0])
                ray = ray / np.linalg.norm(ray)
                # line: x = p0 + t*u ; ray: x = s*ray
                u = v / vn
                p0l = np.cross(v, nvec) / (vn * vn)
                # solve [u, -ray] [t, s]^T = -p0l in least squares
                Amat = np.stack([u, -ray], axis=1)
                ts, *_ = np.linalg.lstsq(Amat, -p0l, rcond=None)
                pt = p0l + ts[0] * u
                if ts[1] <= 0.05:  # behind camera
                    good = False
                ep3d[i, e] = pt
            ok[i] = good
        # triangulate inlier corner pairs (hybrid bootstrap)
        p_xyz = np.zeros((n_pts, 3), np.float32)
        p_ok = np.zeros(n_pts, bool)
        if n_pts:
            from tpuslam.geometry.triangulate import triangulate_points

            X = np.asarray(
                triangulate_points(
                    jnp.asarray(P0), jnp.asarray(P1),
                    jnp.asarray(p_uv0.astype(np.float32)),
                    jnp.asarray(p_uv1.astype(np.float32)),
                )
            )
            z0 = X[:, 2]
            X1 = X @ T10[:3, :3].T + T10[:3, 3]
            p_ok = (
                inl_np[n_line_rows:]
                & np.isfinite(X).all(axis=-1)
                & (z0 > 0.05)
                & (X1[:, 2] > 0.05)
            )
            p_xyz = X.astype(np.float32)
        if 2 * ok.sum() + p_ok.sum() < 2 * p.min_matches:
            return None
        # normalize scale: median landmark depth -> 2.0 (mono gauge)
        depths = np.concatenate([ep3d[ok][:, :, 2].ravel(), p_xyz[p_ok][:, 2]])
        scale = 2.0 / max(np.median(depths), 1e-3)
        ep3d *= scale
        p_xyz *= scale
        T10[:3, 3] *= scale
        # recompute Pluecker from scaled endpoints
        Lw = np.concatenate(
            [np.cross(ep3d[:, 0], ep3d[:, 1]), ep3d[:, 1] - ep3d[:, 0]], axis=-1
        ).astype(np.float32)
        # corner triangulations ride along as an attribute (the 9-tuple
        # return is API for line-only callers/tests)
        self.init_points = (
            p_xyz,
            p_ok,
            p_slots0 if p_slots0 is not None else np.zeros(0, np.int64),
            p_slots1 if p_slots1 is not None else np.zeros(0, np.int64),
        )
        ref = self.ref
        self.ref = None
        return (
            ref,
            self.ref_t,
            self.ref_idx,
            T10.astype(np.float32),
            Lw,
            ep3d,
            ok,
            slots0,
            slots1,
        )
