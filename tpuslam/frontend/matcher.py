"""Projection-guided and descriptor matching against the map (SURVEY §2 L2).

The reference's `LineMatcher::SearchByProjection` loops over landmarks,
projects each into the frame, and scans a pixel grid for nearby candidate
features. The TPU formulation projects ALL landmarks at once and gates a
dense (landmarks x features) distance matrix — the grid lookup becomes a
midpoint-radius mask, and the descriptor scan one MXU matmul
(kernels/match.py).

`tracked_pose_step` fuses projection-search + pose-only LM + inlier count
into a single jitted program: one device dispatch per tracking stage
(SURVEY §9.4 item 4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.backend.pose_opt import PoseOptConfig, pose_optimize
from tpuslam.frontend.frame import FrameFeatures
from tpuslam.geometry.camera import Intrinsics, project_points
from tpuslam.geometry.se3 import se3_apply
from tpuslam.kernels.match import (
    MatchParams,
    MatchResult,
    angle_penalty,
    match_descriptors,
    midpoint_radius_penalty,
)


class ProjectionSearchParams(NamedTuple):
    radius: float = 40.0  # px midpoint search radius
    angle_tol: float = 0.3
    match: MatchParams = MatchParams(max_dist=110.0, ratio=0.95)
    min_z: float = 0.05
    margin: float = -20.0  # allow midpoints slightly outside the image


def project_map_lines(
    T_cw: jnp.ndarray,
    ep3d: jnp.ndarray,  # (N, 2, 3) world segment endpoints
    cam: Intrinsics,
    min_z: float,
    margin: float,
):
    """Project landmark endpoints; visibility mask. Returns (uv (N,2,2),
    mid (N,2), ang (N,), visible (N,))."""
    ep_c = se3_apply(T_cw, ep3d)  # (N, 2, 3)
    uv = project_points(cam, ep_c)  # (N, 2, 2)
    in_front = jnp.all(ep_c[..., 2] > min_z, axis=-1)
    mid = jnp.mean(uv, axis=1)
    d = uv[:, 1] - uv[:, 0]
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    in_img = (
        (mid[:, 0] >= margin)
        & (mid[:, 0] < cam.width - margin)
        & (mid[:, 1] >= margin)
        & (mid[:, 1] < cam.height - margin)
    )
    return uv, mid, ang, in_front & in_img


@partial(jax.jit, static_argnums=(5, 6))
def _project_penalty(
    T_cw, map_ep3d, map_validf, feat_mid, feat_ang, cam: Intrinsics, params: "ProjectionSearchParams"
):
    """Landmark projection + gate-penalty matrix (own jit; see module doc)."""
    _, mid, ang, visible = project_map_lines(
        T_cw, map_ep3d, cam, params.min_z, params.margin
    )
    pen = midpoint_radius_penalty(mid, feat_mid, params.radius) + angle_penalty(
        ang, feat_ang, params.angle_tol
    )
    return pen, map_validf * visible.astype(jnp.float32)


def search_by_projection(
    T_cw: jnp.ndarray,
    map_ep3d: jnp.ndarray,
    map_bits: jnp.ndarray,
    map_valid: jnp.ndarray,
    feats: FrameFeatures,
    cam: Intrinsics,
    params: ProjectionSearchParams = ProjectionSearchParams(),
) -> MatchResult:
    """Match map lines -> frame features near their predicted projection.

    Returns MatchResult over the landmark axis: idx[i] = frame feature slot.
    Host-orchestrated: projection+penalty and the MXU match are separate
    small jitted programs (axon Mosaic compile-cliff avoidance — see
    kernels/match.py docstring).
    """
    pen, validf = _project_penalty(
        T_cw,
        map_ep3d,
        map_valid.astype(jnp.float32) if map_valid.dtype != jnp.float32 else map_valid,
        feats.midpoint,
        feats.angle,
        cam,
        params,
    )
    return match_descriptors(
        map_bits,
        validf,
        feats.desc_bits,
        feats.valid,
        params.match,
        pen,
    )


class TrackStepResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) optimized T_cw
    match_idx: jnp.ndarray  # (N,) landmark -> frame slot (-1 none)
    inlier: jnp.ndarray  # (N,) final inlier mask (f32)
    num_matched: jnp.ndarray  # int32
    num_inliers: jnp.ndarray  # int32
    packed: jnp.ndarray = None  # (19,) f32 [pose(16), n_matched, n_inliers,
    # n_depth] — everything the host needs per frame in ONE d2h transfer


@partial(jax.jit, static_argnums=(6, 7))
def _pose_opt_from_matches(
    T_pred, map_plucker, feat_ep, feat_sigma, match_idx, match_validf, cam: Intrinsics, opt: PoseOptConfig
):
    slot = jnp.maximum(match_idx, 0)
    res = pose_optimize(
        T_pred,
        map_plucker,
        feat_ep[slot],
        match_validf,
        points=jnp.zeros((1, 3), T_pred.dtype),
        p_uv=jnp.zeros((1, 2), T_pred.dtype),
        p_valid=jnp.zeros((1,), T_pred.dtype),
        cam=cam,
        cfg=opt,
        l_sigma=feat_sigma[slot],
    )
    return res, jnp.sum(match_validf).astype(jnp.int32)


def _track_stage_body(
    T_pred, map_plucker, map_ep3d, map_bits, map_validf,
    f_mid, f_ang, f_bits, f_valid, f_ep, f_sigma,
    cam: Intrinsics, search: "ProjectionSearchParams", opt: PoseOptConfig,
    radius=None,
):
    """One project+match+pose-LM stage (trace-once body).

    `radius` may be a TRACED scalar overriding search.radius — the fused
    pipeline scans this body over (coarse, fine) radii so the stage's graph
    is emitted once per program instead of twice (the remote compile
    service's latency scales with program size and >30-40 s compiles degrade
    every later dispatch — PERF_NOTES.md)."""
    from tpuslam.kernels.match import (
        _match_body,
        angle_penalty,
        midpoint_radius_penalty,
    )

    _, mid, ang, visible = project_map_lines(
        T_pred, map_ep3d, cam, search.min_z, search.margin
    )
    r = search.radius if radius is None else radius
    pen = midpoint_radius_penalty(mid, f_mid, r) + angle_penalty(
        ang, f_ang, search.angle_tol
    )
    vf = map_validf * visible.astype(jnp.float32)
    m = _match_body(map_bits, vf, f_bits, f_valid, pen, search.match)
    res, n_matched = _pose_opt_from_matches.__wrapped__(
        T_pred, map_plucker, f_ep, f_sigma, m.idx, m.valid, cam, opt
    )
    return res, m, n_matched


@partial(jax.jit, static_argnums=(12, 13, 14))
def _fused_track(
    T_pred, map_plucker, map_ep3d, map_bits, map_validf,
    f_mid, f_ang, f_bits, f_valid, f_ep, f_sigma, f_has_depth,
    cam: Intrinsics, search: "ProjectionSearchParams", opt: PoseOptConfig,
):
    res, m, n_matched = _track_stage_body(
        T_pred, map_plucker, map_ep3d, map_bits, map_validf,
        f_mid, f_ang, f_bits, f_valid, f_ep, f_sigma, cam, search, opt,
    )
    packed = jnp.concatenate(
        [
            res.pose.reshape(-1),
            n_matched[None].astype(jnp.float32),
            res.num_inliers[None].astype(jnp.float32),
            jnp.sum(f_has_depth)[None],
        ]
    )
    return res.pose, m.idx, res.inlier_lines, n_matched, res.num_inliers, packed


def tracked_pose_step(
    T_pred: jnp.ndarray,
    map_plucker: jnp.ndarray,  # (N, 6) world lines
    map_ep3d: jnp.ndarray,  # (N, 2, 3)
    map_bits: jnp.ndarray,  # (N, W)
    map_valid: jnp.ndarray,  # (N,) f32 {0, 1}
    feats: FrameFeatures,
    cam: Intrinsics,
    search: ProjectionSearchParams = ProjectionSearchParams(),
    opt: PoseOptConfig = PoseOptConfig(),
) -> TrackStepResult:
    """One tracking stage: project+match+pose-LM+re-gate, as ONE fused
    program with flat fully-used args (PERF_NOTES.md shapes the design).

    SURVEY §4.2 TrackWithMotionModel / TrackLocalMap body.
    """
    pose, midx, inlier, n_matched, n_inl, packed = _fused_track(
        T_pred, map_plucker, map_ep3d, map_bits,
        map_valid.astype(jnp.float32) if map_valid.dtype != jnp.float32 else map_valid,
        feats.midpoint, feats.angle, feats.desc_bits, feats.valid, feats.endpoints,
        feats.sigma, feats.has_depth,
        cam, search, opt,
    )
    return TrackStepResult(
        pose=pose,
        match_idx=midx,
        inlier=inlier,
        num_matched=n_matched,
        num_inliers=n_inl,
        packed=packed,
    )


@partial(jax.jit, static_argnums=(5,))
def _triangulate_stereo(T_wc, endpoints, depth, has_depthf, validf, cam: Intrinsics):
    x = (endpoints[..., 0] - cam.cx) / cam.fx  # (K, 2)
    y = (endpoints[..., 1] - cam.cy) / cam.fy
    z = depth  # (K, 2)
    p_c = jnp.stack([x * z, y * z, z], axis=-1)  # (K, 2, 3)
    p_w = se3_apply(T_wc, p_c)
    v = p_w[:, 1] - p_w[:, 0]
    n = jnp.cross(p_w[:, 0], p_w[:, 1])
    plucker = jnp.concatenate([n, v], axis=-1)
    seg_len = jnp.linalg.norm(v, axis=-1)
    okf = (
        has_depthf
        * validf
        * (seg_len > 0.05).astype(jnp.float32)
        * (seg_len < 20.0).astype(jnp.float32)
    )
    return plucker, p_w, okf


def triangulate_stereo_lines(T_wc: jnp.ndarray, feats: FrameFeatures, cam: Intrinsics):
    """Stereo-depth endpoints -> world Pluecker lines + 3D endpoints.

    Returns (plucker (K, 6), ep3d (K, 2, 3), okf (K,) f32). SURVEY §4.3
    CreateNewMapLines, stereo branch: direct backprojection, no two-view
    search needed. Thin host wrapper passing only the used feature arrays
    (the has_depth*valid combine happens inside the jit — no eager ops).
    """
    return _triangulate_stereo(
        jnp.asarray(np.asarray(T_wc)), feats.endpoints, feats.depth, feats.has_depth, feats.valid, cam
    )
