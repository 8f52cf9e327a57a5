"""Point feature front-end: extraction, stereo depth, hybrid tracking step.

SURVEY §3.1 `MapPoint` / [P:6]: the reference-class systems track ORB points
alongside LBD lines and feed both residual types into one pose optimization.
This module wires the dense FAST/BRIEF detector (kernels/fast.py) into the
same shapes the line path uses:

- stereo association reuses the MXU Hamming matcher with an additive
  row+disparity penalty (rectified pairs), disparity -> metric depth;
- the hybrid tracking step is ONE fused program mirroring
  `matcher._fused_track` with a second (point) landmark set: project map
  points, radius-gate, MXU match, then `pose_optimize` over BOTH residual
  families (the backend has carried 3-DoF point blocks since round 1).

All jit boundaries follow the axon rules (PERF_NOTES.md): flat fully-used
f32/uint32 arguments, additive penalties, no boolean mask matrices.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.backend.pose_opt import PoseOptConfig, pose_optimize
from tpuslam.geometry.camera import Intrinsics, project_points
from tpuslam.geometry.se3 import se3_apply
from tpuslam.kernels.fast import FASTParams, PointFeatures, detect_corners
from tpuslam.kernels.match import (
    MatchParams,
    _match_body,
    midpoint_radius_penalty,
    stereo_row_penalty,
)


class PointFrontendParams(NamedTuple):
    fast: FASTParams = FASTParams()
    max_points: int = 256
    # stereo association (rectified)
    stereo_max_dy: float = 2.0
    min_disp: float = 0.5
    max_disp: float = 200.0
    stereo_match: MatchParams = MatchParams(max_dist=60.0, ratio=0.9)
    # map-point projection search
    radius: float = 30.0
    match: MatchParams = MatchParams(max_dist=60.0, ratio=0.95)
    min_z: float = 0.05
    min_depth: float = 0.1
    max_depth: float = 40.0


def extract_points(img: jnp.ndarray, params: PointFrontendParams) -> PointFeatures:
    """(H, W) grayscale f32 in [0, 1] -> PointFeatures (capacity-padded)."""
    return detect_corners(img, params.max_points, params.fast)


@partial(jax.jit, static_argnums=(7, 8))
def _stereo_points(
    uv_l, bits_l, valid_l,
    uv_r, bits_r, valid_r,
    fxb, params: PointFrontendParams, _unused: int,
):
    pen = stereo_row_penalty(uv_l, uv_r, params.stereo_max_dy, params.min_disp, params.max_disp)
    m = _match_body(bits_l, valid_l, bits_r, valid_r, pen, params.stereo_match)
    xr = uv_r[jnp.maximum(m.idx, 0), 0]
    disp = uv_l[:, 0] - xr
    okf = (
        m.valid
        * (disp > params.min_disp).astype(jnp.float32)
        * (disp < params.max_disp).astype(jnp.float32)
    )
    depth = okf * fxb / jnp.maximum(disp, 1e-6)
    okf = (
        okf
        * (depth > params.min_depth).astype(jnp.float32)
        * (depth < params.max_depth).astype(jnp.float32)
    )
    return depth * okf, okf


def stereo_point_depths(
    left: PointFeatures,
    right: PointFeatures,
    fx_baseline,
    params: PointFrontendParams,
) -> PointFeatures:
    """Left<->right corner association on rectified pairs -> metric depth."""
    depth, okf = _stereo_points(
        left.uv, left.desc_bits, left.valid,
        right.uv, right.desc_bits, right.valid,
        jnp.asarray(fx_baseline, jnp.float32), params, 0,
    )
    return left._replace(depth=depth, has_depth=okf)


@partial(jax.jit, static_argnums=(4,))
def _triangulate_points(T_wc, uv, depth, okf, cam: Intrinsics):
    x = (uv[:, 0] - cam.cx) / cam.fx
    y = (uv[:, 1] - cam.cy) / cam.fy
    p_c = jnp.stack([x * depth, y * depth, depth], axis=-1)
    p_w = se3_apply(T_wc, p_c)
    return p_w, okf


def triangulate_stereo_points(T_wc, feats: PointFeatures, cam: Intrinsics):
    """Backproject stereo-depth corners to world points.

    Returns (xyz (K, 3), okf (K,) f32). SURVEY §4.3 CreateNewMapPoints,
    stereo branch: direct backprojection.
    """
    return _triangulate_points(
        jnp.asarray(np.asarray(T_wc)), feats.uv, feats.depth,
        feats.has_depth * feats.valid, cam,
    )


class HybridTrackResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) optimized T_cw
    l_match_idx: jnp.ndarray  # (NL,) line landmark -> frame line slot
    l_inlier: jnp.ndarray  # (NL,) f32
    p_match_idx: jnp.ndarray  # (NP,) point landmark -> frame corner slot
    p_inlier: jnp.ndarray  # (NP,) f32
    num_matched: jnp.ndarray  # int32 (lines + points)
    num_inliers: jnp.ndarray  # int32 (lines + points)
    packed: jnp.ndarray  # (20,) [pose(16), n_matched, n_inliers, n_lmatch, n_pmatch]


@partial(jax.jit, static_argnums=(17, 18, 19, 20))
def _fused_track_hybrid(
    T_pred,
    l_plucker, l_ep3d, l_bits, l_validf,
    p_xyz, p_bits, p_validf,
    fl_mid, fl_ang, fl_bits, fl_valid, fl_ep, fl_sigma,
    fp_uv, fp_bits, fp_valid,
    cam: Intrinsics, search, pparams: PointFrontendParams, opt: PoseOptConfig,
):
    from tpuslam.frontend.matcher import _project_penalty

    # ---- line landmarks: project + gate + MXU match ----------------------
    pen_l, vf_l = _project_penalty.__wrapped__(
        T_pred, l_ep3d, l_validf, fl_mid, fl_ang, cam, search
    )
    ml = _match_body(l_bits, vf_l, fl_bits, fl_valid, pen_l, search.match)

    # ---- point landmarks: project + radius gate + MXU match --------------
    p_c = se3_apply(T_pred, p_xyz)
    uv = project_points(cam, p_c)
    vis = (
        (p_c[:, 2] > pparams.min_z)
        & (uv[:, 0] >= -20.0) & (uv[:, 0] < cam.width + 20.0)
        & (uv[:, 1] >= -20.0) & (uv[:, 1] < cam.height + 20.0)
    )
    vf_p = p_validf * vis.astype(jnp.float32)
    pen_p = midpoint_radius_penalty(uv, fp_uv, pparams.radius)
    mp = _match_body(p_bits, vf_p, fp_bits, fp_valid, pen_p, pparams.match)

    # ---- joint pose LM ----------------------------------------------------
    l_slot = jnp.maximum(ml.idx, 0)
    p_slot = jnp.maximum(mp.idx, 0)
    res = pose_optimize(
        T_pred,
        l_plucker,
        fl_ep[l_slot],
        ml.valid,
        points=p_xyz,
        p_uv=fp_uv[p_slot],
        p_valid=mp.valid,
        cam=cam,
        cfg=opt,
        l_sigma=fl_sigma[l_slot],
    )
    n_lm = jnp.sum(ml.valid).astype(jnp.int32)
    n_pm = jnp.sum(mp.valid).astype(jnp.int32)
    packed = jnp.concatenate(
        [
            res.pose.reshape(-1),
            (n_lm + n_pm)[None].astype(jnp.float32),
            res.num_inliers[None].astype(jnp.float32),
            n_lm[None].astype(jnp.float32),
            n_pm[None].astype(jnp.float32),
        ]
    )
    return HybridTrackResult(
        pose=res.pose,
        l_match_idx=ml.idx,
        l_inlier=res.inlier_lines,
        p_match_idx=mp.idx,
        p_inlier=res.inlier_points,
        num_matched=n_lm + n_pm,
        num_inliers=res.num_inliers,
        packed=packed,
    )


def tracked_pose_step_hybrid(
    T_pred,
    line_local: dict,  # plucker (NL,6), ep3d (NL,2,3), bits, valid
    point_local: dict,  # xyz (NP,3), bits, valid
    line_feats,  # FrameFeatures
    point_feats: PointFeatures,
    cam: Intrinsics,
    search,  # ProjectionSearchParams (line gate)
    pparams: PointFrontendParams,
    opt: PoseOptConfig = PoseOptConfig(),
) -> HybridTrackResult:
    """One hybrid tracking stage: lines + points in a single fused program.

    SURVEY §4.2 TrackWithMotionModel / TrackLocalMap with both landmark
    families (the reference optimizes point and line edges in one g2o graph;
    here both residual sets enter one `pose_optimize` LM).
    """
    return _fused_track_hybrid(
        T_pred,
        line_local["plucker"], line_local["ep3d"], line_local["bits"], line_local["valid"],
        point_local["xyz"], point_local["bits"], point_local["valid"],
        line_feats.midpoint, line_feats.angle, line_feats.desc_bits,
        line_feats.valid, line_feats.endpoints, line_feats.sigma,
        point_feats.uv, point_feats.desc_bits, point_feats.valid,
        cam, search, pparams, opt,
    )
