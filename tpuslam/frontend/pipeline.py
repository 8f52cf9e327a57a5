"""The fused per-frame stereo tracking program + async image uploader.

Why this module exists (measured on the axon tunnel, benchmarks/probe_*.py):

- every PROGRAM DISPATCH costs ~4 ms on the wire regardless of work, so the
  former 5-program frame (extract L, extract R, stereo, coarse, fine) paid
  ~20 ms of pure overhead — here the frame is TWO programs (extract-pair,
  stereo+track) with all intermediates device-resident. Not one: program
  size drives the remote-compile lottery, and a single >30-40 s compile
  permanently degrades every later dispatch in the process (PERF_NOTES.md);
  the monolithic variant (TPUSLAM_FUSED_SPLIT=0) was observed losing that
  lottery for >25 min;
- h2d transfers are bandwidth-bound at ~20 MB/s AND block the calling host
  thread, but the device computes while a transfer is in flight when the
  `device_put` is issued from ANOTHER thread — `AsyncUploader` runs uploads
  on a worker so frame i's upload overlaps frame i-1's compute;
- small per-frame uploads (a 4x4 pose) cost ~5 ms, so the motion-model pose
  chain lives ON DEVICE: the program takes (T_last, T_prevlast) produced by
  the previous frame's program and returns the accepted-or-predicted pose
  pair for the next — zero uploads in steady state;
- images cross the tunnel as uint8 (4x cheaper than f32); the u8 -> f32
  conversion happens inside the program.

Semantics match the two-stage sync tracker (motion-model prediction,
coarse + fine projection search + pose LM, inlier acceptance gate); the
acceptance select runs in-program so the chain never waits on the host.
SURVEY §4.2 TrackWithMotionModel/TrackLocalMap bodies, restructured for the
tunnel's cost model.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.backend.pose_opt import PoseOptConfig
from tpuslam.frontend.frame import (
    FrameFeatures,
    FrontendParams,
    StereoParams,
    _fused_extract,
    _fused_stereo,
)
from tpuslam.frontend.matcher import ProjectionSearchParams
from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.se3 import se3_inverse, se3_orthonormalize


class FusedFrameOut(NamedTuple):
    feats: FrameFeatures  # stereo-associated left features (device)
    match_idx: jnp.ndarray  # (NL,) landmark -> frame slot
    inlier: jnp.ndarray  # (NL,) f32
    packed: jnp.ndarray  # (20,) f32: pose(16), n_matched, n_inliers, n_depth, accept
    T_last: jnp.ndarray  # (4, 4) accepted (or predicted) pose — chain forward
    T_prevlast: jnp.ndarray  # (4, 4) chain forward
    # hybrid extras (None in lines-only mode)
    pfeats: object = None  # PointFeatures with direct-stereo depths (device)
    p_match_idx: jnp.ndarray | None = None  # (NP,) point landmark -> corner slot
    p_inlier: jnp.ndarray | None = None  # (NP,) f32


def _extract_pair_body(pair, fe: FrontendParams):
    if pair.dtype != jnp.float32:
        pair = pair.astype(jnp.float32) / 255.0  # same rounding as the host path
    # lax.map over the stereo pair: ONE traced extract body (compile cost of
    # a single-image program; unrolling twice risks the >40 s compile cliff).
    # NOT vmap: batching reassociates the f32 reductions inside LSD enough to
    # flip near-tie CCL partitions on some frames, and the detection deltas
    # compound through the pose chain (verified: ATE 0.03 -> 0.38 over 20
    # frames). lax.map runs the exact single-image program per element.
    return jax.lax.map(lambda im: _fused_extract.__wrapped__(im, fe), pair)


_extract_pair = jax.jit(_extract_pair_body, static_argnums=(1,))


@partial(jax.jit, static_argnums=(1,))
def _extract_left(pair, fe: FrontendParams):
    """Left-image-only extract (direct-stereo split mode: the right camera
    is never detected on — kernels/stereo_direct.py)."""
    img = pair[0]
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32) / 255.0
    return _fused_extract.__wrapped__(img, fe)


def _track_pair_body(
    fl: FrameFeatures,
    fr: FrameFeatures,
    T_last,
    T_prevlast,
    lm_plucker,
    lm_ep3d,
    lm_bits,
    lm_validf,
    fxb: float,
    cam: Intrinsics,
    sp: StereoParams,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
):
    depth, okf = _fused_stereo.__wrapped__(
        fl.midpoint, fl.angle, fl.length, fl.desc_bits, fl.valid, fl.endpoints,
        fr.midpoint, fr.angle, fr.length, fr.desc_bits, fr.valid, fr.endpoints,
        fxb, sp, 10.0,
    )
    return _track_core_body(
        fl, depth, okf, T_last, T_prevlast, lm_plucker, lm_ep3d, lm_bits,
        lm_validf, cam, sc, sf, po, min_inliers,
    )


def _track_core_body(
    fl: FrameFeatures,
    depth,
    okf,
    T_last,
    T_prevlast,
    lm_plucker,
    lm_ep3d,
    lm_bits,
    lm_validf,
    cam: Intrinsics,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
):
    """Motion-model predict + coarse/fine projection-search pose LM +
    in-program acceptance (stereo association already done by the caller)."""
    from tpuslam.frontend.matcher import _track_stage_body

    # motion model on device: T_pred = (T_last @ inv(T_prevlast)) @ T_last
    T_pred = T_last @ se3_inverse(T_prevlast) @ T_last

    same_shape = sc._replace(radius=0.0) == sf._replace(radius=0.0)
    if same_shape:
        # scan the (coarse, fine) stages with a TRACED radius: the stage graph
        # (projection gate + MXU match + pose-LM scan) is emitted ONCE per
        # program — program size is what decides the remote-compile lottery
        # and the >30-40 s degradation cliff (PERF_NOTES.md)
        radii = jnp.asarray([sc.radius, sf.radius], jnp.float32)

        def stage(pose, r):
            res, m, n_matched = _track_stage_body(
                pose, lm_plucker, lm_ep3d, lm_bits, lm_validf,
                fl.midpoint, fl.angle, fl.desc_bits, fl.valid,
                fl.endpoints, fl.sigma, cam, sc, po, radius=r,
            )
            return res.pose, (m.idx, res.inlier_lines, n_matched, res.num_inliers)

        pose_f, (midx2, inl2, nm2, ni2) = jax.lax.scan(stage, T_pred, radii)
        midx, inlier, n_matched, n_inl = midx2[1], inl2[1], nm2[1], ni2[1]
    else:
        res_c, _, _ = _track_stage_body(
            T_pred, lm_plucker, lm_ep3d, lm_bits, lm_validf,
            fl.midpoint, fl.angle, fl.desc_bits, fl.valid,
            fl.endpoints, fl.sigma, cam, sc, po,
        )
        res_f, m_f, n_matched = _track_stage_body(
            res_c.pose, lm_plucker, lm_ep3d, lm_bits, lm_validf,
            fl.midpoint, fl.angle, fl.desc_bits, fl.valid,
            fl.endpoints, fl.sigma, cam, sf, po,
        )
        pose_f, midx, inlier, n_inl = res_f.pose, m_f.idx, res_f.inlier_lines, res_f.num_inliers

    acceptf = (n_inl >= min_inliers).astype(jnp.float32)
    # SO(3) projection: the chain feeds back through se3_inverse products
    # frame after frame; without this the orthogonality error compounds
    # exponentially (~x2.4/frame) and tracking collapses around frame 15
    T_acc = se3_orthonormalize(acceptf * pose_f + (1.0 - acceptf) * T_pred)
    # on reject: velocity resets to identity (T_prevlast' = T_acc)
    T_prev_next = acceptf * T_last + (1.0 - acceptf) * T_acc
    packed = jnp.concatenate(
        [
            T_acc.reshape(-1),
            n_matched[None].astype(jnp.float32),
            n_inl[None].astype(jnp.float32),
            jnp.sum(okf)[None],
            acceptf[None],
        ]
    )
    return depth, okf, midx, inlier, packed, T_acc, T_prev_next


def _split_track_args(fl: FrameFeatures, fr: FrameFeatures):
    """Exactly the feature fields the track program reads, flat (unused
    array args at jit boundaries trigger pathological compiles on this
    backend — PERF_NOTES.md rule 3)."""
    return (
        fl.midpoint, fl.angle, fl.length, fl.desc_bits, fl.valid,
        fl.endpoints, fl.sigma,
        fr.midpoint, fr.angle, fr.length, fr.desc_bits, fr.valid, fr.endpoints,
    )


@partial(jax.jit, static_argnums=(19, 20, 21, 22, 23, 24, 25))
def _track_pair(
    fl_mid, fl_ang, fl_len, fl_bits, fl_valid, fl_ep, fl_sigma,
    fr_mid, fr_ang, fr_len, fr_bits, fr_valid, fr_ep,
    T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    fxb: float, cam: Intrinsics, sp: StereoParams,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    fl = FrameFeatures(
        endpoints=fl_ep, valid=fl_valid, angle=fl_ang, length=fl_len,
        midpoint=fl_mid, response=None, level=None, sigma=fl_sigma,
        desc=None, desc_bits=fl_bits, depth=None, has_depth=None,
    )
    fr = FrameFeatures(
        endpoints=fr_ep, valid=fr_valid, angle=fr_ang, length=fr_len,
        midpoint=fr_mid, response=None, level=None, sigma=None,
        desc=None, desc_bits=fr_bits, depth=None, has_depth=None,
    )
    return _track_pair_body(
        fl, fr, T_last, T_prevlast, lm_plucker, lm_ep3d, lm_bits, lm_validf,
        fxb, cam, sp, sc, sf, po, min_inliers,
    )


def _fused_frame_direct_body(
    pair, T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    fxb: float, cam: Intrinsics, fe: FrontendParams, sd,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """Direct-stereo fused frame: detect + describe on the LEFT image only;
    line depths come from direct epipolar correlation against the right
    IMAGE (kernels/stereo_direct.py). Halves the detector cost — the single
    largest term in the frame budget (PERF_NOTES.md: ~18-22 ms/image x2
    under lax.map in the descriptor variant)."""
    from tpuslam.kernels.stereo_direct import direct_line_disparity_body

    if pair.dtype != jnp.float32:
        pair = pair.astype(jnp.float32) / 255.0
    fl = _fused_extract.__wrapped__(pair[0], fe)
    disp, okf = direct_line_disparity_body(
        pair[0], pair[1], fl.endpoints, fl.valid, fl.angle, sd
    )
    depth = okf[:, None] * fxb / jnp.maximum(disp, 1e-6)
    depth, okf, midx, inlier, packed, T_acc, T_prev = _track_core_body(
        fl, depth, okf, T_last, T_prevlast, lm_plucker, lm_ep3d, lm_bits,
        lm_validf, cam, sc, sf, po, min_inliers,
    )
    return fl, depth, okf, midx, inlier, packed, T_acc, T_prev


_fused_frame_direct = partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14))(
    _fused_frame_direct_body
)


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def _fused_chunk_direct(
    pairs, T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    fxb: float, cam: Intrinsics, fe: FrontendParams, sd,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """C consecutive direct-stereo frames in ONE dispatch: lax.scan of the
    single-frame body over a (C, 2, H, W) chunk, pose chain threaded through
    the scan carry. Amortizes the tunnel's ~4 ms/dispatch + per-upload RTT
    over C frames (the scan emits the frame body once, so the compile is a
    single-frame compile). All frames in a chunk match against the SAME
    local-map snapshot — the same staleness class as fuse_lag; the host
    binds observations through the snapshot ids at resolve time."""

    def step(chain, pair):
        fl, depth, okf, midx, inlier, packed, T_acc, T_prev = _fused_frame_direct_body(
            pair, chain[0], chain[1], lm_plucker, lm_ep3d, lm_bits, lm_validf,
            fxb, cam, fe, sd, sc, sf, po, min_inliers,
        )
        return (T_acc, T_prev), (fl, depth, okf, midx, inlier, packed)

    (T_l, T_p), (fl, depth, okf, midx, inlier, packed) = jax.lax.scan(
        step, (T_last, T_prevlast), pairs
    )
    return fl, depth, okf, midx, inlier, packed, T_l, T_p


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def _fused_chunk_semidirect(
    frames, T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    fxb: float, cam: Intrinsics, fe: FrontendParams, sd, ap,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """Semi-direct chunk: FULL detection + matching + pose LM on the first
    (anchor) frame only; the C-1 frames after it are tracked by direct
    photometric alignment against the local 3D line map — anchor-image
    templates slid perpendicular to each projected line, Gauss-Newton over
    point-to-projected-line residuals (kernels/align_direct.py). ONE device
    dispatch and ONE upload for the whole chunk.

    `frames`: (C+1, H, W) u8/f32: [L0, R0, L1, ..., L_{C-1}] — the anchor's
    stereo pair, then the following frames' LEFT images only (inter frames
    need no depth: keyframes are only made from anchors, so the right-camera
    bytes never cross the tunnel for them).

    The anchor's cost (~10 ms detect+track at half-res VGA) amortizes over C
    frames; each inter frame costs ~1-2 ms of gathers + GN. Inter packed
    rows report (n_samples_good, n_lines_good, 0, accept) in the counter
    slots — an aligned line is the acceptance-unit analog of a tracked
    inlier line."""
    from tpuslam.kernels.align_direct import align_frame_body, anchor_templates_body

    if frames.dtype != jnp.float32:
        frames = frames.astype(jnp.float32) / 255.0
    fl, depth, okf, midx, inlier, packed0, T_acc, T_prev = _fused_frame_direct_body(
        frames[:2], T_last, T_prevlast, lm_plucker, lm_ep3d, lm_bits, lm_validf,
        fxb, cam, fe, sd, sc, sf, po, min_inliers,
    )
    A = ap.align_cap
    plucker_a = lm_plucker[:A]
    tm = anchor_templates_body(frames[0], T_acc, lm_ep3d[:A], lm_validf[:A], cam, ap)

    def step(chain, img):
        T_l, T_p = chain
        T_pred = T_l @ se3_inverse(T_p) @ T_l
        T_new, n_samp, n_lines = align_frame_body(img, T_pred, plucker_a, tm, cam, ap)
        acceptf = (n_lines >= float(min_inliers)).astype(jnp.float32)
        T_i = se3_orthonormalize(acceptf * T_new + (1.0 - acceptf) * T_pred)
        T_p_next = acceptf * T_l + (1.0 - acceptf) * T_i
        packed_i = jnp.concatenate(
            [T_i.reshape(-1), n_samp[None], n_lines[None],
             jnp.zeros((1,), jnp.float32), acceptf[None]]
        )
        return (T_i, T_p_next), packed_i

    (T_l, T_p), packed_rest = jax.lax.scan(step, (T_acc, T_prev), frames[2:])
    packed = jnp.concatenate([packed0[None], packed_rest], axis=0)
    return fl, depth, okf, midx, inlier, packed, T_l, T_p


def _track_core_hybrid_body(
    fl: FrameFeatures,
    l_depth,
    l_okf,
    fp,  # PointFeatures (with direct-stereo depths)
    T_last,
    T_prevlast,
    lm_plucker,
    lm_ep3d,
    lm_bits,
    lm_validf,
    pm_xyz,
    pm_bits,
    pm_validf,
    cam: Intrinsics,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    pp,  # PointFrontendParams
    po: PoseOptConfig,
    min_inliers: int,
):
    """Hybrid (lines + points) analog of `_track_core_body`: one traced
    coarse/fine stage scanned over the line radius, both landmark families
    in a single pose LM per stage (SURVEY §3.1 `MapPoint`: the reference
    optimizes point and line edges in one g2o graph)."""
    from tpuslam.backend.pose_opt import pose_optimize
    from tpuslam.frontend.matcher import project_map_lines
    from tpuslam.geometry.camera import project_points
    from tpuslam.geometry.se3 import se3_apply
    from tpuslam.kernels.match import (
        _match_body,
        angle_penalty,
        midpoint_radius_penalty,
    )

    T_pred = T_last @ se3_inverse(T_prevlast) @ T_last
    radii = jnp.asarray([sc.radius, sf.radius], jnp.float32)

    def stage(pose, r, sp_=sc):
        # lines: project + radius/angle gate + MXU match
        _, mid, ang, visible = project_map_lines(pose, lm_ep3d, cam, sp_.min_z, sp_.margin)
        pen_l = midpoint_radius_penalty(mid, fl.midpoint, r) + angle_penalty(
            ang, fl.angle, sp_.angle_tol
        )
        vf_l = lm_validf * visible.astype(jnp.float32)
        ml = _match_body(lm_bits, vf_l, fl.desc_bits, fl.valid, pen_l, sp_.match)
        # points: project + radius gate + MXU match
        p_c = se3_apply(pose, pm_xyz)
        uv = project_points(cam, p_c)
        vis = (
            (p_c[:, 2] > pp.min_z)
            & (uv[:, 0] >= -20.0) & (uv[:, 0] < cam.width + 20.0)
            & (uv[:, 1] >= -20.0) & (uv[:, 1] < cam.height + 20.0)
        )
        vf_p = pm_validf * vis.astype(jnp.float32)
        pen_p = midpoint_radius_penalty(uv, fp.uv, pp.radius)
        mp = _match_body(pm_bits, vf_p, fp.desc_bits, fp.valid, pen_p, pp.match)
        # joint pose LM
        l_slot = jnp.maximum(ml.idx, 0)
        p_slot = jnp.maximum(mp.idx, 0)
        res = pose_optimize(
            pose,
            lm_plucker,
            fl.endpoints[l_slot],
            ml.valid,
            points=pm_xyz,
            p_uv=fp.uv[p_slot],
            p_valid=mp.valid,
            cam=cam,
            cfg=po,
            l_sigma=fl.sigma[l_slot],
        )
        n_matched = (jnp.sum(ml.valid) + jnp.sum(mp.valid)).astype(jnp.int32)
        return res.pose, (
            ml.idx, res.inlier_lines, mp.idx, res.inlier_points,
            n_matched, res.num_inliers,
        )

    same_shape = sc._replace(radius=0.0) == sf._replace(radius=0.0)
    if same_shape:
        # scan the (coarse, fine) stages with a TRACED radius: stage graph
        # emitted once per program (compile-size discipline, PERF_NOTES.md)
        pose_f, (midx2, linl2, pidx2, pinl2, nm2, ni2) = jax.lax.scan(
            stage, T_pred, radii
        )
        midx, l_inl = midx2[1], linl2[1]
        p_idx, p_inl = pidx2[1], pinl2[1]
        n_matched, n_inl = nm2[1], ni2[1]
    else:
        pose_c, _ = stage(T_pred, jnp.float32(sc.radius), sp_=sc)
        pose_f, (midx, l_inl, p_idx, p_inl, n_matched, n_inl) = stage(
            pose_c, jnp.float32(sf.radius), sp_=sf
        )

    acceptf = (n_inl >= min_inliers).astype(jnp.float32)
    T_acc = se3_orthonormalize(acceptf * pose_f + (1.0 - acceptf) * T_pred)
    T_prev_next = acceptf * T_last + (1.0 - acceptf) * T_acc
    packed = jnp.concatenate(
        [
            T_acc.reshape(-1),
            n_matched[None].astype(jnp.float32),
            n_inl[None].astype(jnp.float32),
            jnp.sum(l_okf)[None],
            acceptf[None],
        ]
    )
    return l_depth, l_okf, midx, l_inl, p_idx, p_inl, packed, T_acc, T_prev_next


def _fused_frame_hybrid_body(
    pair, T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    pm_xyz, pm_bits, pm_validf,
    fxb: float, cam: Intrinsics, fe: FrontendParams, sd, sdp, pp,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """Hybrid direct-stereo fused frame: LSD lines + FAST/BRIEF corners
    detected on the LEFT image only; line AND corner depths from direct
    epipolar correlation against the right IMAGE; both landmark families in
    one scanned coarse/fine pose LM; in-program acceptance. ONE dispatch."""
    from tpuslam.kernels.fast import detect_corners
    from tpuslam.kernels.stereo_direct import (
        direct_line_disparity_body,
        direct_point_disparity_body,
    )

    if pair.dtype != jnp.float32:
        pair = pair.astype(jnp.float32) / 255.0
    fl = _fused_extract.__wrapped__(pair[0], fe)
    fp = detect_corners.__wrapped__(pair[0], pp.max_points, pp.fast)
    if fe.prescaled and fe.base_scale != 1.0:
        # corners were detected on the host-prescaled image: report uv in
        # full-res coords like the line geometry (the direct-point kernel
        # maps back with sdp.coord_scale)
        fp = fp._replace(uv=fp.uv / fe.base_scale)
    l_disp, l_okf = direct_line_disparity_body(
        pair[0], pair[1], fl.endpoints, fl.valid, fl.angle, sd
    )
    l_depth = l_okf[:, None] * fxb / jnp.maximum(l_disp, 1e-6)
    p_disp, p_okf = direct_point_disparity_body(pair[0], pair[1], fp.uv, fp.valid, sdp)
    p_depth = p_okf * fxb / jnp.maximum(p_disp, 1e-6)
    p_okf = (
        p_okf
        * (p_depth > pp.min_depth).astype(jnp.float32)
        * (p_depth < pp.max_depth).astype(jnp.float32)
    )
    fp = fp._replace(depth=p_depth * p_okf, has_depth=p_okf)
    out = _track_core_hybrid_body(
        fl, l_depth, l_okf, fp, T_last, T_prevlast,
        lm_plucker, lm_ep3d, lm_bits, lm_validf,
        pm_xyz, pm_bits, pm_validf,
        cam, sc, sf, pp, po, min_inliers,
    )
    return (fl, fp) + out


_fused_frame_hybrid = partial(
    jax.jit, static_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18)
)(_fused_frame_hybrid_body)


@partial(jax.jit, static_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20))
def _fused_chunk_semidirect_hybrid(
    frames, T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    pm_xyz, pm_bits, pm_validf,
    fxb: float, cam: Intrinsics, fe: FrontendParams, sd, sdp, pp, ap,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """Hybrid semi-direct chunk: full point+line detection + joint pose LM
    on the anchor only; followers align photometrically against BOTH
    landmark families — line templates slid perpendicular to projections
    plus per-point orthogonal axis templates, one joint Gauss-Newton
    (kernels/align_direct.py `align_frame_hybrid_body`). Closes the
    round-3 gap where the flagship speed mode (semi-direct chunks) and the
    flagship robustness feature (hybrid points, SURVEY §3.1 MapPoint)
    were mutually exclusive. Same frame layout as `_fused_chunk_semidirect`:
    (C+1, H, W) = anchor pair + follower LEFT images, ONE dispatch."""
    from tpuslam.kernels.align_direct import (
        align_frame_hybrid_body,
        anchor_point_templates_body,
        anchor_templates_body,
    )

    if frames.dtype != jnp.float32:
        frames = frames.astype(jnp.float32) / 255.0
    (
        fl, fp, l_depth, l_okf, midx, l_inl, p_idx, p_inl, packed0, T_acc, T_prev
    ) = _fused_frame_hybrid_body(
        frames[:2], T_last, T_prevlast,
        lm_plucker, lm_ep3d, lm_bits, lm_validf,
        pm_xyz, pm_bits, pm_validf,
        fxb, cam, fe, sd, sdp, pp, sc, sf, po, min_inliers,
    )
    A, Ap = ap.align_cap, ap.point_cap
    plucker_a = lm_plucker[:A]
    tm = anchor_templates_body(frames[0], T_acc, lm_ep3d[:A], lm_validf[:A], cam, ap)
    tm_p = anchor_point_templates_body(
        frames[0], T_acc, pm_xyz[:Ap], pm_validf[:Ap], cam, ap
    )

    def step(chain, img):
        T_l, T_p = chain
        T_pred = T_l @ se3_inverse(T_p) @ T_l
        T_new, n_samp, n_units = align_frame_hybrid_body(
            img, T_pred, plucker_a, tm, tm_p, cam, ap
        )
        acceptf = (n_units >= float(min_inliers)).astype(jnp.float32)
        T_i = se3_orthonormalize(acceptf * T_new + (1.0 - acceptf) * T_pred)
        T_p_next = acceptf * T_l + (1.0 - acceptf) * T_i
        packed_i = jnp.concatenate(
            [T_i.reshape(-1), n_samp[None], n_units[None],
             jnp.zeros((1,), jnp.float32), acceptf[None]]
        )
        return (T_i, T_p_next), packed_i

    (T_l, T_p), packed_rest = jax.lax.scan(step, (T_acc, T_prev), frames[2:])
    packed = jnp.concatenate([packed0[None], packed_rest], axis=0)
    return (
        fl, fp, l_depth, l_okf, midx, l_inl, p_idx, p_inl, packed, T_l, T_p
    )


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def _fused_frame(
    pair, T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    fxb: float, cam: Intrinsics, fe: FrontendParams, sp: StereoParams,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """Single-program variant (TPUSLAM_FUSED_SPLIT=0): extract + track in one
    dispatch. Minimum wire overhead, but the compile is large enough to lose
    the remote-compile lottery regularly (observed >25 min), and one slow
    compile degrades EVERY later dispatch in the process."""
    feats2 = _extract_pair_body(pair, fe)
    fl = jax.tree_util.tree_map(lambda x: x[0], feats2)
    fr = jax.tree_util.tree_map(lambda x: x[1], feats2)
    depth, okf, midx, inlier, packed, T_acc, T_prev = _track_pair_body(
        fl, fr, T_last, T_prevlast, lm_plucker, lm_ep3d, lm_bits, lm_validf,
        fxb, cam, sp, sc, sf, po, min_inliers,
    )
    return fl, depth, okf, midx, inlier, packed, T_acc, T_prev


@partial(jax.jit, static_argnums=(14, 15, 16, 17, 18, 19, 20))
def _track_direct(
    pair,
    fl_mid, fl_ang, fl_len, fl_bits, fl_valid, fl_ep, fl_sigma,
    T_last, T_prevlast,
    lm_plucker, lm_ep3d, lm_bits, lm_validf,
    fxb: float, cam: Intrinsics, sd,
    sc: ProjectionSearchParams, sf: ProjectionSearchParams,
    po: PoseOptConfig, min_inliers: int,
):
    """Split-mode direct-stereo track program (counterpart of _track_pair):
    stereo depths from epipolar correlation on the image pair instead of
    right-camera features."""
    from tpuslam.kernels.stereo_direct import direct_line_disparity_body

    if pair.dtype != jnp.float32:
        pair = pair.astype(jnp.float32) / 255.0
    fl = FrameFeatures(
        endpoints=fl_ep, valid=fl_valid, angle=fl_ang, length=fl_len,
        midpoint=fl_mid, response=None, level=None, sigma=fl_sigma,
        desc=None, desc_bits=fl_bits, depth=None, has_depth=None,
    )
    disp, okf = direct_line_disparity_body(
        pair[0], pair[1], fl.endpoints, fl.valid, fl.angle, sd
    )
    depth = okf[:, None] * fxb / jnp.maximum(disp, 1e-6)
    return _track_core_body(
        fl, depth, okf, T_last, T_prevlast, lm_plucker, lm_ep3d, lm_bits,
        lm_validf, cam, sc, sf, po, min_inliers,
    )


def fused_stereo_frame(
    pair: jnp.ndarray,
    T_last: jnp.ndarray,
    T_prevlast: jnp.ndarray,
    local: dict,
    fxb: float,
    cam: Intrinsics,
    fe: FrontendParams,
    sp: StereoParams,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
    sd=None,
) -> FusedFrameOut:
    """One stereo tracking frame on device: ONE dispatch by default (the
    monolithic program measures 53 ms steady vs the split's 80 — the second
    dispatch's wire/executable overhead outweighs its faster compile), or
    TWO with TPUSLAM_FUSED_SPLIT=1 (extract-pair + stereo/track programs;
    each compiles in well under a minute when the monolithic compile keeps
    losing the remote-compile lottery).

    `sd` (DirectStereoParams, optional): direct epipolar stereo — detect +
    describe the LEFT image only and recover line depths by correlating
    against the right IMAGE in-program (kernels/stereo_direct.py). Skips the
    right-camera detect+LBD entirely (the largest single term in the frame
    budget)."""
    import os

    split = os.environ.get("TPUSLAM_FUSED_SPLIT", "0") == "1"
    if sd is not None:
        if split:
            fl = _extract_left(pair, fe)
            depth, okf, midx, inlier, packed, T_acc, T_prev = _track_direct(
                pair,
                fl.midpoint, fl.angle, fl.length, fl.desc_bits, fl.valid,
                fl.endpoints, fl.sigma,
                T_last, T_prevlast,
                local["plucker"], local["ep3d"], local["bits"], local["valid"],
                float(fxb), cam, sd, sc, sf, po, int(min_inliers),
            )
        else:
            fl, depth, okf, midx, inlier, packed, T_acc, T_prev = _fused_frame_direct(
                pair, T_last, T_prevlast,
                local["plucker"], local["ep3d"], local["bits"], local["valid"],
                float(fxb), cam, fe, sd, sc, sf, po, int(min_inliers),
            )
    elif split:
        feats2 = _extract_pair(pair, fe)
        fl = jax.tree_util.tree_map(lambda x: x[0], feats2)
        fr = jax.tree_util.tree_map(lambda x: x[1], feats2)
        depth, okf, midx, inlier, packed, T_acc, T_prev = _track_pair(
            *_split_track_args(fl, fr), T_last, T_prevlast,
            local["plucker"], local["ep3d"], local["bits"], local["valid"],
            float(fxb), cam, sp, sc, sf, po, int(min_inliers),
        )
    else:
        fl, depth, okf, midx, inlier, packed, T_acc, T_prev = _fused_frame(
            pair, T_last, T_prevlast,
            local["plucker"], local["ep3d"], local["bits"], local["valid"],
            float(fxb), cam, fe, sp, sc, sf, po, int(min_inliers),
        )
    feats = fl._replace(depth=depth, has_depth=okf)
    return FusedFrameOut(
        feats=feats,
        match_idx=midx,
        inlier=inlier,
        packed=packed,
        T_last=T_acc,
        T_prevlast=T_prev,
    )


def fused_stereo_chunk(
    pairs: jnp.ndarray,
    T_last: jnp.ndarray,
    T_prevlast: jnp.ndarray,
    local: dict,
    fxb: float,
    cam: Intrinsics,
    fe: FrontendParams,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
    sd,
) -> FusedFrameOut:
    """C consecutive stereo tracking frames in one dispatch (direct-stereo
    only). Per-frame fields of the returned FusedFrameOut carry a leading
    (C,) chunk axis; T_last/T_prevlast are the final chain state."""
    fl, depth, okf, midx, inlier, packed, T_l, T_p = _fused_chunk_direct(
        pairs, T_last, T_prevlast,
        local["plucker"], local["ep3d"], local["bits"], local["valid"],
        float(fxb), cam, fe, sd, sc, sf, po, int(min_inliers),
    )
    feats = fl._replace(depth=depth, has_depth=okf)
    return FusedFrameOut(
        feats=feats,
        match_idx=midx,
        inlier=inlier,
        packed=packed,
        T_last=T_l,
        T_prevlast=T_p,
    )


def fused_stereo_semidirect(
    frames: jnp.ndarray,
    T_last: jnp.ndarray,
    T_prevlast: jnp.ndarray,
    local: dict,
    fxb: float,
    cam: Intrinsics,
    fe: FrontendParams,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
    sd,
    ap,
) -> FusedFrameOut:
    """Semi-direct chunk wrapper: anchor frame fully tracked, C-1 follower
    frames aligned photometrically (see `_fused_chunk_semidirect`). The
    returned FusedFrameOut carries the ANCHOR's single-frame features/match
    arrays and a (C, 20) `packed` with one row per frame."""
    fl, depth, okf, midx, inlier, packed, T_l, T_p = _fused_chunk_semidirect(
        frames, T_last, T_prevlast,
        local["plucker"], local["ep3d"], local["bits"], local["valid"],
        float(fxb), cam, fe, sd, ap, sc, sf, po, int(min_inliers),
    )
    feats = fl._replace(depth=depth, has_depth=okf)
    return FusedFrameOut(
        feats=feats,
        match_idx=midx,
        inlier=inlier,
        packed=packed,
        T_last=T_l,
        T_prevlast=T_p,
    )


def fused_stereo_semidirect_hybrid(
    frames: jnp.ndarray,
    T_last: jnp.ndarray,
    T_prevlast: jnp.ndarray,
    local: dict,
    plocal: dict,
    fxb: float,
    cam: Intrinsics,
    fe: FrontendParams,
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
    sd,
    sdp,
    pp,
    ap,
) -> FusedFrameOut:
    """Hybrid semi-direct chunk wrapper: anchor fully tracked against lines
    AND points, followers aligned photometrically against both families
    (see `_fused_chunk_semidirect_hybrid`). The returned FusedFrameOut
    carries the ANCHOR's single-frame feature/match arrays (both families)
    and a (C, 20) `packed` with one row per frame."""
    (
        fl, fp, l_depth, l_okf, midx, l_inl, p_idx, p_inl, packed, T_l, T_p
    ) = _fused_chunk_semidirect_hybrid(
        frames, T_last, T_prevlast,
        local["plucker"], local["ep3d"], local["bits"], local["valid"],
        plocal["xyz"], plocal["bits"], plocal["valid"],
        float(fxb), cam, fe, sd, sdp, pp, ap, sc, sf, po, int(min_inliers),
    )
    feats = fl._replace(depth=l_depth, has_depth=l_okf)
    return FusedFrameOut(
        feats=feats,
        match_idx=midx,
        inlier=l_inl,
        packed=packed,
        T_last=T_l,
        T_prevlast=T_p,
        pfeats=fp,
        p_match_idx=p_idx,
        p_inlier=p_inl,
    )


def fused_stereo_frame_hybrid(
    pair: jnp.ndarray,
    T_last: jnp.ndarray,
    T_prevlast: jnp.ndarray,
    local: dict,
    plocal: dict,
    fxb: float,
    cam: Intrinsics,
    fe: FrontendParams,
    sd,  # DirectStereoParams (lines)
    sdp,  # DirectPointStereoParams (corners)
    pp,  # PointFrontendParams
    sc: ProjectionSearchParams,
    sf: ProjectionSearchParams,
    po: PoseOptConfig,
    min_inliers: int,
) -> FusedFrameOut:
    """One hybrid (line+point) stereo tracking frame: ONE device dispatch,
    left-only detection, direct epipolar depths for both families."""
    (
        fl, fp, l_depth, l_okf, midx, l_inl, p_idx, p_inl, packed, T_acc, T_prev
    ) = _fused_frame_hybrid(
        pair, T_last, T_prevlast,
        local["plucker"], local["ep3d"], local["bits"], local["valid"],
        plocal["xyz"], plocal["bits"], plocal["valid"],
        float(fxb), cam, fe, sd, sdp, pp, sc, sf, po, int(min_inliers),
    )
    feats = fl._replace(depth=l_depth, has_depth=l_okf)
    return FusedFrameOut(
        feats=feats,
        match_idx=midx,
        inlier=l_inl,
        packed=packed,
        T_last=T_acc,
        T_prevlast=T_prev,
        pfeats=fp,
        p_match_idx=p_idx,
        p_inlier=p_inl,
    )


class AsyncUploader:
    """Uploads frame images to the device from a worker thread.

    `jax.device_put` blocks the CALLING thread for the full transfer
    (~35 ms for a VGA stereo pair at the tunnel's ~20 MB/s), but the device
    executes already-enqueued programs concurrently — so a worker thread
    turns the upload into pipeline overlap instead of added latency.
    """

    _instances = None  # class-level WeakSet, created on first construction

    def __init__(self, depth: int = 2):
        self._jobs: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = None
        cls = AsyncUploader
        if cls._instances is None:
            import weakref

            cls._instances = weakref.WeakSet()
        cls._instances.add(self)

    def _ensure_thread(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()

    def _worker(self):
        while True:
            job = self._jobs.get()
            if job is None:
                return
            arrays, slot, event = job
            try:
                slot.append(tuple(jax.device_put(a) for a in arrays))
            except Exception as e:  # surfaced by get()
                slot.append(e)
            event.set()

    def submit(self, *arrays: np.ndarray):
        """Enqueue an upload; returns a handle whose .get() yields the
        device arrays (blocking until the transfer completed)."""
        self._ensure_thread()
        slot: list = []
        event = threading.Event()
        self._jobs.put((arrays, slot, event))

        class _Handle:
            def get(self, timeout: float = 120.0):
                if not event.wait(timeout):
                    raise TimeoutError("device upload timed out")
                if isinstance(slot[0], Exception):
                    raise slot[0]
                return slot[0]

        return _Handle()

    def close(self):
        if self._thread is not None and self._thread.is_alive():
            self._jobs.put(None)
            self._thread.join(timeout=5.0)
            self._thread = None

    @classmethod
    def close_all(cls):
        """Close every live uploader (test-suite hygiene: trackers built
        without a System.shutdown() path would otherwise each leak a daemon
        thread for the life of the process)."""
        for up in list(cls._instances or ()):
            up.close()
