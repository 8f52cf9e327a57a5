"""Hybrid points in the semi-direct chunk mode (VERDICT r3 item 6).

Round 3 left the flagship speed mode (semi-direct chunks) and the flagship
robustness feature (hybrid points, SURVEY §3.1 MapPoint) mutually
exclusive: `_chunk_size()` forced chunk=1 whenever points were enabled.
The `_fused_chunk_semidirect_hybrid` program closes that: the anchor
tracks both families through the joint pose LM, and followers align
photometrically against lines AND per-point orthogonal axis templates in
one Gauss-Newton (kernels/align_direct.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytest.importorskip("cv2")

from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.points import PointFrontendParams
from tpuslam.frontend.tracking import TrackerConfig, TrackingState
from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.se3 import se3_log
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.align_direct import (
    DirectAlignParams,
    PointAlignTemplates,
    align_frame_hybrid_body,
    anchor_point_templates_body,
    anchor_templates_body,
)
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System

CAM = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, baseline=0.1)


def _render_seq(rng, n_frames, n_segments, n_points, motion_scale=0.012):
    scene = make_wireframe_scene(
        rng, n_segments=n_segments, n_points=n_points, n_frames=n_frames,
        cam=CAM, motion_scale=motion_scale,
    )
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -CAM.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    frames = []
    for f in range(n_frames):
        il = render_wireframe_image(scene, f, noise=1.0, rng=rng, draw_points=True)
        ir = render_wireframe_image(scene_r, f, noise=1.0, rng=rng, draw_points=True)
        frames.append((il, ir))
    return scene, frames


def test_point_align_recovers_pose(rng):
    """Point-only alignment: axis templates from frame 0 at the true pose;
    aligning frame k seeded with frame k-1's pose must shrink the error —
    the dots alone carry the pose when no line templates exist."""
    scene = make_wireframe_scene(
        rng, n_segments=4, n_points=120, n_frames=5, cam=CAM, motion_scale=0.02
    )
    p = DirectAlignParams(align_cap=8, point_cap=256)
    P = p.point_cap
    xyz = np.zeros((P, 3), np.float32)
    npts = min(scene.points.shape[0], P)
    xyz[:npts] = scene.points[:npts]
    validf = np.zeros((P,), np.float32)
    validf[:npts] = 1.0
    img0 = (
        render_wireframe_image(scene, 0, draw_points=True).astype(np.float32) / 255.0
    )
    tm_p = anchor_point_templates_body(
        jnp.asarray(img0), jnp.asarray(scene.poses[0]), jnp.asarray(xyz),
        jnp.asarray(validf), CAM, p,
    )
    n_valid = float(np.asarray(tm_p.tvalid).all(-1).sum())
    assert n_valid > 40, f"only {n_valid} two-axis point templates"
    # empty line family: all-invalid templates of static cap shape
    A, S, Wt = p.align_cap, p.n_samples, p.template
    from tpuslam.kernels.align_direct import AlignTemplates

    tm_l = AlignTemplates(
        p3d=jnp.zeros((A, S, 3), jnp.float32),
        tmpl=jnp.zeros((A, S, Wt), jnp.float32),
        vert=jnp.zeros((A,), jnp.float32),
        tvalid=jnp.zeros((A, S), jnp.float32),
    )
    plucker = jnp.zeros((A, 6), jnp.float32).at[:, 3].set(1.0)
    for k in (1, 2):
        imgk = (
            render_wireframe_image(scene, k, draw_points=True).astype(np.float32)
            / 255.0
        )
        T_true = scene.poses[k]
        T_pred = scene.poses[k - 1]
        T_new, n_samp, n_units = align_frame_hybrid_body(
            jnp.asarray(imgk), jnp.asarray(T_pred), plucker, tm_l, tm_p, CAM, p
        )
        err_pred = np.linalg.norm(se3_log(jnp.asarray(T_pred @ np.linalg.inv(T_true))))
        err_new = np.linalg.norm(
            se3_log(jnp.asarray(np.asarray(T_new) @ np.linalg.inv(T_true)))
        )
        assert float(n_units) >= 15, (k, float(n_units))
        assert err_new < 0.4 * err_pred + 1e-3, (k, err_pred, err_new)


def _run_system(frames, tcfg):
    sys_ = System(
        CAM, sensor="stereo", loop_closing=False, mapping=True, tracker_cfg=tcfg
    )
    for f, (il, ir) in enumerate(frames):
        sys_.track_stereo(il, ir, f * 0.05)
    sys_.shutdown()
    return sys_


def _base_cfg(points: bool):
    return TrackerConfig(
        pipelined=True,
        chunk=4,
        min_init_lines=6,
        min_track_matches=6,
        min_track_inliers=6,
        direct_stereo=DirectStereoParams(max_disp=64.0),
        semidirect=DirectAlignParams(align_cap=256),
        points=PointFrontendParams() if points else None,
    )


def test_hybrid_semidirect_one_dispatch_per_chunk(rng):
    """TrackerConfig(points=..., chunk=4, semidirect=...) must actually run
    the chunked hybrid program (chunk size not silently degraded to 1) and
    track a normal scene."""
    n = 14
    scene, frames = _render_seq(rng, n, n_segments=100, n_points=60)
    tcfg = _base_cfg(points=True)
    sys_ = _run_system(frames, tcfg)
    assert sys_.tracker._chunk_size() == 4  # the r3 exclusion is gone
    traj = sorted(sys_.trajectory, key=lambda r: r.frame_idx)
    assert sorted(r.frame_idx for r in traj) == list(range(n))
    assert all(r.state == TrackingState.OK for r in traj[2:])
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj])
    ate = absolute_trajectory_error(est, gt)
    assert ate.rmse < 0.05, ate
    # hybrid anchors feed point landmarks into the map
    assert len(sys_.map.points.live_ids()) > 0


def test_hybrid_semidirect_survives_line_sparse_scene(rng):
    """The scene that motivates hybrid: almost no line structure, plenty of
    dots. The hybrid chunk mode must keep tracking with good accuracy;
    lines-only must come out worse (or lose tracking)."""
    n = 14
    scene, frames = _render_seq(rng, n, n_segments=6, n_points=140)

    hyb = _run_system(frames, _base_cfg(points=True))
    traj_h = sorted(hyb.trajectory, key=lambda r: r.frame_idx)
    ok_h = [r for r in traj_h if r.state == TrackingState.OK]
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in ok_h])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in ok_h])
    ate_h = absolute_trajectory_error(est, gt)
    assert len(ok_h) >= n - 2, f"hybrid lost tracking: {len(ok_h)}/{n}"
    assert ate_h.rmse < 0.06, ate_h

    lines_only = _run_system(frames, _base_cfg(points=False))
    traj_l = sorted(lines_only.trajectory, key=lambda r: r.frame_idx)
    ok_l = [r for r in traj_l if r.state == TrackingState.OK]
    if len(ok_l) >= n - 2:
        est_l = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in ok_l])
        gt_l = np.stack(
            [np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in ok_l]
        )
        ate_l = absolute_trajectory_error(est_l, gt_l)
        # points must buy accuracy on the line-sparse scene
        assert ate_l.rmse > ate_h.rmse, (ate_l, ate_h)
    # else: lines-only lost tracking outright — hybrid's survival IS the win
