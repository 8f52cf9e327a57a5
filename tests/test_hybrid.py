"""Hybrid point+line tracking end-to-end (SURVEY §3.1 `MapPoint`, [P:6]).

The fixture renders the wireframe scene's 3D points as dots (with per-point
satellite patterns so BRIEF descriptors are distinctive — see
render_wireframe_image). On a line-SPARSE scene, lines alone under-constrain
the pose; the hybrid tracker must do measurably better."""

import numpy as np
import jax.numpy as jnp
import pytest

pytest.importorskip("cv2")

from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.points import PointFrontendParams, extract_points, stereo_point_depths
from tpuslam.frontend.tracking import TrackerConfig, TrackingState
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, observe_frame, render_wireframe_image
from tpuslam.system import System

CAM = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, baseline=0.1)


def _render_seq(rng, n_frames, n_segments, n_points):
    scene = make_wireframe_scene(
        rng, n_segments=n_segments, n_points=n_points, n_frames=n_frames,
        cam=CAM, motion_scale=0.012,
    )
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -CAM.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    frames = []
    for f in range(n_frames):
        il = render_wireframe_image(scene, f, noise=1.0, rng=rng, draw_points=True)
        ir = render_wireframe_image(scene_r, f, noise=1.0, rng=rng, draw_points=True)
        frames.append((il, ir))
    return scene, scene_r, frames


def test_stereo_point_depths(rng):
    """Associated corner disparities recover metric depth of the dots."""
    scene, scene_r, frames = _render_seq(rng, 1, n_segments=10, n_points=80)
    pp = PointFrontendParams()
    il, ir = frames[0]
    pl = extract_points(jnp.asarray(il.astype(np.float32) / 255.0), pp)
    pr = extract_points(jnp.asarray(ir.astype(np.float32) / 255.0), pp)
    feats = stereo_point_depths(pl, pr, CAM.fx * CAM.baseline, pp)
    ok = np.asarray(feats.has_depth) > 0.5
    assert ok.sum() >= 15, f"only {ok.sum()} stereo point depths"
    # ground truth: nearest projected scene point's camera depth
    obs = observe_frame(scene, 0)
    gt_uv = obs.pt_uv[obs.pt_visible]
    Xc = scene.points[obs.pt_visible] @ scene.poses[0][:3, :3].T + scene.poses[0][:3, 3]
    gt_z = Xc[:, 2]
    uv = np.asarray(feats.uv)[ok]
    z = np.asarray(feats.depth)[ok]
    d = np.linalg.norm(uv[:, None, :] - gt_uv[None, :, :], axis=-1)
    nearest = np.argmin(d, axis=1)
    close = d[np.arange(len(uv)), nearest] < 2.0
    assert close.sum() >= 10
    rel = np.abs(z[close] - gt_z[nearest[close]]) / gt_z[nearest[close]]
    assert np.median(rel) < 0.05, f"median depth error {np.median(rel):.3f}"


def _run(frames, scene, points):
    cfg = TrackerConfig(
        min_init_lines=8,
        min_track_matches=6,
        min_track_inliers=6,
        max_frames_between_kf=4,  # force keyframes: multi-observation
        # landmarks + point blocks in local BA within a short sequence
        points=PointFrontendParams() if points else None,
    )
    sys_ = System(CAM, sensor="stereo", loop_closing=False, mapping=True, tracker_cfg=cfg)
    for f, (il, ir) in enumerate(frames):
        sys_.track_stereo(il, ir, f * 0.05)
    sys_.shutdown()
    traj = sys_.trajectory
    ok = [r for r in traj if r.state == TrackingState.OK]
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj])
    return absolute_trajectory_error(est, gt).rmse, len(ok), sys_


def test_hybrid_tracks_sparse_line_scene(rng):
    """On a line-sparse scene the hybrid tracker stays accurate; the map
    carries live multi-observation point landmarks through local BA."""
    n = 12
    scene, _, frames = _render_seq(rng, n, n_segments=22, n_points=130)
    ate_h, ok_h, sys_h = _run(frames, scene, points=True)
    assert ok_h == n, f"hybrid lost tracking ({ok_h}/{n} OK)"
    assert ate_h < 0.05, f"hybrid ATE {ate_h:.3f}"
    pts = sys_h.map.points
    live = pts.live_ids()
    assert len(live) >= 20, f"only {len(live)} point landmarks"
    assert (pts.n_obs[live] >= 2).sum() >= 5, "no multi-observation points"
    assert np.isfinite(pts.xyz[live]).all()

    # lines alone must do measurably worse here (more drift or lost frames)
    ate_l, ok_l, _ = _run(frames, scene, points=False)
    assert (ok_h > ok_l) or (ate_h < ate_l), (
        f"hybrid (ate={ate_h:.3f}, ok={ok_h}) not better than "
        f"lines-only (ate={ate_l:.3f}, ok={ok_l})"
    )


def test_hybrid_fused_direct_pipeline(rng):
    """Hybrid points through the FUSED pipeline (direct epipolar stereo,
    left-only detection): one device dispatch per frame carrying lines AND
    corners. VERDICT round-2 item 5 — enabling points must no longer force
    the sync path."""
    from tpuslam.kernels.stereo_direct import DirectStereoParams

    n = 12
    scene, _, frames = _render_seq(rng, n, n_segments=22, n_points=130)
    cfg = TrackerConfig(
        min_init_lines=8,
        min_track_matches=6,
        min_track_inliers=6,
        max_frames_between_kf=4,
        points=PointFrontendParams(),
        direct_stereo=DirectStereoParams(max_disp=64.0),
        pipelined=True,
    )
    sys_ = System(CAM, sensor="stereo", loop_closing=False, mapping=True, tracker_cfg=cfg)
    assert sys_.tracker._use_fused(), "hybrid+direct must take the fused path"
    for f, (il, ir) in enumerate(frames):
        sys_.track_stereo(il, ir, f * 0.05)
    sys_.shutdown()
    traj = sys_.trajectory
    assert sorted(r.frame_idx for r in traj) == list(range(n))
    ok = [r for r in traj if r.state == TrackingState.OK]
    assert len(ok) == n, f"lost tracking ({len(ok)}/{n} OK)"
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj])
    ate = absolute_trajectory_error(est, gt).rmse
    assert ate < 0.05, f"fused hybrid ATE {ate:.3f}"
    # the map must carry BOTH landmark families with multi-observations
    pts = sys_.map.points
    live = pts.live_ids()
    assert len(live) >= 15, f"only {len(live)} point landmarks"
    assert (pts.n_obs[live] >= 2).sum() >= 3, "no multi-observation points"
    assert len(sys_.map.lines.live_ids()) >= 10


def _render_mono_seq(rng, n_frames, n_segments, n_points, step=0.08):
    """Sideways-translating mono sequence (parallax for 2-view init and
    for the mapper's two-view point triangulation)."""
    scene = make_wireframe_scene(
        rng, n_segments=n_segments, n_points=n_points, n_frames=2, cam=CAM
    )
    poses = []
    for f in range(n_frames):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -f * step
        T[1, 3] = 0.02 * np.sin(f * 0.5)
        poses.append(T)
    scene = scene._replace(poses=np.stack(poses))
    frames = [
        render_wireframe_image(scene, f, noise=1.0, rng=rng, draw_points=True)
        for f in range(n_frames)
    ]
    return scene, frames


def _run_mono(frames, scene, points):
    cfg = TrackerConfig(
        min_init_lines=8,
        min_track_matches=6,
        min_track_inliers=6,
        max_frames_between_kf=3,
        points=PointFrontendParams() if points else None,
    )
    sys_ = System(CAM, sensor="mono", loop_closing=False, mapping=True, tracker_cfg=cfg)
    states = []
    for f, img in enumerate(frames):
        sys_.track_monocular(img, f * 0.05)
        states.append(sys_.tracker.state)
    sys_.shutdown()
    traj = sys_.trajectory
    ok = [r for r in traj if r.state == TrackingState.OK]
    if len(ok) < 4:
        return np.inf, len(ok), sys_
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in ok])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in ok])
    ate = absolute_trajectory_error(est, gt, with_scale=True).rmse  # mono: scale free
    return ate, len(ok), sys_


def test_mono_hybrid_sequence(rng):
    """Mono hybrid (VERDICT r2 item 5): corners tracked in the mono pose LM,
    map points born from epipolar-gated two-view triangulation in the mapper
    (LocalMapper._create_new_mappoints), multi-observation point landmarks
    in the map, and accuracy at least as good as lines-only."""
    n = 16
    scene, frames = _render_mono_seq(rng, n, n_segments=24, n_points=130)
    ate_h, ok_h, sys_h = _run_mono(frames, scene, points=True)
    assert ok_h >= n - 6, f"mono hybrid tracked only {ok_h}/{n}"
    assert ate_h < 0.08, f"mono hybrid ATE {ate_h:.3f}"
    pts = sys_h.map.points
    live = pts.live_ids()
    assert len(live) >= 10, f"only {len(live)} mono point landmarks"
    assert (pts.n_obs[live] >= 2).sum() >= 5, "no multi-observation mono points"
    assert np.isfinite(pts.xyz[live]).all()
    # triangulated points sit in front of the keyframes (cheirality held)
    kf0 = min(sys_h.map.keyframes)
    T0 = sys_h.map.keyframes[kf0].T_cw
    z = (pts.xyz[live] @ T0[:3, :3].T + T0[:3, 3])[:, 2]
    assert (z > 0).mean() > 0.9

    ate_l, ok_l, _ = _run_mono(frames, scene, points=False)
    assert (ok_h > ok_l) or (ate_h <= ate_l * 1.5), (
        f"mono hybrid (ate={ate_h:.3f}, ok={ok_h}) much worse than "
        f"lines-only (ate={ate_l:.3f}, ok={ok_l})"
    )


def test_hybrid_map_roundtrip(rng, tmp_path):
    """Point landmarks and per-KF point features survive save/load."""
    from tpuslam.slammap.serialize import load_map, save_map

    n = 8
    scene, _, frames = _render_seq(rng, n, n_segments=25, n_points=100)
    _, _, sys_ = _run(frames, scene, points=True)
    p = str(tmp_path / "hybrid_map.npz")
    save_map(sys_.map, p)
    m2 = load_map(p)
    assert sorted(m2.keyframes) == sorted(sys_.map.keyframes)
    np.testing.assert_array_equal(m2.points.alive, sys_.map.points.alive)
    np.testing.assert_allclose(m2.points.xyz, sys_.map.points.xyz)
    assert m2.points.obs == sys_.map.points.obs
    for kid, kf in sys_.map.keyframes.items():
        kf2 = m2.keyframes[kid]
        if kf.point_ids is not None:
            np.testing.assert_array_equal(kf2.point_ids, kf.point_ids)
            np.testing.assert_allclose(kf2.point_features.uv, kf.point_features.uv)
