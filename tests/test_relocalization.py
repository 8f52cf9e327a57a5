"""Failure detection / recovery (SURVEY §7): tracking loss -> relocalize.

Fault injection: frames with no usable features (sensor blackout) force the
LOST state; after the blackout the tracker must relocalize against the
keyframe database and continue with a consistent pose.
"""

import numpy as np

from tpuslam.backend.loop_closing import KeyFrameDatabase
from tpuslam.backend.mapping import LocalMapper, MapperConfig
from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
from tpuslam.geometry import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


def test_blackout_then_relocalize():
    rng = np.random.default_rng(17)
    n_frames = 24
    scene = make_wireframe_scene(
        rng, n_segments=150, n_frames=n_frames, cam=CAM, motion_scale=0.02
    )
    from tpuslam.slammap.map import SlamMap

    smap = SlamMap()
    tracker = Tracker(CAM, smap, TrackerConfig(max_frames_between_kf=4))
    mapper = LocalMapper(smap, CAM, MapperConfig())
    db = KeyFrameDatabase()
    tracker.kf_db = db

    def on_kf(kf):
        mapper.process(kf)
        db.add(kf)

    tracker.on_new_keyframe = on_kf
    mapper.on_map_changed = tracker.invalidate_local_map

    states = []
    poses = []
    blackout = set(range(12, 16))
    for f in range(n_frames):
        feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng, with_depth=True)
        if f in blackout:
            feats = feats._replace(valid=np.zeros_like(np.asarray(feats.valid)))
        tracker.frame_idx = f
        r = tracker._track(feats, timestamp=f * 0.05, stereo=True)
        states.append(r.state)
        poses.append(r.T_cw)

    assert states[11] == TrackingState.OK
    assert any(s == TrackingState.LOST for s in states[12:16])
    # recovery after blackout
    assert states[-1] == TrackingState.OK
    assert tracker.n_relocalizations >= 1
    # recovered pose consistent with ground truth (rigid-align last 5 frames)
    est = np.stack([np.linalg.inv(p)[:3, 3] for p in poses[-5:]])
    gt = np.stack([np.linalg.inv(scene.poses[f])[:3, 3] for f in range(n_frames - 5, n_frames)])
    from tpuslam.eval.ate import absolute_trajectory_error

    # can't align 5 pts rigidly without bias; compare relative displacement
    d_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1)
    assert np.allclose(d_est, d_gt, atol=0.05)


def test_track_reference_keyframe_fallback(rng):
    """A single bad motion-model frame must recover via the reference-KF
    descriptor fallback WITHOUT entering LOST (SURVEY §4.2
    TrackReferenceKeyFrame between motion-model failure and relocalization)."""
    from tpuslam.backend.mapping import LocalMapper, MapperConfig
    from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
    from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
    from tpuslam.slammap.map import SlamMap
    from tpuslam.geometry import Intrinsics, se3_exp
    import jax.numpy as jnp

    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=12, cam=cam, motion_scale=0.02)
    smap = SlamMap()
    tracker = Tracker(cam, smap, TrackerConfig())
    mapper = LocalMapper(smap, cam, MapperConfig())
    tracker.on_new_keyframe = mapper.process
    mapper.on_map_changed = tracker.invalidate_local_map

    for f in range(8):
        feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng, with_depth=True)
        tracker.frame_idx = f
        r = tracker._track(feats, f * 0.05, stereo=True)
        assert r.state == TrackingState.OK

    # corrupt the motion model: predicted pose lands the projection search
    # far from every landmark (coarse radius is 50 px)
    bad = np.asarray(se3_exp(jnp.asarray([1.5, -1.2, 0.8, 0.3, -0.2, 0.25], jnp.float32)))
    tracker.velocity = bad.astype(np.float32)
    feats, _ = synthetic_frame_features(scene, 8, noise_px=0.3, rng=rng, with_depth=True)
    tracker.frame_idx = 8
    r = tracker._track(feats, 0.4, stereo=True)
    assert r.state == TrackingState.OK, "fallback should rescue the frame"
    assert tracker.n_relocalizations == 0, "must not have needed relocalization"
    # recovered pose close to ground truth
    err = np.linalg.norm(np.linalg.inv(r.T_cw)[:3, 3] - np.linalg.inv(scene.poses[8])[:3, 3])
    assert err < 0.1, err
    # and the next ordinary frame keeps tracking
    feats, _ = synthetic_frame_features(scene, 9, noise_px=0.3, rng=rng, with_depth=True)
    tracker.frame_idx = 9
    r = tracker._track(feats, 0.45, stereo=True)
    assert r.state == TrackingState.OK


def test_line_sparse_hybrid_relocalization(rng):
    """Hybrid place recognition (VERDICT r2 item 5): on a line-SPARSE scene
    the keyframe database rows carry BRIEF corner descriptors next to the
    line LBDs, and the LOST->relocalize path recovers through the hybrid
    pose step (corners carry the pose where lines are too few)."""
    import pytest

    pytest.importorskip("cv2")
    from tpuslam.frontend.points import PointFrontendParams
    from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
    from tpuslam.system import System

    cam = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, baseline=0.1)
    n = 16
    scene = make_wireframe_scene(
        rng, n_segments=10, n_points=140, n_frames=n, cam=cam, motion_scale=0.012
    )
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    frames = [
        (
            render_wireframe_image(scene, f, noise=1.0, rng=rng, draw_points=True),
            render_wireframe_image(scene_r, f, noise=1.0, rng=rng, draw_points=True),
        )
        for f in range(n)
    ]
    blackout = set(range(9, 12))
    black = np.zeros_like(frames[0][0])

    cfg = TrackerConfig(
        min_init_lines=4,
        min_track_matches=6,
        min_track_inliers=6,
        max_frames_between_kf=3,
        points=PointFrontendParams(),
    )
    sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=True, tracker_cfg=cfg)
    states = []
    for f, (il, ir) in enumerate(frames):
        if f in blackout:
            sys_.track_stereo(black, black, f * 0.05)
        else:
            sys_.track_stereo(il, ir, f * 0.05)
        states.append(sys_.tracker.state)
    assert states[8] == TrackingState.OK, "tracking must be established pre-blackout"
    assert any(s == TrackingState.LOST for s in states[9:12]), "blackout must lose tracking"
    assert sys_.tracker.n_relocalizations >= 1, "must recover via relocalization"
    assert states[-1] == TrackingState.OK, "must keep tracking after recovery"
    # recovered pose metrically consistent with ground truth (stereo scale)
    err = np.linalg.norm(
        np.linalg.inv(sys_.tracker.T_cw)[:3, 3] - np.linalg.inv(scene.poses[n - 1])[:3, 3]
    )
    assert err < 0.15, err
