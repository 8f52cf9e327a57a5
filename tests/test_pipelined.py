"""Pipelined (one-frame-lagged, device-resident-pose) tracking mode
(PERF_NOTES.md latency hiding): must track the same synthetic sequences as
the synchronous mode, with results lagging one frame."""

import numpy as np

from tpuslam.backend.mapping import LocalMapper, MapperConfig
from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
from tpuslam.geometry import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
from tpuslam.slammap.map import SlamMap

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


def test_pipelined_matches_ground_truth():
    rng = np.random.default_rng(11)
    n_frames = 25
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=n_frames, cam=CAM, motion_scale=0.03)
    smap = SlamMap()
    # one-frame-lagged KF decisions need a denser KF policy than the
    # synchronous default (the lag delays map growth by a frame)
    tracker = Tracker(CAM, smap, TrackerConfig(pipelined=True, max_frames_between_kf=8))
    mapper = LocalMapper(smap, CAM, MapperConfig())
    tracker.on_new_keyframe = mapper.process
    mapper.on_map_changed = tracker.invalidate_local_map

    results = []
    for f in range(n_frames):
        feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng, with_depth=True)
        tracker.frame_idx = f
        r = tracker._track(feats, timestamp=f * 0.05, stereo=True)
        if r is not None:  # pipelined: the first call has nothing resolved yet
            results.append(r)
    tail = tracker.flush()
    if tail is not None:
        results.append(tail)

    # every frame appears exactly once (no placeholder/duplicate rows)
    assert sorted(r.frame_idx for r in results) == list(range(n_frames))
    # all resolved frames OK; results lag by one frame but cover the sequence
    resolved = [r for r in results if r.n_inliers > 0]
    assert len(resolved) >= n_frames - 2
    assert all(r.state == TrackingState.OK for r in results[2:])
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in results[2:]])
    gt = np.stack(
        [np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in results[2:]]
    )
    ate = absolute_trajectory_error(est, gt)
    assert ate.rmse < 0.02, ate
