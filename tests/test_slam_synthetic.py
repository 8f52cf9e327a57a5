"""End-to-end synthetic SLAM integration (SURVEY §6.2).

Detector-bypassed: ground-truth 2D segments with identity descriptors feed
the real tracking + mapping + local-BA stack; the recovered trajectory must
match ground truth tightly (no detector noise) or loosely (with noise).
"""

import numpy as np
import pytest

from tpuslam.backend.mapping import LocalMapper, MapperConfig
from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
from tpuslam.geometry import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
from tpuslam.slammap.map import SlamMap

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


def run_synthetic_sequence(n_frames=30, noise_px=0.0, seed=11, mapper=True, drop_prob=0.0):
    rng = np.random.default_rng(seed)
    scene = make_wireframe_scene(
        rng, n_segments=140, n_points=0, n_frames=n_frames, cam=CAM, motion_scale=0.03
    )
    smap = SlamMap()
    tracker = Tracker(CAM, smap, TrackerConfig())
    lm = None
    if mapper:
        lm = LocalMapper(smap, CAM, MapperConfig())
        tracker.on_new_keyframe = lm.process
        lm.on_map_changed = tracker.invalidate_local_map

    results = []
    for f in range(n_frames):
        feats, _ = synthetic_frame_features(
            scene, f, noise_px=noise_px, rng=rng, with_depth=True, drop_prob=drop_prob
        )
        tracker.frame_idx = f  # keep indices aligned with the scene
        r = tracker._track(feats, timestamp=f * 0.05, stereo=True)
        results.append(r)
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in results])
    gt = np.stack([np.linalg.inv(scene.poses[f])[:3, 3] for f in range(n_frames)])
    return results, est, gt, smap


class TestSyntheticStereoSLAM:
    def test_noiseless_tracking_recovers_trajectory(self):
        results, est, gt, smap = run_synthetic_sequence(n_frames=25, noise_px=0.0)
        states = [r.state for r in results]
        assert states[0] == TrackingState.OK  # stereo init on frame 0
        assert all(s == TrackingState.OK for s in states[1:])
        ate = absolute_trajectory_error(est, gt)
        assert ate.rmse < 0.01, f"ATE {ate.rmse:.4f} m"

    def test_noisy_tracking(self):
        results, est, gt, smap = run_synthetic_sequence(n_frames=30, noise_px=0.5, drop_prob=0.1)
        ok = sum(r.state == TrackingState.OK for r in results)
        assert ok >= 28
        ate = absolute_trajectory_error(est, gt)
        assert ate.rmse < 0.05, f"ATE {ate.rmse:.4f} m"

    def test_map_grows_and_culls(self):
        results, est, gt, smap = run_synthetic_sequence(n_frames=25, noise_px=0.3)
        n_kf = len(smap.keyframes)
        assert 2 <= n_kf <= 25
        live = smap.lines.live_ids()
        assert len(live) > 30
        # every live landmark with >= 2 obs is consistent both ways
        for lid in live[:200]:
            for kid, slot in smap.lines.obs.get(int(lid), {}).items():
                if kid in smap.keyframes:
                    assert smap.keyframes[kid].line_ids[slot] == lid
