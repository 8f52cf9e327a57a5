"""System facade tests: public API surface + checkpoint/resume with
localization-only reuse (SURVEY §7 'map save/load for localization-only')."""

import numpy as np
import pytest

from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
from tpuslam.geometry import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
from tpuslam.system import System

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


def _drive(sys_, scene, frames, rng, start=0):
    """Feed detector-bypassing features through the tracker (System API is
    image-based; here we drive its tracker directly with exact features)."""
    out = []
    for f in range(start, start + frames):
        feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng, with_depth=True)
        sys_.tracker.frame_idx = f
        r = sys_.tracker._track(feats, f * 0.05, stereo=True)
        sys_.trajectory.append(r)
        if sys_.loop_closer is None and r.made_keyframe:
            pass
        out.append(r)
    return out


class TestSystemAPI:
    def test_map_and_graph_accessors(self, tmp_path, rng):
        scene = make_wireframe_scene(rng, n_segments=140, n_frames=12, cam=CAM, motion_scale=0.02)
        sys_ = System(CAM, sensor="stereo", loop_closing=False)
        sys_.tracker.cfg = TrackerConfig(max_frames_between_kf=4)
        _drive(sys_, scene, 12, rng)
        lines = sys_.map_lines()
        assert lines["plucker"].shape[1] == 6
        assert len(lines["ids"]) > 20
        kfs, edges = sys_.keyframe_graph()
        assert len(kfs) >= 2
        assert all(w > 0 for _, _, w in edges)
        # trajectory writers
        sys_.save_trajectory_tum(str(tmp_path / "t.txt"))
        sys_.save_trajectory_kitti(str(tmp_path / "k.txt"))
        assert (tmp_path / "t.txt").stat().st_size > 100
        sys_.shutdown()

    def test_save_load_localization_reuse(self, tmp_path, rng):
        """Build a map, save it, load into a FRESH system, and relocalize
        against the prebuilt map without re-initializing."""
        scene = make_wireframe_scene(rng, n_segments=160, n_frames=16, cam=CAM, motion_scale=0.02)
        sys_ = System(CAM, sensor="stereo", loop_closing=False)
        sys_.tracker.cfg = TrackerConfig(max_frames_between_kf=4)
        _drive(sys_, scene, 14, rng)
        n_lines = len(sys_.map.lines.live_ids())
        assert n_lines > 20
        p = str(tmp_path / "map.npz")
        sys_.save_map(p)
        sys_.shutdown()

        sys2 = System(CAM, sensor="stereo", loop_closing=False)
        sys2.load_map(p)
        assert len(sys2.map.lines.live_ids()) == n_lines
        # load_map must rebuild the relocalization database itself
        assert len(sys2.kf_db) == len(sys2.map.keyframes)
        # force LOST state with a known map -> must relocalize on a frame
        # from the mapped region
        sys2.tracker.state = TrackingState.LOST
        feats, _ = synthetic_frame_features(scene, 6, noise_px=0.3, rng=rng, with_depth=True)
        sys2.tracker.frame_idx = 100
        r = sys2.tracker._track(feats, 5.0, stereo=True)
        assert r.state == TrackingState.OK
        assert sys2.tracker.n_relocalizations == 1
        # recovered pose close to ground truth for frame 6
        err = np.linalg.norm(
            np.linalg.inv(r.T_cw)[:3, 3] - np.linalg.inv(scene.poses[6])[:3, 3]
        )
        assert err < 0.05, err
        sys2.shutdown()
