"""DLT-Lines initialization-free pose solve (SURVEY §5, [P:9]) + its role
as the relocalization seed when LM from the candidate pose diverges."""

import numpy as np
import jax.numpy as jnp

from tpuslam.backend.dlt import dlt_lines_pose, image_line_coeffs
from tpuslam.geometry import Intrinsics
from tpuslam.geometry.se3 import se3_exp

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


def _project(T_cw, X):
    Xc = X @ T_cw[:3, :3].T + T_cw[:3, 3]
    return np.stack([CAM.fx * Xc[..., 0] / Xc[..., 2] + CAM.cx,
                     CAM.fy * Xc[..., 1] / Xc[..., 2] + CAM.cy], axis=-1)


def _make_problem(rng, M=40, noise=0.0):
    T = np.asarray(se3_exp(jnp.asarray(rng.normal(size=6) * np.array([0.5, 0.5, 0.5, 0.2, 0.2, 0.2]), jnp.float32)))
    p = rng.normal(size=(M, 3)) * 2 + [0, 0, 8.0]
    q = p + rng.normal(size=(M, 3))
    Xw = np.stack([p, q], axis=1).astype(np.float32)
    uv = _project(T, Xw)  # (M, 2, 2)
    if noise > 0:
        uv = uv + rng.normal(size=uv.shape) * noise
    l2d = np.asarray(image_line_coeffs(jnp.asarray(uv, jnp.float32)))
    return T, Xw, l2d


class TestDLTLines:
    def test_exact_recovery(self, rng):
        T, Xw, l2d = _make_problem(rng)
        T_est, ok = dlt_lines_pose(jnp.asarray(l2d), jnp.asarray(Xw), jnp.ones(len(Xw), jnp.float32), CAM)
        assert float(ok) > 0.5
        T_est = np.asarray(T_est)
        assert np.allclose(T_est[:3, 3], T[:3, 3], atol=5e-3), (T_est[:3, 3], T[:3, 3])
        assert np.allclose(T_est[:3, :3], T[:3, :3], atol=5e-3)

    def test_noisy_recovery(self, rng):
        T, Xw, l2d = _make_problem(rng, M=60, noise=0.5)
        T_est, ok = dlt_lines_pose(jnp.asarray(l2d), jnp.asarray(Xw), jnp.ones(len(Xw), jnp.float32), CAM)
        assert float(ok) > 0.5
        T_est = np.asarray(T_est)
        assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.15

    def test_masked_rows_ignored(self, rng):
        T, Xw, l2d = _make_problem(rng, M=30)
        # corrupt half the rows but mask them out
        l2d2 = l2d.copy()
        l2d2[15:] = rng.normal(size=(15, 3))
        w = np.zeros(30, np.float32)
        w[:15] = 1.0
        T_est, ok = dlt_lines_pose(jnp.asarray(l2d2), jnp.asarray(Xw), jnp.asarray(w), CAM)
        assert float(ok) > 0.5
        assert np.allclose(np.asarray(T_est)[:3, 3], T[:3, 3], atol=1e-2)

    def test_degenerate_flagged(self, rng):
        T, Xw, l2d = _make_problem(rng, M=30)
        w = np.zeros(30, np.float32)
        w[:3] = 1.0  # too few correspondences
        _, ok = dlt_lines_pose(jnp.asarray(l2d), jnp.asarray(Xw), jnp.asarray(w), CAM)
        assert float(ok) < 0.5


def test_relocalization_dlt_reseed(rng):
    """Relocalization must succeed even when the candidate keyframe's stored
    pose is far from the query viewpoint (LM from it diverges): the DLT seed
    from descriptor matches recovers the pose (SURVEY §4.2 + §5)."""
    from tpuslam.backend.mapping import LocalMapper, MapperConfig
    from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
    from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
    from tpuslam.slammap.map import SlamMap
    from tpuslam.backend.loop_closing import KeyFrameDatabase

    scene = make_wireframe_scene(rng, n_segments=160, n_frames=12, cam=CAM, motion_scale=0.02)
    smap = SlamMap()
    tracker = Tracker(CAM, smap, TrackerConfig(max_frames_between_kf=4))
    mapper = LocalMapper(smap, CAM, MapperConfig())
    tracker.on_new_keyframe = mapper.process
    mapper.on_map_changed = tracker.invalidate_local_map
    db = KeyFrameDatabase()
    tracker.kf_db = db
    orig_cb = tracker.on_new_keyframe

    def on_kf(kf):
        orig_cb(kf)
        db.add(kf)

    tracker.on_new_keyframe = on_kf
    # ensure frame-0 init KF also lands in the db
    for f in range(10):
        feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng, with_depth=True)
        tracker.frame_idx = f
        r = tracker._track(feats, f * 0.05, stereo=True)
        assert r.state == TrackingState.OK
    for kid, kf in smap.keyframes.items():
        if kid not in db.kids:
            db.add(kf)

    # corrupt every stored keyframe pose far away: LM seeded from them fails,
    # landmarks stay correct -> DLT from matches must still recover
    far = np.eye(4, dtype=np.float32)
    far[:3, 3] = [50.0, 50.0, 50.0]
    for kf in smap.keyframes.values():
        kf.T_cw = (far @ kf.T_cw).astype(np.float32)

    tracker.state = TrackingState.LOST
    feats, _ = synthetic_frame_features(scene, 5, noise_px=0.3, rng=rng, with_depth=True)
    tracker.frame_idx = 50
    r = tracker._track(feats, 5.0, stereo=True)
    assert r.state == TrackingState.OK, "DLT reseed should recover"
    err = np.linalg.norm(np.linalg.inv(r.T_cw)[:3, 3] - np.linalg.inv(scene.poses[5])[:3, 3])
    assert err < 0.1, err
