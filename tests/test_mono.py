"""Monocular pipeline tests: 2-view bootstrap (config #1) + tracking loop
(config #2 analog on synthetic geometric features)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.backend.mapping import LocalMapper, MapperConfig
from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.initializer import MonoInitializer, MonoInitParams
from tpuslam.frontend.tracking import Tracker, TrackerConfig, TrackingState
from tpuslam.geometry import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
from tpuslam.slammap.map import SlamMap

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480)


def make_translating_scene(rng, n_frames=30, step=0.06):
    """Scene with dominant sideways translation (good mono parallax)."""
    scene = make_wireframe_scene(rng, n_segments=160, n_frames=2, cam=CAM)
    poses = []
    for f in range(n_frames):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -f * step  # camera moves +x in world => world moves -x in cam
        T[1, 3] = 0.02 * np.sin(f * 0.4)
        poses.append(T)
    return scene._replace(poses=np.stack(poses))


class TestMonoInit:
    def test_two_view_bootstrap(self):
        rng = np.random.default_rng(4)
        scene = make_translating_scene(rng)
        init = MonoInitializer(CAM, MonoInitParams(min_parallax_px=8.0))
        f0, _ = synthetic_frame_features(scene, 0, noise_px=0.3, rng=rng)
        f5, _ = synthetic_frame_features(scene, 6, noise_px=0.3, rng=rng)
        assert init.try_initialize(f0, 0.0, 0) is None  # becomes reference
        out = init.try_initialize(f5, 0.3, 6)
        assert out is not None
        (ref, t0, idx0, T1, Lw, ep3d, ok, slots0, slots1) = out
        assert ok.sum() >= 10
        # relative pose direction: translation along -x (cam frame), up to scale
        t = T1[:3, 3]
        t = t / np.linalg.norm(t)
        gt_t = scene.poses[6][:3, 3]
        gt_t = gt_t / np.linalg.norm(gt_t)
        assert abs(float(np.dot(t, gt_t))) > 0.95
        # rotation ~ identity
        assert np.allclose(T1[:3, :3], np.eye(3), atol=0.05)
        # triangulated endpoints reproject onto the observed segments (view 0)
        good = 0
        for i in np.nonzero(ok)[0]:
            uv = ep3d[i] @ np.asarray(CAM.K).T
            uv = uv[:, :2] / uv[:, 2:3]
            a0 = np.asarray(ref.endpoints)[slots0[i]]
            d = min(
                np.linalg.norm(uv - a0, axis=-1).max(),
                np.linalg.norm(uv[::-1] - a0, axis=-1).max(),
            )
            if d < 5.0:
                good += 1
        assert good / max(ok.sum(), 1) > 0.7

    def test_no_parallax_no_init(self):
        rng = np.random.default_rng(4)
        scene = make_translating_scene(rng, step=0.0005)
        init = MonoInitializer(CAM)
        f0, _ = synthetic_frame_features(scene, 0, noise_px=0.2, rng=rng)
        f1, _ = synthetic_frame_features(scene, 1, noise_px=0.2, rng=rng)
        init.try_initialize(f0, 0.0, 0)
        assert init.try_initialize(f1, 0.05, 1) is None


class TestMonoTracking:
    def test_mono_sequence(self):
        rng = np.random.default_rng(8)
        n_frames = 30
        scene = make_translating_scene(rng, n_frames=n_frames)
        smap = SlamMap()
        tracker = Tracker(CAM, smap, TrackerConfig(max_frames_between_kf=6))
        mapper = LocalMapper(smap, CAM, MapperConfig(), mono=True)
        tracker.on_new_keyframe = mapper.process
        mapper.on_map_changed = tracker.invalidate_local_map

        states, poses = [], []
        for f in range(n_frames):
            feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng)
            tracker.frame_idx = f
            r = tracker._track(feats, timestamp=f * 0.05, stereo=False)
            states.append(r.state)
            poses.append(r.T_cw)
        # initialized somewhere in the first half, OK afterwards
        first_ok = next(i for i, s in enumerate(states) if s == TrackingState.OK)
        assert first_ok < n_frames // 2
        assert all(s == TrackingState.OK for s in states[first_ok:])
        # Sim(3)-aligned trajectory error small (mono scale is free)
        est = np.stack([np.linalg.inv(p)[:3, 3] for p in poses[first_ok:]])
        gt = np.stack([np.linalg.inv(scene.poses[f])[:3, 3] for f in range(first_ok, n_frames)])
        ate = absolute_trajectory_error(est, gt, with_scale=True)
        assert ate.rmse < 0.06, ate
