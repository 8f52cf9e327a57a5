"""IO tests: config, trajectory formats, map serialization, eval."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.eval.ate import absolute_trajectory_error, align_umeyama
from tpuslam.eval.rpe import relative_pose_error
from tpuslam.geometry import Intrinsics, se3_exp
from tpuslam.io.config import load_settings, settings_from_dict
from tpuslam.io.trajectory import (
    load_trajectory_tum,
    save_trajectory_kitti,
    save_trajectory_tum,
)


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        y = tmp_path / "settings.yaml"
        y.write_text(
            """%YAML:1.0
---
# reference-style settings
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.width: 752
Camera.height: 480
Camera.bf: 47.90639384423901
Camera.fps: 20.0
LineExtractor.nFeatures: 300
LineExtractor.nLevels: 2
LineExtractor.scaleFactor: 0.8
"""
        )
        s = load_settings(str(y))
        assert abs(s.cam.fx - 458.654) < 1e-6
        assert s.cam.width == 752
        assert abs(s.cam.baseline - 47.90639384423901 / 458.654) < 1e-9
        assert s.tracker.frontend.max_lines == 300
        assert s.fps == 20.0

    def test_defaults(self):
        s = settings_from_dict({})
        assert s.cam.baseline == 0.0


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path, rng):
        n = 10
        poses = [np.asarray(se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))) for _ in range(n)]
        ts = [0.1 * i for i in range(n)]
        p = tmp_path / "traj.txt"
        save_trajectory_tum(str(p), ts, poses)
        t2, pos = load_trajectory_tum(str(p))
        assert len(t2) == n
        for i in range(n):
            Twc = np.linalg.inv(poses[i])
            assert np.allclose(pos[i], Twc[:3, 3], atol=1e-5)

    def test_kitti_format(self, tmp_path, rng):
        poses = [np.eye(4, dtype=np.float32)]
        p = tmp_path / "k.txt"
        save_trajectory_kitti(str(p), poses)
        row = np.loadtxt(str(p))
        assert row.shape == (12,)
        assert np.allclose(row.reshape(3, 4), np.eye(4)[:3], atol=1e-9)


class TestEval:
    def test_umeyama_recovers_transform(self, rng):
        src = rng.normal(size=(50, 3))
        R_gt = np.asarray(se3_exp(jnp.asarray(rng.normal(size=6), jnp.float32)))[:3, :3]
        t_gt = rng.normal(size=3)
        dst = 2.0 * (R_gt @ src.T).T + t_gt
        s, R, t = align_umeyama(src, dst, with_scale=True)
        assert abs(s - 2.0) < 1e-6
        assert np.allclose(R, R_gt, atol=1e-6)

    def test_ate_with_association(self, rng):
        gt = rng.normal(size=(40, 3))
        t_gt = np.arange(40) * 0.1
        est = gt[::2] + rng.normal(size=(20, 3)) * 0.01
        t_est = t_gt[::2] + 0.001
        r = absolute_trajectory_error(est, gt, t_est, t_gt)
        assert r.n == 20
        assert r.rmse < 0.05

    def test_rpe(self, rng):
        n = 15
        poses = [np.eye(4)]
        for _ in range(n - 1):
            d = np.asarray(se3_exp(jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)))
            poses.append(poses[-1] @ d)
        T = np.stack(poses)
        r = relative_pose_error(T, T.copy())
        assert r.trans_rmse < 1e-6


class TestMapSerialize:
    def test_roundtrip(self, tmp_path, rng):
        from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
        from tpuslam.slammap.map import SlamMap
        from tpuslam.slammap.serialize import load_map, save_map

        cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, baseline=0.11)
        scene = make_wireframe_scene(rng, n_segments=60, n_frames=4, cam=cam)
        m = SlamMap()
        for f in range(3):
            feats, _ = synthetic_frame_features(scene, f, with_depth=True)
            kf = m.new_keyframe(f, f * 0.05, scene.poses[f], feats)
            for slot in range(0, 10):
                lid = m.lines.allocate(
                    rng.normal(size=6).astype(np.float32),
                    rng.normal(size=(2, 3)).astype(np.float32),
                    np.asarray(feats.desc_bits)[slot],
                    kf.kid,
                )
                m.lines.add_observation(lid, kf, slot)
            m.update_connections(kf)
        p = str(tmp_path / "map.npz")
        save_map(m, p)
        m2 = load_map(p)
        assert sorted(m2.keyframes) == sorted(m.keyframes)
        assert np.array_equal(m2.lines.alive, m.lines.alive)
        assert m2.lines.obs == m.lines.obs
        k0 = sorted(m.keyframes)[0]
        assert np.allclose(m2.keyframes[k0].T_cw, m.keyframes[k0].T_cw)
        assert np.array_equal(m2.keyframes[k0].line_ids, m.keyframes[k0].line_ids)
        # covisibility preserved
        assert m2.covis == m.covis
