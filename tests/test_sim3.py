"""Sim(3) geometry + monocular scale-drift loop closure (SURVEY §4.4
'mono: Sim3'). Mono SLAM accumulates SCALE error; an SE(3) loop correction
cannot remove it — the Sim(3) essential graph must."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.backend.loop_closing import LoopCloser, LoopConfig
from tpuslam.geometry import Intrinsics
from tpuslam.geometry.se3 import se3_exp
from tpuslam.geometry.sim3 import (
    plucker_transform_sim3,
    se3_from_sim3,
    sim3_apply,
    sim3_chart,
    sim3_chart_log,
    sim3_decompose,
    sim3_inverse,
    sim3_make,
)
from tpuslam.io.synthetic import make_loop_scene, synthetic_frame_features
from tpuslam.slammap.map import SlamMap

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480)


class TestSim3Geometry:
    def test_chart_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, jnp.float32)
        S = jax.vmap(sim3_chart)(xi)
        xi2 = jax.vmap(sim3_chart_log)(S)
        assert np.allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=7) * 0.4, jnp.float32)
        S = sim3_chart(xi)
        I = np.asarray(S @ sim3_inverse(S))
        assert np.allclose(I, np.eye(4), atol=1e-5)

    def test_apply_and_decompose(self, rng):
        s = 1.7
        R = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.3, -0.2, 0.1], jnp.float32)))[:3, :3]
        t = np.asarray([0.5, -1.0, 2.0], np.float32)
        S = sim3_make(jnp.float32(s), jnp.asarray(R), jnp.asarray(t))
        s2, R2, t2 = sim3_decompose(S)
        assert abs(float(s2) - s) < 1e-5
        assert np.allclose(np.asarray(R2), R, atol=1e-5)
        p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        q = np.asarray(sim3_apply(S, p))
        assert np.allclose(q, s * np.asarray(p) @ R.T + t, atol=1e-4)

    def test_jacobian_finite_at_zero(self):
        S0 = sim3_make(jnp.float32(1.3), jnp.eye(3), jnp.asarray([1.0, 0, 0]))
        J = jax.jacobian(lambda xi: sim3_chart(xi) @ S0)(jnp.zeros(7))
        assert np.all(np.isfinite(np.asarray(J)))

    def test_plucker_sim3_matches_points(self, rng):
        """Transformed Pluecker line == line through transformed points."""
        xi = jnp.asarray(rng.normal(size=7) * 0.4, jnp.float32)
        S = sim3_chart(xi)
        p = jnp.asarray(rng.normal(size=3) + np.array([0, 0, 4.0]), jnp.float32)
        q = jnp.asarray(rng.normal(size=3) + np.array([1, 0, 4.0]), jnp.float32)
        L = jnp.concatenate([jnp.cross(p, q), q - p])
        Lt = np.asarray(plucker_transform_sim3(S, L))
        p2, q2 = np.asarray(sim3_apply(S, p)), np.asarray(sim3_apply(S, q))
        L2 = np.concatenate([np.cross(p2, q2), q2 - p2])
        # proportional (lines are up to scale)
        cosang = np.dot(Lt, L2) / (np.linalg.norm(Lt) * np.linalg.norm(L2))
        assert cosang > 1.0 - 1e-5

    def test_se3_from_sim3(self):
        R = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.2, 0.1, -0.3], jnp.float32)))[:3, :3]
        t = np.asarray([1.0, 2.0, 3.0], np.float32)
        S = sim3_make(jnp.float32(2.0), jnp.asarray(R), jnp.asarray(t))
        T = np.asarray(se3_from_sim3(S))
        assert np.allclose(T[:3, :3], R, atol=1e-5)
        assert np.allclose(T[:3, 3], t / 2.0, atol=1e-5)


def _build_scale_drifted_loop(n_kf=10, scale_step=1.05):
    """Mono-style loop: estimated world scale grows by scale_step per KF
    (poses [R, s_k * t], landmarks at s_k * world). The start region is
    anchored at true scale; the returning KF carries both pose and scale
    error."""
    rng = np.random.default_rng(5)
    scene = make_loop_scene(rng, n_segments=280, n_frames=n_kf, radius=6.0, room=10.0, cam=CAM)
    smap = SlamMap()
    closer = LoopCloser(
        smap,
        CAM,
        LoopConfig(min_kid_gap=3, min_inliers=6, ransac_inlier_m=0.5, run_global_ba=False),
        mono=True,
    )
    kfs = []
    true_poses = []
    scales = []
    for f in range(n_kf):
        feats, vis = synthetic_frame_features(scene, f, with_depth=True)
        T_true = scene.poses[f]
        s_k = scale_step**f
        T_est = T_true.copy()
        T_est[:3, 3] *= s_k  # scaled-world pose estimate
        kf = smap.new_keyframe(f, f * 0.1, T_est.astype(np.float32), feats)
        kfs.append((kf, vis))
        true_poses.append(T_true)
        scales.append(s_k)

    st = smap.lines

    def bind(kf, vis, s_k):
        feats = kf.features
        bits = np.asarray(feats.desc_bits)
        f = kf.frame_idx
        for slot in range(int(np.asarray(feats.valid).sum())):
            ep_w = scene.segments[vis[slot]] * s_k  # scaled world geometry
            plk = np.concatenate([np.cross(ep_w[0], ep_w[1]), ep_w[1] - ep_w[0]])
            lid = st.allocate(plk.astype(np.float32), ep_w.astype(np.float32), bits[slot], kf.kid)
            st.add_observation(lid, kf, slot)

    for kf, vis in kfs[:3]:  # start region: true scale
        bind(kf, vis, 1.0)
    kf_last, vis_last = kfs[-1]
    bind(kf_last, vis_last, scales[-1])  # returning KF: drifted scale
    for kf, _ in kfs:
        kf.parent = kf.kid - 1 if kf.kid > 0 else None
        if kf.parent is not None:
            smap.keyframes[kf.parent].children.add(kf.kid)
    return scene, smap, closer, kfs, true_poses, scales


class TestMonoSim3LoopClosure:
    def test_compute_sim3_recovers_scale(self):
        scene, smap, closer, kfs, true_poses, scales = _build_scale_drifted_loop()
        res = closer._compute_se3(kfs[-1][0], kfs[0][0])
        assert res is not None
        s_corr, T_corr = res
        # current KF's world is scales[-1] x true; candidate is true scale:
        # mapping cand-camera -> cur-camera points multiplies by ~scales[-1]
        assert abs(s_corr - scales[-1]) < 0.08, (s_corr, scales[-1])

    def test_close_corrects_scale_and_trajectory(self):
        scene, smap, closer, kfs, true_poses, scales = _build_scale_drifted_loop()
        kf_last = kfs[-1][0]
        err_before = np.linalg.norm(kf_last.T_cw[:3, 3] - true_poses[-1][:3, 3])
        ok = closer._close(kf_last, 0)
        assert ok
        err_after = np.linalg.norm(
            smap.keyframes[kf_last.kid].T_cw[:3, 3] - true_poses[-1][:3, 3]
        )
        assert err_after < 0.35 * err_before + 1e-3, (err_after, err_before)
        # landmark scale of the returning KF's landmarks must shrink back
        # toward true geometry: compare endpoint norms to the true segments
        st = smap.lines
        ratios = []
        for slot in range(40):
            lid = int(kf_last.line_ids[slot])
            if lid < 0:
                continue
            seg_true = scene.segments[kfs[-1][1][slot]]
            len_true = np.linalg.norm(seg_true[1] - seg_true[0])
            len_est = np.linalg.norm(st.endpoints[lid][1] - st.endpoints[lid][0])
            ratios.append(len_est / len_true)
        assert ratios, "no landmarks bound to the returning keyframe"
        med = float(np.median(ratios))
        drift = scales[-1]
        # before correction the ratio was `drift` (~1.55); after it must be
        # much closer to 1
        assert abs(med - 1.0) < 0.4 * abs(drift - 1.0), (med, drift)
