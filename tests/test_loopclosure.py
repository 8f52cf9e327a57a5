"""Loop closure (SURVEY §4.4, config #4 analog on synthetic).

Two layers:
- detection: MXU database scoring must rank the revisited start region top
  among temporally-distant keyframes when the camera returns.
- correction machinery: on a hand-built drifted map with duplicate landmarks
  (the state real drift produces), ComputeSE3 must recover the drift and the
  essential-graph + landmark correction must pull the trajectory back.

The full-tracking path cannot exercise explicit closure here: with identity
descriptors and a small synthetic loop, projection-guided matching re-finds
the start landmarks directly (implicit closure via map reuse), which
test_slam_synthetic already covers.
"""

import numpy as np
import jax.numpy as jnp

from tpuslam.backend.loop_closing import LoopCloser, LoopConfig
from tpuslam.geometry import Intrinsics, se3_exp
from tpuslam.io.synthetic import make_loop_scene, synthetic_frame_features
from tpuslam.slammap.map import SlamMap

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


def _build_drifted_loop(
    n_kf=10,
    drift_xi=(0.02, 0.01, -0.015, 0.002, 0.003, -0.002),
    truncate_seed=None,
    refine=True,
):
    """Keyframes around a circle; pose k gets cumulative drift exp(k*xi).
    Start-region landmarks are bound to KF0 at TRUE world positions; the
    returning keyframe (same viewpoint as KF0) gets DUPLICATE landmarks at
    positions consistent with its drifted pose.

    truncate_seed: store PARTIALLY-observed landmark endpoints (each side of
    the loop keeps a different random sub-interval of every segment) — the
    occlusion/truncation state real revisits produce, which slides endpoint
    midpoints along the line (VERDICT r2 weak #5)."""
    rng = np.random.default_rng(5)
    n_frames = n_kf
    scene = make_loop_scene(rng, n_segments=280, n_frames=n_frames, radius=6.0, room=10.0, cam=CAM)
    smap = SlamMap()
    closer = LoopCloser(
        smap,
        CAM,
        LoopConfig(
            min_kid_gap=3, min_inliers=6, ransac_inlier_m=0.5,
            run_global_ba=False, refine=refine,
        ),
    )
    trunc_rng = None if truncate_seed is None else np.random.default_rng(truncate_seed)

    drift_step = np.asarray(se3_exp(jnp.asarray(drift_xi, jnp.float32)))
    kfs = []
    cum = np.eye(4, dtype=np.float32)
    true_poses = []
    for f in range(n_frames):
        feats, vis = synthetic_frame_features(scene, f, with_depth=True)
        T_true = scene.poses[f]
        T_drift = (cum @ T_true).astype(np.float32)  # drifted estimate
        kf = smap.new_keyframe(f, f * 0.1, T_drift, feats)
        kfs.append((kf, vis, T_true))
        true_poses.append(T_true)
        cum = (drift_step @ cum).astype(np.float32)

    st = smap.lines

    def bind_landmarks(kf, vis, use_pose):
        """Allocate landmarks for this KF's features, with world geometry
        derived from `use_pose` (camera-frame truth re-anchored)."""
        feats = kf.features
        T_true_wc = np.linalg.inv(true_poses[kf.frame_idx])
        bits = np.asarray(feats.desc_bits)
        Twc = np.linalg.inv(use_pose)
        for slot in range(int(np.asarray(feats.valid).sum())):
            seg_id = vis[slot]
            ep_world_true = scene.segments[seg_id]  # (2, 3) true world
            # camera-frame geometry under the TRUE pose
            ep_cam = ep_world_true @ true_poses[kf.frame_idx][:3, :3].T + true_poses[kf.frame_idx][:3, 3]
            if trunc_rng is not None:
                # keep a random sub-interval: same infinite line, shifted
                # midpoint (partial observation)
                a = trunc_rng.uniform(0.0, 0.35)
                b = 1.0 - trunc_rng.uniform(0.0, 0.35)
                d = ep_cam[1] - ep_cam[0]
                ep_cam = np.stack([ep_cam[0] + a * d, ep_cam[0] + b * d])
            # re-anchored world position under use_pose
            ep_w = ep_cam @ Twc[:3, :3].T + Twc[:3, 3]
            plk = np.concatenate([np.cross(ep_w[0], ep_w[1]), ep_w[1] - ep_w[0]])
            lid = st.allocate(plk.astype(np.float32), ep_w.astype(np.float32), bits[slot], kf.kid)
            st.add_observation(lid, kf, slot)

    # KF0 and neighbors: true geometry
    for kf, vis, T_true in kfs[:3]:
        bind_landmarks(kf, vis, kf.T_cw * 0 + true_poses[kf.frame_idx])  # true pose
    # middle keyframes: no landmarks needed for the machinery test
    # last keyframe: duplicates at drifted positions
    kf_last, vis_last, _ = kfs[-1]
    bind_landmarks(kf_last, vis_last, kf_last.T_cw)
    for kf, _, _ in kfs:
        kf.parent = kf.kid - 1 if kf.kid > 0 else None
        if kf.parent is not None:
            smap.keyframes[kf.parent].children.add(kf.kid)
    return scene, smap, closer, kfs, true_poses


class TestLoopMachinery:
    def test_compute_se3_recovers_drift(self):
        scene, smap, closer, kfs, true_poses = _build_drifted_loop()
        kf_last = kfs[-1][0]
        kf0 = kfs[0][0]
        res = closer._compute_se3(kf_last, kf0)
        assert res is not None
        s_corr, T_corr = res
        assert abs(s_corr - 1.0) < 1e-6  # stereo: rigid
        # corrected pose of the last KF should be ~ its true pose... the
        # camera returned to the frame-0 viewpoint region; ground truth:
        T_true_last = true_poses[kf_last.frame_idx]
        T_corrected = T_corr @ kf0.T_cw
        err = np.linalg.norm(T_corrected[:3, 3] - T_true_last[:3, 3])
        err_before = np.linalg.norm(kf_last.T_cw[:3, 3] - T_true_last[:3, 3])
        assert err < 0.3 * err_before + 1e-3, (err, err_before)

    def test_compute_se3_truncated_endpoints(self):
        """Partially-overlapping revisit (VERDICT r2 item 7): each loop side
        stores a different random sub-interval of every segment, so endpoint
        midpoints slide along the lines and the 3-point Umeyama seed is
        biased. The post-RANSAC pose LM minimizes endpoint-to-projected-LINE
        distances — invariant to sliding — and must still recover the drift."""
        scene, smap, closer, kfs, true_poses = _build_drifted_loop(truncate_seed=11)
        kf_last = kfs[-1][0]
        kf0 = kfs[0][0]
        res = closer._compute_se3(kf_last, kf0)
        assert res is not None
        s_corr, T_corr = res
        T_true_last = true_poses[kf_last.frame_idx]
        err = np.linalg.norm((T_corr @ kf0.T_cw)[:3, 3] - T_true_last[:3, 3])
        err_before = np.linalg.norm(kf_last.T_cw[:3, 3] - T_true_last[:3, 3])
        assert err < 0.3 * err_before + 5e-3, (err, err_before)

        # ... and the refinement must be doing the work: the raw midpoint
        # alignment alone is measurably worse under truncation
        _, smap2, closer2, kfs2, _ = _build_drifted_loop(truncate_seed=11, refine=False)
        res2 = closer2._compute_se3(kfs2[-1][0], kfs2[0][0])
        if res2 is None:
            return  # unrefined estimate didn't even reach min_inliers
        T_raw = res2[1]
        err_raw = np.linalg.norm((T_raw @ kfs2[0][0].T_cw)[:3, 3] - T_true_last[:3, 3])
        assert err <= err_raw + 1e-4, (err, err_raw)

    def test_close_corrects_trajectory(self):
        scene, smap, closer, kfs, true_poses = _build_drifted_loop()
        kf_last = kfs[-1][0]
        before = np.stack(
            [np.linalg.norm(kf.T_cw[:3, 3] - true_poses[kf.frame_idx][:3, 3]) for kf, _, _ in kfs]
        )
        ok = closer._close(kf_last, 0)
        assert ok
        after = np.stack(
            [
                np.linalg.norm(
                    smap.keyframes[kf.kid].T_cw[:3, 3] - true_poses[kf.frame_idx][:3, 3]
                )
                for kf, _, _ in kfs
            ]
        )
        # end-of-loop error must collapse; average error must improve
        assert after[-1] < 0.3 * before[-1] + 1e-3
        assert after.mean() < before.mean()
        assert (kf_last.kid, 0) in closer.closed_loops or (0, kf_last.kid) in closer.closed_loops

    def test_detection_scores_rank_revisit(self):
        rng = np.random.default_rng(9)
        n_frames = 40
        scene = make_loop_scene(rng, n_segments=280, n_frames=n_frames, radius=6.0, room=10.0, cam=CAM)
        smap = SlamMap()
        closer = LoopCloser(smap, CAM, LoopConfig())
        # register keyframes around the circle
        for f in range(0, n_frames, 4):
            feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng)
            kf = smap.new_keyframe(f, f * 0.1, scene.poses[f], feats)
            closer.db.add(kf)
        # a query at the start viewpoint (frame 0 again, new noise)
        feats_q, _ = synthetic_frame_features(scene, 0, noise_px=0.5, rng=rng)
        kfq = smap.new_keyframe(n_frames, n_frames * 0.1, scene.poses[0], feats_q)
        scores = closer.db.query(kfq)
        # the best-scoring database keyframe must be the start region (kid 0
        # or its immediate neighbors), not the middle of the loop
        best = max(scores, key=scores.get)
        assert best in (0, 1, len(scores) - 1), scores


class TestDatabaseCompaction:
    def test_remove_compacts_tombstones(self):
        """Heavy keyframe culling must not leave the database scoring dead
        rows forever (VERDICT r2 weak #6): after removals dominate, the
        storage compacts and queries return identical scores."""
        from tpuslam.backend.loop_closing import KeyFrameDatabase

        rng = np.random.default_rng(3)
        n = 40
        scene = make_loop_scene(rng, n_segments=280, n_frames=n, radius=6.0, room=10.0, cam=CAM)
        smap = SlamMap()
        db = KeyFrameDatabase(capacity_hint=8)
        kfs = []
        for f in range(n):
            feats, _ = synthetic_frame_features(scene, f, noise_px=0.3, rng=rng)
            kf = smap.new_keyframe(f, f * 0.1, scene.poses[f], feats)
            db.add(kf)
            kfs.append(kf)
        assert db._bits_dev.shape[0] >= 40
        q = kfs[-1]
        scores_before = db.query(q)
        # cull 3 of every 4 keyframes (keep the query's row + a few)
        removed = [kf.kid for kf in kfs if kf.kid % 4 != 0]
        for kid in removed:
            db.remove(kid)
        assert len(db) == sum(1 for kf in kfs if kf.kid % 4 == 0)
        # compaction happened: physical rows shrank below the dead total
        assert db._bits_dev.shape[0] < 40, db._bits_dev.shape
        # residual tombstones stay below the compaction threshold
        dead = sum(1 for k in db.kids if k is None)
        assert dead <= max(len(db), db._cap0 - 1)
        scores_after = db.query(q)
        expect = {k: v for k, v in scores_before.items() if k % 4 == 0}
        assert scores_after == expect
        # the database keeps working after compaction (adds land in new rows)
        feats, _ = synthetic_frame_features(scene, 0, noise_px=0.5, rng=rng)
        kf_new = smap.new_keyframe(n, n * 0.1, scene.poses[0], feats)
        db.add(kf_new)
        assert kf_new.kid in db.query(q)


class TestGlobalBAOverflow:
    def test_overflowing_map_falls_back_to_essential_graph(self):
        """A map larger than the global-BA pose buckets (VERDICT r2 weak #7)
        must still be corrected by the essential graph: the closure succeeds,
        gba_skipped increments, and trajectory error still collapses."""
        from tpuslam.backend.global_ba import GlobalBAConfig
        from tpuslam.backend.lm import LMConfig

        scene, smap, closer, kfs, true_poses = _build_drifted_loop()
        # 10 KFs > the 8-pose top bucket -> global BA must raise + be skipped
        closer.cfg.run_global_ba = True
        closer.cfg.gba_cfg = GlobalBAConfig(
            pose_buckets=(8,), line_buckets=(256,), obs_buckets=(1024,),
            lm=LMConfig(max_iters=2),
        )
        kf_last = kfs[-1][0]
        before = np.linalg.norm(
            kf_last.T_cw[:3, 3] - true_poses[kf_last.frame_idx][:3, 3]
        )
        ok = closer._close(kf_last, 0)
        assert ok
        assert closer.gba_skipped == 1
        after = np.linalg.norm(
            smap.keyframes[kf_last.kid].T_cw[:3, 3]
            - true_poses[kf_last.frame_idx][:3, 3]
        )
        assert after < 0.3 * before + 1e-3


def test_loopcloser_shares_system_database():
    """Regression: KeyFrameDatabase defines __len__, so an empty (thus
    falsy) shared db passed as `db or KeyFrameDatabase()` was silently
    replaced by a private one — loop detection then ran against the private
    copy while relocalization queried the System's forever-empty db. The
    LoopCloser must use the exact db object the System (and tracker) use."""
    from tpuslam.backend.loop_closing import KeyFrameDatabase, LoopCloser
    from tpuslam.geometry.camera import Intrinsics
    from tpuslam.slammap.map import SlamMap
    from tpuslam.system import System

    cam = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, baseline=0.1)
    sys_ = System(cam, sensor="stereo", loop_closing=True, mapping=True)
    assert sys_.loop_closer.db is sys_.kf_db
    assert sys_.tracker.kf_db is sys_.kf_db
    sys_.shutdown()
    # direct construction with an explicit (empty, falsy) db
    db = KeyFrameDatabase()
    lc = LoopCloser(SlamMap(), cam, db=db)
    assert lc.db is db
