"""Multi-chip/config-#5 tests on the 8-device virtual CPU mesh (SURVEY §6.2
'multi-device'): sharded batched BA + batched multi-sequence tracking, with
shard-count invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.backend.lm import LMConfig
from tpuslam.geometry import Intrinsics
from tpuslam.parallel.sharded_ba import _toy_problem, batched_ba, make_mesh

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)


class TestShardedBA:
    def test_mesh_solves_match_single_device(self, rng):
        assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
        probs = [_toy_problem(rng, P_=3, L=8, OL=32, cam=CAM) for _ in range(8)]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
        # run to convergence: mid-descent states diverge through different
        # f32 accept/reject paths across compilations, converged ones agree
        cfg = LMConfig(max_iters=15)
        out_single = batched_ba(batch, CAM, cfg, mesh=None)
        out_mesh = batched_ba(batch, CAM, cfg, mesh=make_mesh(8))
        # poses agree up to the weakly-constrained directions of line-only
        # BA (near-zero-cost manifold); costs show both fully converged
        assert np.allclose(
            np.asarray(out_single.poses), np.asarray(out_mesh.poses), atol=0.15
        )
        cs = np.asarray(out_single.cost)
        cm = np.asarray(out_mesh.cost)
        assert np.all(np.isfinite(cs)) and np.all(np.isfinite(cm))
        # both converge (noiseless synthetic observations -> near-zero cost)
        assert np.median(cs) < 1e-2 and np.median(cm) < 1e-2

    def test_degenerate_single_chip_mesh(self, rng):
        probs = [_toy_problem(rng, P_=3, L=8, OL=32, cam=CAM) for _ in range(2)]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
        out = batched_ba(batch, CAM, LMConfig(max_iters=2), mesh=make_mesh(1))
        assert np.all(np.isfinite(np.asarray(out.cost)))


class TestMultiSequenceTracking:
    def test_batched_sequences_match_reference_tracker(self, rng):
        """8 synthetic stereo sequences tracked concurrently via the batched
        front-end; each sequence's trajectory must match ground truth."""
        from tpuslam.backend.mapping import LocalMapper, MapperConfig
        from tpuslam.eval.ate import absolute_trajectory_error
        from tpuslam.frontend.tracking import TrackingState
        from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
        from tpuslam.parallel.multi_seq import MultiTracker

        import jax.numpy as jnp

        from tpuslam.parallel import multi_seq as ms

        N, F = 4, 8
        scenes = [
            make_wireframe_scene(
                np.random.default_rng(100 + s), n_segments=120, n_frames=F, cam=CAM, motion_scale=0.02
            )
            for s in range(N)
        ]
        mt = MultiTracker([CAM] * N, mesh=make_mesh(4))
        for tr in mt.trackers:
            m = LocalMapper(tr.map, CAM, MapperConfig())
            tr.on_new_keyframe = m.process
            m.on_map_changed = tr.invalidate_local_map

        # count batched-track dispatches: steady-state frames must be ONE
        # batched call for all sequences, not N per-sequence programs
        calls = {"batched": 0}
        real = ms.batched_track_step

        def counting(*a, **k):
            calls["batched"] += 1
            return real(*a, **k)

        ms.batched_track_step = counting
        try:
            # geometric features bypass the detector: feed batched synthetic
            # features straight into the batched tracking stage
            for f in range(F):
                per_seq = [
                    synthetic_frame_features(
                        scenes[s], f, noise_px=0.3, rng=np.random.default_rng(f * 31 + s), with_depth=True
                    )[0]
                    for s in range(N)
                ]
                feats = jax.tree.map(lambda *xs: jnp.stack(xs), *per_seq)
                results = mt.track_features(feats, [f * 0.05] * N)
                if f > 0:
                    assert all(r.state == TrackingState.OK for r in results)
        finally:
            ms.batched_track_step = real
        # frame 0 initializes per-sequence (no batched call); every frame
        # after that is exactly one batched dispatch
        assert calls["batched"] == F - 1, calls
        for s, tr in enumerate(mt.trackers):
            est = tr.T_cw
            gt = scenes[s].poses[F - 1]
            # final pose error small per sequence
            d = np.linalg.norm(np.linalg.inv(est)[:3, 3] - np.linalg.inv(gt)[:3, 3])
            assert d < 0.08, (s, d)

    def test_mixed_camera_batched_sequences(self, rng):
        """Per-sequence calibrations batch through ONE dispatch (BASELINE
        config #5: the 8 EuRoC sequences carry different calibrations; the
        round-2 `same_cam` gate silently serialized them — VERDICT r2
        item 9). Intrinsics vmaps as a pytree of (N,) leaves."""
        from tpuslam.backend.mapping import LocalMapper, MapperConfig
        from tpuslam.frontend.tracking import TrackingState
        from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
        from tpuslam.parallel.multi_seq import MultiTracker
        from tpuslam.parallel import multi_seq as ms

        N, F = 3, 8
        cams = [
            Intrinsics(
                fx=458.0 + 14.0 * s, fy=457.0 - 11.0 * s,
                cx=320.0 + 6.0 * s, cy=240.0 - 5.0 * s,
                width=640, height=480, baseline=0.11 + 0.015 * s,
            )
            for s in range(N)
        ]
        scenes = [
            make_wireframe_scene(
                np.random.default_rng(200 + s), n_segments=120, n_frames=F,
                cam=cams[s], motion_scale=0.02,
            )
            for s in range(N)
        ]
        mt = MultiTracker(cams)
        for s, tr in enumerate(mt.trackers):
            m = LocalMapper(tr.map, cams[s], MapperConfig())
            tr.on_new_keyframe = m.process
            m.on_map_changed = tr.invalidate_local_map

        calls = {"batched": 0}
        real = ms.batched_track_step

        def counting(*a, **k):
            calls["batched"] += 1
            return real(*a, **k)

        ms.batched_track_step = counting
        try:
            for f in range(F):
                per_seq = [
                    synthetic_frame_features(
                        scenes[s], f, noise_px=0.3,
                        rng=np.random.default_rng(f * 37 + s), with_depth=True,
                    )[0]
                    for s in range(N)
                ]
                feats = jax.tree.map(lambda *xs: jnp.stack(xs), *per_seq)
                results = mt.track_features(feats, [f * 0.05] * N)
                if f > 0:
                    assert all(r.state == TrackingState.OK for r in results)
        finally:
            ms.batched_track_step = real
        assert calls["batched"] == F - 1, calls  # one dispatch per steady frame
        for s, tr in enumerate(mt.trackers):
            d = np.linalg.norm(
                np.linalg.inv(tr.T_cw)[:3, 3]
                - np.linalg.inv(scenes[s].poses[F - 1])[:3, 3]
            )
            assert d < 0.08, (s, d)

    def test_batched_extract_matches_single(self, rng):
        """vmapped extraction == per-image extraction (rendered frames)."""
        from tpuslam.frontend.frame import FrontendParams, extract_features
        from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
        from tpuslam.parallel.multi_seq import batched_extract

        scene = make_wireframe_scene(rng, n_segments=40, n_frames=3, cam=CAM)
        imgs = np.stack(
            [
                render_wireframe_image(scene, f, noise=1.0, rng=np.random.default_rng(f)).astype(np.float32)
                / 255.0
                for f in range(2)
            ]
        )
        p = FrontendParams(max_lines=64)
        fb = batched_extract(jnp.asarray(imgs), p)
        for i in range(2):
            fs = extract_features(jnp.asarray(imgs[i]), p)
            assert np.allclose(np.asarray(fb.endpoints[i]), np.asarray(fs.endpoints), atol=1e-3)
            assert np.array_equal(np.asarray(fb.desc_bits[i]), np.asarray(fs.desc_bits))
