"""Front-end tests (SURVEY §6.2 'unit: LSD kernel', 'unit: matcher').

Oracles: cv2.createLineSegmentDetector for detection; numpy popcount brute
force for Hamming matching; synthetic renders with exact 2D ground truth for
matching precision and stereo depth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.frontend.frame import (
    FrontendParams,
    StereoParams,
    extract_features,
    stereo_line_depths,
)
from tpuslam.geometry import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.lsd import detect_lines
from tpuslam.kernels.match import (
    MatchParams,
    hamming_distance_matrix,
    hamming_distance_mxu,
    match_descriptors,
    match_topk_database,
)

CAM = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480)


def seg_dist(a, b):
    """Symmetric endpoint distance between segments (2,2), order-invariant."""
    d1 = max(np.linalg.norm(a[0] - b[0]), np.linalg.norm(a[1] - b[1]))
    d2 = max(np.linalg.norm(a[0] - b[1]), np.linalg.norm(a[1] - b[0]))
    return min(d1, d2)


class TestHamming:
    def test_mxu_matches_popcount(self, rng):
        a = jnp.asarray(rng.integers(0, 2**32, (37, 8), dtype=np.uint64).astype(np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (53, 8), dtype=np.uint64).astype(np.uint32))
        ref = np.asarray(hamming_distance_matrix(a, b))
        mxu = np.asarray(hamming_distance_mxu(a, b, 256))
        assert np.array_equal(ref, mxu.astype(np.int64))

    def test_identity_match(self, rng):
        bits = jnp.asarray(rng.integers(0, 2**32, (32, 8), dtype=np.uint64).astype(np.uint32))
        valid = jnp.ones(32, bool)
        m = match_descriptors(bits, valid, bits, valid, MatchParams(max_dist=10, ratio=0.9))
        assert np.array_equal(np.asarray(m.idx), np.arange(32))

    def test_topk_database(self, rng):
        q = jnp.asarray(rng.integers(0, 2**32, (4, 8), dtype=np.uint64).astype(np.uint32))
        db = jnp.concatenate([q, jnp.asarray(rng.integers(0, 2**32, (60, 8), dtype=np.uint64).astype(np.uint32))])
        dist, idx = match_topk_database(q, db, jnp.ones(64, bool), 3)
        assert np.array_equal(np.asarray(idx[:, 0]), np.arange(4))
        assert np.all(np.asarray(dist[:, 0]) == 0)


class TestLSD:
    @pytest.fixture(scope="class")
    def render(self):
        rng = np.random.default_rng(3)
        scene = make_wireframe_scene(rng, n_segments=40, n_frames=2)
        img = render_wireframe_image(scene, 0, noise=1.0, rng=rng)
        return img

    def test_against_cv2_oracle(self, render):
        import cv2

        det = detect_lines(jnp.asarray(render, jnp.float32) / 255.0, 256)
        ours = np.asarray(det.endpoints)[np.asarray(det.valid) > 0.5]
        lsd = cv2.createLineSegmentDetector()
        ref = lsd.detect(render)[0]
        ref = ref.reshape(-1, 2, 2) if ref is not None else np.zeros((0, 2, 2))
        ref_long = ref[np.linalg.norm(ref[:, 0] - ref[:, 1], axis=-1) > 20]
        # each long cv2 segment should have one of ours nearby (within 6px
        # endpoint distance) — detector-level tolerance per SURVEY §9.4
        found = sum(
            1 for r in ref_long if any(seg_dist(r, o) < 6.0 for o in ours)
        )
        assert len(ref_long) > 10
        assert found / len(ref_long) > 0.6
        # and we should not massively over-detect
        assert len(ours) < 3 * len(ref_long) + 20

    def test_single_synthetic_line(self):
        img = np.full((120, 160), 0.8, np.float32)
        import cv2

        cv2.line(img, (20, 100), (140, 20), 0.2, 2, lineType=cv2.LINE_AA)
        det = detect_lines(jnp.asarray(img), 64)
        ep = np.asarray(det.endpoints)[np.asarray(det.valid) > 0.5]
        assert len(ep) >= 1
        # best segment close to the drawn one (edges sit 1px off the centerline)
        target = np.array([[20, 100], [140, 20]], np.float32)
        assert min(seg_dist(target, o) for o in ep) < 5.0


class TestBaseScale:
    """Half-resolution detection (FrontendParams.base_scale): geometry must
    come back in full-res coordinates and long structures must survive."""

    def test_halfres_recalls_long_lines(self):
        rng = np.random.default_rng(7)
        scene = make_wireframe_scene(rng, n_segments=60, n_frames=1, cam=CAM)
        img = render_wireframe_image(scene, 0, noise=1.0, rng=rng)
        imgf = jnp.asarray(img, jnp.float32) / 255.0
        full = extract_features(imgf, FrontendParams(max_lines=256))
        half = extract_features(imgf, FrontendParams(max_lines=256, base_scale=0.5))
        fe = np.asarray(full.endpoints)[np.asarray(full.valid) > 0.5]
        fl = np.asarray(full.length)[np.asarray(full.valid) > 0.5]
        he = np.asarray(half.endpoints)[np.asarray(half.valid) > 0.5]
        long_full = fe[fl > 60]
        assert len(long_full) > 8
        # half-res coordinates are reported at FULL scale: endpoints must
        # land near the full-res detections, not at half coordinates.
        # Recall tolerance is measured (benchmarks): 2 px-wide synthetic
        # wireframe lines are the worst case for downsampled detection;
        # ~75-80% of long structures survive, E2E ATE is the real gate.
        found = sum(1 for f in long_full if any(seg_dist(f, h) < 10.0 for h in he))
        assert found / len(long_full) > 0.6, (found, len(long_full))
        # sigma doubles (coarser localization)
        assert np.asarray(half.sigma)[np.asarray(half.valid) > 0.5].min() >= 1.9

    def test_halfres_matching_across_frames(self):
        rng = np.random.default_rng(8)
        scene = make_wireframe_scene(rng, n_segments=50, n_frames=3, cam=CAM, motion_scale=0.01)
        imgs = [render_wireframe_image(scene, f, noise=1.0, rng=rng) for f in range(2)]
        params = FrontendParams(max_lines=128, base_scale=0.5)
        fa = extract_features(jnp.asarray(imgs[0], jnp.float32) / 255.0, params)
        fb = extract_features(jnp.asarray(imgs[1], jnp.float32) / 255.0, params)
        assert int(np.sum(np.asarray(fa.valid))) > 15
        m = match_descriptors(
            fa.desc_bits, fa.valid, fb.desc_bits, fb.valid, MatchParams(max_dist=110, ratio=0.9)
        )
        mv = np.asarray(m.valid) > 0.5
        assert mv.sum() > 10
        mid_a = np.asarray(fa.midpoint)[mv]
        mid_b = np.asarray(fb.midpoint)[np.asarray(m.idx)[mv]]
        assert np.median(np.linalg.norm(mid_a - mid_b, axis=-1)) < 25.0


class TestFrontend:
    @pytest.fixture(scope="class")
    def frames(self):
        rng = np.random.default_rng(5)
        scene = make_wireframe_scene(rng, n_segments=50, n_frames=3, motion_scale=0.01)
        imgs = [render_wireframe_image(scene, f, noise=1.0, rng=rng) for f in range(2)]
        return scene, imgs

    def test_extract_and_match_consecutive(self, frames):
        scene, imgs = frames
        params = FrontendParams(max_lines=128)
        fa = extract_features(jnp.asarray(imgs[0], jnp.float32) / 255.0, params)
        fb = extract_features(jnp.asarray(imgs[1], jnp.float32) / 255.0, params)
        assert int(np.sum(np.asarray(fa.valid))) > 15
        m = match_descriptors(
            fa.desc_bits, fa.valid, fb.desc_bits, fb.valid, MatchParams(max_dist=110, ratio=0.9)
        )
        n_matches = int(np.sum(np.asarray(m.valid)))
        assert n_matches > 10
        # matched midpoints should be near each other (small camera motion)
        mv = np.asarray(m.valid) > 0.5
        mid_a = np.asarray(fa.midpoint)[mv]
        mid_b = np.asarray(fb.midpoint)[np.asarray(m.idx)[mv]]
        med = np.median(np.linalg.norm(mid_a - mid_b, axis=-1))
        assert med < 25.0


class TestStereo:
    def test_depth_recovery(self):
        """Render the same scene from two rectified-stereo poses; recovered
        endpoint depths must match ground-truth segment depths."""
        rng = np.random.default_rng(7)
        baseline = 0.2
        cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, baseline=baseline)
        scene = make_wireframe_scene(rng, n_segments=45, n_frames=1, cam=cam)
        # right camera: shift along +x in camera frame => T_right = T_b @ T_left
        Tb = np.eye(4, dtype=np.float32)
        Tb[0, 3] = -baseline
        scene_r = scene._replace(poses=np.stack([Tb @ scene.poses[0]]))
        img_l = render_wireframe_image(scene, 0, noise=1.0, rng=rng)
        img_r = render_wireframe_image(scene_r, 0, noise=1.0, rng=rng)

        fl = extract_features(jnp.asarray(img_l, jnp.float32) / 255.0, FrontendParams(max_lines=128))
        fr = extract_features(jnp.asarray(img_r, jnp.float32) / 255.0, FrontendParams(max_lines=128))
        fl = stereo_line_depths(fl, fr, jnp.float32(cam.fx * baseline))

        ok = np.asarray(fl.has_depth) > 0.5
        assert ok.sum() > 8
        # compare against gt depth of nearest scene segment midpoint
        T = scene.poses[0]
        seg_c = scene.segments @ T[:3, :3].T + T[:3, 3]
        gt_mid_uv = []
        gt_depth = []
        for s in range(seg_c.shape[0]):
            p, q = seg_c[s, 0], seg_c[s, 1]
            if p[2] < 0.2 or q[2] < 0.2:
                continue
            uvp = np.array([cam.fx * p[0] / p[2] + cam.cx, cam.fy * p[1] / p[2] + cam.cy])
            uvq = np.array([cam.fx * q[0] / q[2] + cam.cx, cam.fy * q[1] / q[2] + cam.cy])
            gt_mid_uv.append(0.5 * (uvp + uvq))
            gt_depth.append(0.5 * (p[2] + q[2]))
        gt_mid_uv = np.array(gt_mid_uv)
        gt_depth = np.array(gt_depth)

        mids = np.asarray(fl.midpoint)[ok]
        depths = np.asarray(fl.depth)[ok].mean(axis=-1)
        good = 0
        for m, d in zip(mids, depths):
            j = np.argmin(np.linalg.norm(gt_mid_uv - m, axis=-1))
            if np.linalg.norm(gt_mid_uv[j] - m) < 15 and abs(d - gt_depth[j]) / gt_depth[j] < 0.15:
                good += 1
        assert good / ok.sum() > 0.6
