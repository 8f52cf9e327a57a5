"""Radtan distortion support (SURVEY §3.1 Configs: 'intrinsics, baseline,
distortion'): forward/inverse model, feature-geometry undistortion in the
extract pipeline, and YAML key parsing."""

import numpy as np
import jax.numpy as jnp

from tpuslam.geometry.camera import Distortion, Intrinsics, distort_pixels, undistort_pixels

CAM = Intrinsics(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=640, height=480)
# TUM fr1-like coefficients
DIST = Distortion(k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026)


class TestRadtanModel:
    def test_roundtrip(self, rng):
        uv = np.stack(
            [rng.uniform(40, 600, 500), rng.uniform(40, 440, 500)], axis=-1
        ).astype(np.float32)
        uv_d = np.asarray(distort_pixels(CAM, DIST, jnp.asarray(uv)))
        uv_u = np.asarray(undistort_pixels(CAM, DIST, jnp.asarray(uv_d)))
        err = np.linalg.norm(uv_u - uv, axis=-1)
        assert np.percentile(err, 95) < 0.05, np.percentile(err, 95)

    def test_zero_distortion_is_identity(self, rng):
        uv = np.stack([rng.uniform(0, 640, 50), rng.uniform(0, 480, 50)], -1).astype(np.float32)
        z = Distortion()
        assert z.is_zero
        out = np.asarray(undistort_pixels(CAM, z, jnp.asarray(uv)))
        assert np.allclose(out, uv, atol=1e-4)

    def test_matches_cv2_oracle(self, rng):
        import cv2

        uv_d = np.stack(
            [rng.uniform(60, 580, 200), rng.uniform(60, 420, 200)], axis=-1
        ).astype(np.float32)
        K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1]], np.float64)
        dc = np.array([DIST.k1, DIST.k2, DIST.p1, DIST.p2], np.float64)
        ref = cv2.undistortPoints(uv_d.reshape(-1, 1, 2).astype(np.float64), K, dc, P=K)
        ref = ref.reshape(-1, 2)
        ours = np.asarray(undistort_pixels(CAM, DIST, jnp.asarray(uv_d)))
        err = np.linalg.norm(ours - ref, axis=-1)
        assert np.percentile(err, 95) < 0.05, np.percentile(err, 95)


class TestFeatureUndistortion:
    def test_extract_pipeline_geometry(self, rng):
        """Detect on a distorted render; undistorted segment endpoints must
        line up with the projection of the TRUE 3D segments through the
        ideal pinhole."""
        from tpuslam.frontend.frame import FrontendParams, extract_features
        from tpuslam.io.synthetic import make_wireframe_scene, observe_frame, render_wireframe_image
        import cv2

        scene = make_wireframe_scene(rng, n_segments=40, n_frames=1, cam=CAM)
        img = render_wireframe_image(scene, 0, rng=None, noise=0).astype(np.float32)
        # distort the rendered image via inverse-map remap (test-side cv2)
        H, W = img.shape
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        # pixel (u,v) of the distorted image samples the ideal image at the
        # undistorted location
        src = np.asarray(
            undistort_pixels(CAM, DIST, jnp.asarray(np.stack([uu, vv], -1).reshape(-1, 2)))
        ).reshape(H, W, 2)
        img_d = cv2.remap(img, src[..., 0], src[..., 1], cv2.INTER_LINEAR, borderValue=200.0)

        p = FrontendParams(max_lines=64, dist=DIST, cam=CAM)
        feats = extract_features(jnp.asarray(img_d / 255.0), p)
        valid = np.asarray(feats.valid) > 0.5
        assert valid.sum() >= 10

        # ideal projections of the true segments
        obs = observe_frame(scene, 0)
        gt = obs.seg_uv[obs.seg_visible]  # (S, 2, 2) ideal pinhole pixels

        ep = np.asarray(feats.endpoints)[valid]
        # each detected segment's endpoints must lie near SOME true segment
        # line (match by midpoint distance, then endpoint-to-line distance)
        mids = ep.mean(axis=1)
        gt_mids = gt.mean(axis=1)
        d2 = np.linalg.norm(mids[:, None] - gt_mids[None], axis=-1)
        nearest = d2.argmin(axis=1)
        errs = []
        for i, j in enumerate(nearest):
            a, b = gt[j]
            ab = b - a
            n = np.array([-ab[1], ab[0]]) / (np.linalg.norm(ab) + 1e-9)
            errs.append(max(abs(np.dot(ep[i, 0] - a, n)), abs(np.dot(ep[i, 1] - a, n))))
        errs = np.asarray(errs)
        # most detections within ~2px of the ideal line after undistortion
        assert np.median(errs) < 2.0, np.median(errs)


def test_config_distortion_keys(tmp_path):
    from tpuslam.io.config import settings_from_dict

    st = settings_from_dict(
        {
            "Camera.fx": 517.3,
            "Camera.fy": 516.5,
            "Camera.cx": 318.6,
            "Camera.cy": 255.3,
            "Camera.k1": 0.26,
            "Camera.k2": -0.95,
            "Camera.p1": -0.005,
            "Camera.p2": 0.003,
            "LineExtractor.scaleFactor": 1.2,
        }
    )
    fe = st.tracker.frontend
    assert fe.dist.k1 == 0.26 and fe.dist.p2 == 0.003
    assert fe.cam is not None and fe.cam.fx == 517.3
    assert abs(fe.scale - 1 / 1.2) < 1e-9
