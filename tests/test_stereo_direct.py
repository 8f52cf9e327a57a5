"""Direct epipolar stereo (kernels/stereo_direct.py): depth recovery on the
synthetic rectified rig, parity vs the descriptor path, and edge cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.frontend.frame import FrontendParams, extract_features, stereo_line_depths
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import (
    DirectStereoParams,
    direct_line_disparity,
    direct_stereo_depths,
)


@pytest.fixture(scope="module")
def rig():
    rng = np.random.default_rng(7)
    baseline = 0.2
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, baseline=baseline)
    scene = make_wireframe_scene(rng, n_segments=45, n_frames=1, cam=cam)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -baseline
    scene_r = scene._replace(poses=np.stack([Tb @ scene.poses[0]]))
    img_l = render_wireframe_image(scene, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0
    img_r = render_wireframe_image(scene_r, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0
    fl = extract_features(jnp.asarray(img_l), FrontendParams(max_lines=128))
    return cam, scene, img_l, img_r, fl


def _gt_table(cam, scene):
    T = scene.poses[0]
    seg_c = scene.segments @ T[:3, :3].T + T[:3, 3]
    uv, depth = [], []
    for s in range(seg_c.shape[0]):
        p, q = seg_c[s, 0], seg_c[s, 1]
        if p[2] < 0.2 or q[2] < 0.2:
            continue
        uvp = np.array([cam.fx * p[0] / p[2] + cam.cx, cam.fy * p[1] / p[2] + cam.cy])
        uvq = np.array([cam.fx * q[0] / q[2] + cam.cx, cam.fy * q[1] / q[2] + cam.cy])
        uv.append(0.5 * (uvp + uvq))
        depth.append(0.5 * (p[2] + q[2]))
    return np.array(uv), np.array(depth)


def _depth_hit_rate(cam, scene, feats):
    gt_uv, gt_depth = _gt_table(cam, scene)
    ok = np.asarray(feats.has_depth) > 0.5
    mids = np.asarray(feats.midpoint)[ok]
    depths = np.asarray(feats.depth)[ok].mean(axis=-1)
    good = 0
    for m, d in zip(mids, depths):
        j = np.argmin(np.linalg.norm(gt_uv - m, axis=-1))
        if np.linalg.norm(gt_uv[j] - m) < 15 and abs(d - gt_depth[j]) / gt_depth[j] < 0.15:
            good += 1
    return good / max(int(ok.sum()), 1), int(ok.sum())


class TestDirectPointStereo:
    def test_corner_depth_recovery(self, rig):
        """Direct patch correlation recovers corner depths on the rig: FAST
        corners on the left image get depths within tolerance of the nearest
        ground-truth segment endpoint."""
        from tpuslam.kernels.fast import FASTParams, detect_corners
        from tpuslam.kernels.stereo_direct import direct_stereo_point_depths

        cam, scene, img_l, img_r, fl = rig
        pf = detect_corners(jnp.asarray(img_l), 256, FASTParams())
        out = direct_stereo_point_depths(img_l, img_r, pf, cam.fx * cam.baseline)
        ok = np.asarray(out.has_depth) > 0.5
        assert ok.sum() > 10
        # ground-truth depth at each corner from the segment endpoints
        T = scene.poses[0]
        seg_c = scene.segments @ T[:3, :3].T + T[:3, 3]
        ep = seg_c.reshape(-1, 3)
        ep = ep[ep[:, 2] > 0.2]
        uv_gt = np.stack(
            [cam.fx * ep[:, 0] / ep[:, 2] + cam.cx, cam.fy * ep[:, 1] / ep[:, 2] + cam.cy],
            axis=-1,
        )
        uv = np.asarray(out.uv)[ok]
        d = np.asarray(out.depth)[ok]
        good = near = 0
        for m, dd in zip(uv, d):
            j = np.argmin(np.linalg.norm(uv_gt - m, axis=-1))
            if np.linalg.norm(uv_gt[j] - m) < 6:
                near += 1
                if abs(dd - ep[j, 2]) / ep[j, 2] < 0.12:
                    good += 1
        assert near > 8
        assert good / max(near, 1) > 0.6, (good, near)


class TestDirectStereo:
    def test_depth_recovery(self, rig):
        cam, scene, img_l, img_r, fl = rig
        out = direct_stereo_depths(img_l, img_r, fl, cam.fx * cam.baseline)
        rate, n = _depth_hit_rate(cam, scene, out)
        assert n > 8
        assert rate > 0.6

    def test_not_worse_than_descriptor_path(self, rig):
        """The direct path must recover at least as many accurate depths as
        the right-detection descriptor path it replaces in the fused
        pipeline (its raison d'etre is speed at EQUAL-or-better quality)."""
        cam, scene, img_l, img_r, fl = rig
        fr = extract_features(jnp.asarray(img_r), FrontendParams(max_lines=128))
        desc = stereo_line_depths(fl, fr, jnp.float32(cam.fx * cam.baseline))
        direct = direct_stereo_depths(img_l, img_r, fl, cam.fx * cam.baseline)
        rate_desc, n_desc = _depth_hit_rate(cam, scene, desc)
        rate_direct, n_direct = _depth_hit_rate(cam, scene, direct)
        assert n_direct * rate_direct >= n_desc * rate_desc * 0.9

    def test_disparity_subpixel_accuracy(self, rig):
        """Median disparity error of accepted endpoints < 0.5 px against the
        analytic gt disparity fx*b/z."""
        cam, scene, img_l, img_r, fl = rig
        gt_uv, gt_depth = _gt_table(cam, scene)
        disp, okf = direct_line_disparity(
            jnp.asarray(img_l), jnp.asarray(img_r), fl.endpoints, fl.valid,
            fl.angle, DirectStereoParams(),
        )
        ok = np.asarray(okf) > 0.5
        mids = np.asarray(fl.midpoint)[ok]
        d_mid = np.asarray(disp)[ok].mean(axis=-1)
        errs = []
        fxb = cam.fx * cam.baseline
        for m, d in zip(mids, d_mid):
            j = np.argmin(np.linalg.norm(gt_uv - m, axis=-1))
            if np.linalg.norm(gt_uv[j] - m) < 10:
                errs.append(abs(d - fxb / gt_depth[j]))
        assert len(errs) > 5
        assert np.median(errs) < 0.5

    def test_all_invalid_features(self, rig):
        cam, scene, img_l, img_r, fl = rig
        disp, okf = direct_line_disparity(
            jnp.asarray(img_l), jnp.asarray(img_r), fl.endpoints,
            jnp.zeros_like(fl.valid), fl.angle, DirectStereoParams(),
        )
        assert np.asarray(okf).sum() == 0
        assert np.isfinite(np.asarray(disp)).all()

    def test_horizontal_lines_rejected(self):
        K = 8
        H, W = 64, 96
        img = np.zeros((H, W), np.float32)
        img[32, :] = 1.0  # one horizontal line
        ep = np.zeros((K, 2, 2), np.float32)
        ep[0] = [[10, 32], [80, 32]]
        validf = np.zeros(K, np.float32)
        validf[0] = 1.0
        ang = np.zeros(K, np.float32)  # horizontal
        disp, okf = direct_line_disparity(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(ep),
            jnp.asarray(validf), jnp.asarray(ang),
            DirectStereoParams(max_disp=32.0),
        )
        assert np.asarray(okf)[0] == 0.0

    def test_known_shift_recovered(self):
        """A vertical bar shifted 7 px between L and R -> disparity ~7."""
        rng = np.random.default_rng(0)
        H, W = 96, 160
        base = rng.normal(0.0, 0.02, (H, W)).astype(np.float32)
        img_l = base.copy()
        img_r = base.copy()
        x0, d = 90, 7
        img_l[10:86, x0 : x0 + 2] += 0.8
        img_r[10:86, x0 - d : x0 - d + 2] += 0.8
        ep = np.zeros((4, 2, 2), np.float32)
        ep[0] = [[x0 + 0.5, 12], [x0 + 0.5, 84]]
        validf = np.zeros(4, np.float32)
        validf[0] = 1.0
        ang = np.full(4, np.pi / 2, np.float32)
        disp, okf = direct_line_disparity(
            jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(ep),
            jnp.asarray(validf), jnp.asarray(ang),
            DirectStereoParams(max_disp=32.0),
        )
        assert np.asarray(okf)[0] == 1.0
        assert np.allclose(np.asarray(disp)[0], d, atol=0.35)

    def test_coord_scale_halfres_images(self):
        """Prescaled ingest contract: half-res images + FULL-res endpoint
        coords + coord_scale=0.5 must return the FULL-res disparity."""
        rng = np.random.default_rng(1)
        H, W = 96, 160
        base = rng.normal(0.0, 0.02, (H, W)).astype(np.float32)
        img_l, img_r = base.copy(), base.copy()
        x0, d = 90, 8  # full-res shift (even: survives 2x downsample cleanly)
        img_l[10:86, x0 : x0 + 4] += 0.8
        img_r[10:86, x0 - d : x0 - d + 4] += 0.8
        half_l = 0.25 * (img_l[0::2, 0::2] + img_l[0::2, 1::2] + img_l[1::2, 0::2] + img_l[1::2, 1::2])
        half_r = 0.25 * (img_r[0::2, 0::2] + img_r[0::2, 1::2] + img_r[1::2, 0::2] + img_r[1::2, 1::2])
        ep = np.zeros((4, 2, 2), np.float32)
        ep[0] = [[x0 + 2.0, 12], [x0 + 2.0, 84]]  # FULL-res coords
        validf = np.zeros(4, np.float32)
        validf[0] = 1.0
        ang = np.full(4, np.pi / 2, np.float32)
        disp, okf = direct_line_disparity(
            jnp.asarray(half_l), jnp.asarray(half_r), jnp.asarray(ep),
            jnp.asarray(validf), jnp.asarray(ang),
            DirectStereoParams(max_disp=16.0, coord_scale=0.5),
        )
        assert np.asarray(okf)[0] == 1.0
        # disparity comes back in FULL-res px (half-res grid -> 2x coarser,
        # subpixel parabola recovers most of it)
        assert np.allclose(np.asarray(disp)[0], d, atol=0.8), np.asarray(disp)[0]
