"""KITTI-resolution (1241x376) detector + matching validation.

BASELINE config #4 runs on KITTI odometry frames: wide aspect, long
structural lines (several hundred px). VGA-tuned detection must still hold
up here — the CCL reach (rounds + jumps) fragments long components and the
segment-level collinear merge re-joins them (kernels/lsd.py docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from tpuslam.frontend.frame import FrontendParams, extract_features
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.lsd import LSDParams, detect_lines

KCAM = Intrinsics(fx=718.9, fy=718.9, cx=607.0, cy=185.0, width=1241, height=376, baseline=0.537)


def _seg_dist(a, b):
    d1 = np.linalg.norm(a[0] - b[0]) + np.linalg.norm(a[1] - b[1])
    d2 = np.linalg.norm(a[0] - b[1]) + np.linalg.norm(a[1] - b[0])
    return 0.5 * min(d1, d2)


@pytest.fixture(scope="module")
def kitti_img():
    rng = np.random.default_rng(11)
    scene = make_wireframe_scene(rng, n_segments=70, n_frames=2, cam=KCAM, motion_scale=0.01)
    return render_wireframe_image(scene, 0, noise=1.0, rng=rng)


def test_cv2_oracle_at_kitti_resolution(kitti_img):
    det = detect_lines(jnp.asarray(kitti_img, jnp.float32) / 255.0, 256)
    ours = np.asarray(det.endpoints)[np.asarray(det.valid) > 0.5]
    lsd = cv2.createLineSegmentDetector()
    ref = lsd.detect(kitti_img)[0]
    ref = ref.reshape(-1, 2, 2) if ref is not None else np.zeros((0, 2, 2))
    ref_long = ref[np.linalg.norm(ref[:, 0] - ref[:, 1], axis=-1) > 30]
    assert len(ref_long) > 10
    found = sum(1 for r in ref_long if any(_seg_dist(r, o) < 8.0 for o in ours))
    assert found / len(ref_long) > 0.6, f"recall {found / len(ref_long):.2f}"


def test_long_lines_survive_fragmentation(kitti_img):
    """Segments far beyond the CCL reach (~128-192 px at default params) must
    come out as LONG detections via the collinear merge, not as fragments."""
    det = detect_lines(jnp.asarray(kitti_img, jnp.float32) / 255.0, 256)
    v = np.asarray(det.valid) > 0.5
    lengths = np.asarray(det.length)[v]
    # the oracle finds such lines in this scene; we must too
    lsd = cv2.createLineSegmentDetector()
    ref = lsd.detect(kitti_img)[0].reshape(-1, 2, 2)
    ref_len = np.linalg.norm(ref[:, 0] - ref[:, 1], axis=-1)
    assert ref_len.max() > 300, "fixture must contain long lines"
    assert lengths.max() > 0.7 * ref_len.max(), (
        f"longest detection {lengths.max():.0f}px vs oracle {ref_len.max():.0f}px"
    )


def test_extract_and_match_at_kitti_resolution():
    """Consecutive-frame descriptor matching holds up at 1241x376 (LBD patch
    covers the central 64 px of long segments — enough signature for
    frame-to-frame association)."""
    from tpuslam.kernels.match import MatchParams, match_descriptors

    rng = np.random.default_rng(11)
    scene = make_wireframe_scene(rng, n_segments=70, n_frames=2, cam=KCAM, motion_scale=0.01)
    fe = FrontendParams()
    feats = []
    for f in range(2):
        img = render_wireframe_image(scene, f, noise=1.0, rng=rng)
        feats.append(extract_features(jnp.asarray(img, jnp.float32) / 255.0, fe))
    fa, fb = feats
    m = match_descriptors(fa.desc_bits, fa.valid, fb.desc_bits, fb.valid, MatchParams())
    ok = np.asarray(m.valid) > 0.5
    assert ok.sum() >= 25, f"only {ok.sum()} matches at KITTI resolution"
    # matched segments should be geometrically consistent (small motion)
    ma = np.asarray(fa.midpoint)[ok]
    mb = np.asarray(fb.midpoint)[np.asarray(m.idx)[ok]]
    good = (np.linalg.norm(ma - mb, axis=-1) < 40.0).mean()
    assert good >= 0.8, f"only {good:.2f} of matches geometrically consistent"
