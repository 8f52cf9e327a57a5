"""Point front-end tests: FAST corners vs the cv2 oracle, BRIEF matching
properties, stereo point depths (SURVEY §3.1 `MapPoint`, §6.2 oracles)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from tpuslam.kernels.fast import FASTParams, PointFeatures, detect_corners


def _corner_image(rng, H=240, W=320, n=25, seed_shift=0):
    """Random bright axis-aligned rectangles on dark background: corners at
    known-ish positions, the texture class FAST is defined on."""
    img = np.full((H, W), 30.0, np.float32)
    for k in range(n):
        y = int(rng.integers(30, H - 60))
        x = int(rng.integers(30, W - 60))
        h = int(rng.integers(15, 40))
        w = int(rng.integers(15, 40))
        img[y : y + h, x : x + w] = 30.0 + float(rng.integers(60, 200))
    img += rng.normal(0, 1.0, (H, W)).astype(np.float32)
    return np.clip(img, 0, 255) / 255.0


def test_fast_matches_cv2_oracle(rng):
    """Our dense FAST-9 finds (a superset of NMS differences aside) the same
    corners cv2's FAST finds: >=70% of strong cv2 corners have one of ours
    within 2 px, and vice versa."""
    img = _corner_image(rng)
    params = FASTParams(threshold=20.0)
    feats: PointFeatures = detect_corners(jnp.asarray(img), 512, params)
    ours = np.asarray(feats.uv)[np.asarray(feats.valid) > 0.5]
    assert len(ours) >= 20

    u8 = (img * 255).astype(np.uint8)
    det = cv2.FastFeatureDetector_create(20, True, cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
    kps = det.detect(u8, None)
    border = params.border
    cvpts = np.asarray(
        [k.pt for k in kps if border < k.pt[0] < 320 - border and border < k.pt[1] < 240 - border],
        np.float32,
    )
    assert len(cvpts) >= 20

    def recall(a, b, tol):
        d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        return float((d.min(axis=1) <= tol).mean())

    # every strong cv2 corner has one of ours nearby (NMS picks different
    # representatives within a blob, hence the 2 px tolerance) ...
    assert recall(cvpts, ours, 2.0) >= 0.8, f"cv2->ours recall {recall(cvpts, ours, 2.0):.2f}"
    # ... and every corner of OURS satisfies cv2's raw FAST-9 decision
    # function (oracle without NMS) — no false detections.
    det_raw = cv2.FastFeatureDetector_create(20, False, cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
    cvraw = np.asarray([k.pt for k in det_raw.detect(u8, None)], np.float32)
    assert recall(ours, cvraw, 1.5) >= 0.95, f"ours->cv2raw {recall(ours, cvraw, 1.5):.2f}"


def test_fast_empty_and_flat(rng):
    flat = np.full((120, 160), 0.5, np.float32)
    feats = detect_corners(jnp.asarray(flat), 128, FASTParams())
    assert float(np.asarray(feats.valid).sum()) == 0.0
    assert np.isfinite(np.asarray(feats.uv)).all()


def test_brief_matching_under_shift(rng):
    """Descriptors of the same corners in a translated copy match back with
    high precision via the production matcher."""
    from tpuslam.kernels.match import MatchParams, match_descriptors

    img = _corner_image(rng)
    dy, dx = 3, 5
    img2 = np.roll(img, (dy, dx), axis=(0, 1))
    fa = detect_corners(jnp.asarray(img), 256, FASTParams())
    fb = detect_corners(jnp.asarray(img2), 256, FASTParams())
    m = match_descriptors(
        fa.desc_bits, fa.valid, fb.desc_bits, fb.valid, MatchParams(max_dist=80.0, ratio=0.9)
    )
    idx = np.asarray(m.idx)
    ok = np.asarray(m.valid) > 0.5
    assert ok.sum() >= 20
    ua = np.asarray(fa.uv)
    ub = np.asarray(fb.uv)
    err = ua[ok] + np.array([dx, dy]) - ub[idx[ok]]
    good = (np.linalg.norm(err, axis=-1) <= 2.0).mean()
    assert good >= 0.9, f"shift-match precision {good:.2f}"


def test_brief_invariance_to_brightness(rng):
    """BRIEF compares intensities, so affine brightness changes leave the
    descriptor unchanged."""
    img = _corner_image(rng)
    fa = detect_corners(jnp.asarray(img), 128, FASTParams())
    fb = detect_corners(jnp.asarray(np.clip(img * 0.8 + 0.05, 0, 1)), 128, FASTParams())
    # same corners detected (threshold scaled region keeps the strong ones)
    ua = np.asarray(fa.uv)[np.asarray(fa.valid) > 0.5]
    ub = np.asarray(fb.uv)[np.asarray(fb.valid) > 0.5]
    d = np.linalg.norm(ua[:, None] - ub[None, :], axis=-1)
    pairs = np.argwhere(d < 0.5)
    assert len(pairs) >= 15
    # compare descriptor bits at co-located corners
    ba = np.asarray(fa.desc_bits)
    bb = np.asarray(fb.desc_bits)
    idx_a = np.nonzero(np.asarray(fa.valid) > 0.5)[0]
    idx_b = np.nonzero(np.asarray(fb.valid) > 0.5)[0]
    ham = []
    for pa, pb in pairs:
        x = ba[idx_a[pa]] ^ bb[idx_b[pb]]
        ham.append(sum(bin(int(w)).count("1") for w in x))
    assert np.median(ham) <= 20, f"median hamming {np.median(ham)}"


