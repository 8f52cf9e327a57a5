"""Per-frame feature extraction: the Frame front half (SURVEY §4.2).

The reference's ``Frame`` ctor runs pyramid -> LSD -> LBD -> stereo matching
as sequential OpenCV calls. Here the whole front half is ONE jitted XLA
program per camera (``extract_features``) plus one for stereo association
(``stereo_line_depths``) — two device dispatches per stereo frame, fixed
shapes throughout (SURVEY §9.4 items 2, 4).

Level merging: lines detected on pyramid level l are mapped back to level-0
pixel coordinates (x / 0.8^l) and the union is reduced to a fixed capacity K
by detection response, with the measurement sigma scaled by the level factor.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.camera import Distortion, Intrinsics, undistort_pixels
from tpuslam.kernels.image import build_pyramid, image_gradients
from tpuslam.kernels.lbd import LBDParams, lbd_descriptors
from tpuslam.kernels.lsd import DetectedLines, LSDParams, detect_lines
from tpuslam.kernels.match import (
    MatchParams,
    angle_penalty,
    length_ratio_penalty,
    match_descriptors,
    stereo_row_penalty,
)


class FrontendParams(NamedTuple):
    max_lines: int = 256  # merged per-frame capacity K
    n_levels: int = 2
    scale: float = 0.8
    # detect + describe at this fraction of the input resolution (feature
    # geometry is reported in FULL-resolution coordinates, sigma scaled up).
    # The detector's cost is ~linear in pixel count (CCL propagation,
    # compat planes, and the (K, N) moment compare-reduces all scan every
    # pixel), so 0.5 cuts the dominant term of the frame budget ~4x at the
    # cost of ~2x coarser endpoint localization (absorbed by the per-level
    # sigma weighting in the pose LM). 1.0 = off.
    base_scale: float = 1.0
    # the caller downscales images to base_scale ON THE HOST before they
    # reach the device (Tracker does this at track_* entry): extract skips
    # the in-program resize but still reports geometry at full resolution.
    # Purpose: the h2d image upload is the largest host-path cost on the
    # axon tunnel (~30 ms for a VGA u8 pair at ~20 MB/s — PERF_NOTES.md);
    # shipping the half image cuts it 4x.
    prescaled: bool = False
    lsd: LSDParams = LSDParams()
    lbd: LBDParams = LBDParams()
    # radtan distortion (TUM fr1/fr2, raw EuRoC): detection/description run
    # on the DISTORTED image (remap-free TPU path); segment geometry is then
    # undistorted analytically. `cam` must be set when dist is nonzero.
    # Stereo association still assumes rectified inputs (as the reference's
    # stereo pipelines do).
    dist: Distortion = Distortion()
    cam: Intrinsics | None = None


def _undistort_feature_geometry(feats: "FrameFeatures", cam: Intrinsics, dist: Distortion):
    ep = undistort_pixels(cam, dist, feats.endpoints)  # (K, 2, 2)
    d = ep[:, 1] - ep[:, 0]
    return feats._replace(
        endpoints=ep,
        midpoint=0.5 * (ep[:, 0] + ep[:, 1]),
        angle=jnp.arctan2(d[:, 1], d[:, 0]),
        length=jnp.linalg.norm(d, axis=-1),
    )


class FrameFeatures(NamedTuple):
    """Fixed-capacity per-frame line features (level-0 pixel coords).

    Validity fields are float32 {0.0, 1.0}, NOT bool: boolean arrays at jit
    boundaries trigger pathological Mosaic code paths on the axon backend
    (see kernels/match.py docstring); f32 masks also compose directly with
    the additive-penalty gating used throughout.
    """

    endpoints: jnp.ndarray  # (K, 2, 2)
    valid: jnp.ndarray  # (K,) f32 {0, 1}
    angle: jnp.ndarray  # (K,)
    length: jnp.ndarray  # (K,)
    midpoint: jnp.ndarray  # (K, 2)
    response: jnp.ndarray  # (K,)
    level: jnp.ndarray  # (K,) int32 pyramid level
    sigma: jnp.ndarray  # (K,) measurement std in px (grows with level)
    desc: jnp.ndarray  # (K, 72) float LBD
    desc_bits: jnp.ndarray  # (K, n_bits/32) uint32 binary LBD
    # stereo (filled by stereo_line_depths; zeros for mono)
    depth: jnp.ndarray  # (K, 2) metric depth at each endpoint, 0 = unknown
    has_depth: jnp.ndarray  # (K,) f32 {0, 1}


@partial(jax.jit, static_argnums=(1, 2, 3))
def _pyramid_jit(img, n_levels: int, scale: float, blur_sigma: float = 0.6):
    return tuple(build_pyramid(img, n_levels, scale, blur_sigma))


@partial(jax.jit, static_argnums=(2,))
def _lbd_stage(lim, endpoints, lbd_params: LBDParams):
    gx, gy, _, _ = image_gradients(lim * 255.0)
    return lbd_descriptors(gx, gy, endpoints, lbd_params)


def prescaled_shape(H: int, W: int, params: FrontendParams):
    """Image shape the extract programs expect for (H, W) input frames —
    (H, W) itself unless prescaled host ingest is on."""
    if not params.prescaled or params.base_scale == 1.0:
        return H, W
    s = params.base_scale
    return max(16, int(round(H * s))), max(16, int(round(W * s)))


def host_prescale(img, params: FrontendParams):
    """Host-side downscale to base_scale for prescaled ingest (numpy mirror
    of the in-program anti-alias + bilinear resize in `_fused_extract`;
    preserves dtype so u8 frames stay u8 across the wire)."""
    import numpy as np

    if not params.prescaled or params.base_scale == 1.0:
        return img
    img = np.asarray(img)
    H, W = img.shape
    bh, bw = prescaled_shape(H, W, params)
    s = params.base_scale
    sig = 0.5 * (1.0 / s - 1.0)
    try:
        import cv2

        sm = cv2.GaussianBlur(img, (0, 0), sig) if sig > 0 else img
        return cv2.resize(sm, (bw, bh), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        pass
    # numpy fallback: 2x2 area mean (needs the exact-half case)
    if bh * 2 <= H and bw * 2 <= W and abs(s - 0.5) < 1e-6:
        a = img[: bh * 2, : bw * 2].astype(np.float32)
        m = 0.25 * (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2])
        return m.round().astype(img.dtype) if img.dtype == np.uint8 else m.astype(img.dtype)
    raise RuntimeError(f"host_prescale: unsupported scale {s} without cv2")


@partial(jax.jit, static_argnums=(1,))
def _merge_levels(per_level, params: FrontendParams) -> FrameFeatures:
    """Scale per-level detections to level 0 and keep top-K by response."""
    K = params.max_lines
    rows = []
    base_up = 1.0 / params.base_scale
    for lvl, (det, desc, bits) in enumerate(per_level):
        up = base_up / (params.scale**lvl)
        rows.append(
            dict(
                endpoints=det.endpoints * up,
                valid=det.valid,
                angle=det.angle,
                length=det.length * up,
                midpoint=det.midpoint * up,
                response=det.response * up * up,  # support area in level-0 px
                level=jnp.full((K,), lvl, jnp.int32),
                sigma=jnp.full((K,), up, jnp.float32),
                desc=desc,
                bits=bits,
            )
        )
    cat = {k: jnp.concatenate([r[k] for r in rows]) for k in rows[0]}
    score = cat["response"] * cat["valid"] - (1.0 - cat["valid"])
    _, order = jax.lax.top_k(score, K)

    def take(x):
        return x[order]

    return FrameFeatures(
        endpoints=take(cat["endpoints"]),
        valid=take(cat["valid"]),
        angle=take(cat["angle"]),
        length=take(cat["length"]),
        midpoint=take(cat["midpoint"]),
        response=take(cat["response"]),
        level=take(cat["level"]),
        sigma=take(cat["sigma"]),
        desc=take(cat["desc"]),
        desc_bits=take(cat["bits"]),
        depth=jnp.zeros((K, 2), jnp.float32),
        has_depth=jnp.zeros((K,), jnp.float32),
    )


@partial(jax.jit, static_argnums=(1,))
def _fused_extract(img, params: FrontendParams) -> FrameFeatures:
    if params.base_scale != 1.0 and not params.prescaled:
        from tpuslam.kernels.image import gaussian_blur

        H, W = img.shape
        bh = max(16, int(round(H * params.base_scale)))
        bw = max(16, int(round(W * params.base_scale)))
        # MILD anti-alias only: the textbook sigma (~0.6/scale = 1.2 at 0.5)
        # washes out 1-2 px lines entirely — measured recall of long lines
        # vs full-res detection drops to 46% at sigma 1.2 vs 77% at 0.5
        # (bilinear resize already averages 2x2 neighborhoods at scale 0.5)
        img = jax.image.resize(
            gaussian_blur(img, 0.5 * (1.0 / params.base_scale - 1.0)),
            (bh, bw),
            method="linear",
        )
    levels = _pyramid_jit.__wrapped__(img, params.n_levels, params.scale)
    per_level = []
    for lim in levels:
        det: DetectedLines = detect_lines.__wrapped__(lim, params.max_lines, params.lsd)
        desc, bits = _lbd_stage.__wrapped__(lim, det.endpoints, params.lbd)
        per_level.append((det, desc, bits))
    feats = _merge_levels.__wrapped__(tuple(per_level), params)
    if not params.dist.is_zero:
        if params.cam is None:
            raise ValueError("FrontendParams.cam required when distortion is set")
        feats = _undistort_feature_geometry(feats, params.cam, params.dist)
    return feats


def extract_features(img: jnp.ndarray, params: FrontendParams = FrontendParams()) -> FrameFeatures:
    """(H, W) grayscale f32 in [0, 1] -> FrameFeatures.

    ONE fused program by default: the per-frame hot path must stay within
    the terminal's small resident-executable budget or every dispatch pays
    a re-upload (PERF_NOTES.md). Set TPUSLAM_STAGED=1 to run the stages as
    separate programs (smaller compiles; useful when the remote-compile
    service's latency lottery keeps killing the fused compile).
    """
    img = jnp.asarray(img, jnp.float32)
    if os.environ.get("TPUSLAM_STAGED", "0") == "1":
        levels = _pyramid_jit(img, params.n_levels, params.scale)
        per_level = []
        for lim in levels:
            det: DetectedLines = detect_lines(lim, params.max_lines, params.lsd)
            desc, bits = _lbd_stage(lim, det.endpoints, params.lbd)
            per_level.append((det, desc, bits))
        feats = _merge_levels(tuple(per_level), params)
        if not params.dist.is_zero:
            if params.cam is None:
                raise ValueError("FrontendParams.cam required when distortion is set")
            feats = jax.jit(_undistort_feature_geometry, static_argnums=(1, 2))(
                feats, params.cam, params.dist
            )
        return feats
    return _fused_extract(img, params)


class StereoParams(NamedTuple):
    max_dy: float = 12.0  # midpoint row tolerance (rectified)
    min_disp: float = 0.5
    max_disp: float = 200.0
    angle_tol: float = 0.15
    min_len_ratio: float = 0.6
    match: MatchParams = MatchParams(max_dist=110.0, ratio=0.95)


def _x_at_row(endpoints: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x-coordinate where segment (2, 2) crosses image row y (extrapolated)."""
    p0, p1 = endpoints[0], endpoints[1]
    dy = p1[1] - p0[1]
    t = (y - p0[1]) / jnp.where(jnp.abs(dy) < 1e-6, jnp.sign(dy) * 1e-6 + 1e-9, dy)
    return p0[0] + t * (p1[0] - p0[0])


@partial(jax.jit, static_argnums=(6,))
def _stereo_gate_penalty(mid_l, ang_l, len_l, mid_r, ang_r, len_r, params: StereoParams):
    return (
        stereo_row_penalty(mid_l, mid_r, params.max_dy, params.min_disp, params.max_disp)
        + angle_penalty(ang_l, ang_r, params.angle_tol)
        + length_ratio_penalty(len_l, len_r, params.min_len_ratio)
    )


@partial(jax.jit, static_argnums=(6, 7))
def _stereo_depth_post(
    ep_l, ang_l, ep_r, idx, mvalidf, fx_baseline, params: StereoParams, near_horizontal_deg: float
):
    r_ep = ep_r[jnp.maximum(idx, 0)]  # (K, 2, 2)
    xr0 = jax.vmap(_x_at_row)(r_ep, ep_l[:, 0, 1])
    xr1 = jax.vmap(_x_at_row)(r_ep, ep_l[:, 1, 1])
    disp = jnp.stack([ep_l[:, 0, 0] - xr0, ep_l[:, 1, 0] - xr1], axis=-1)
    disp_okf = jnp.prod(
        ((disp > params.min_disp) & (disp < params.max_disp)).astype(jnp.float32),
        axis=-1,
    )
    # reject near-horizontal lines: row-crossing is ill-posed
    ang = jnp.abs(ang_l) % jnp.pi
    ang = jnp.minimum(ang, jnp.pi - ang)
    steepf = (ang > jnp.deg2rad(near_horizontal_deg)).astype(jnp.float32)
    okf = mvalidf * disp_okf * steepf
    depth = okf[:, None] * fx_baseline / jnp.maximum(disp, 1e-6)
    return depth, okf


@partial(jax.jit, static_argnums=(13, 14))
def _fused_stereo(
    mid_l, ang_l, len_l, bits_l, valid_l, ep_l,
    mid_r, ang_r, len_r, bits_r, valid_r, ep_r,
    fx_baseline, params: StereoParams, near_horizontal_deg: float,
):
    from tpuslam.kernels.match import _match_body

    pen = _stereo_gate_penalty.__wrapped__(mid_l, ang_l, len_l, mid_r, ang_r, len_r, params)
    m = _match_body(bits_l, valid_l, bits_r, valid_r, pen, params.match)
    return _stereo_depth_post.__wrapped__(
        ep_l, ang_l, ep_r, m.idx, m.valid, fx_baseline, params, near_horizontal_deg
    )


def stereo_line_depths(
    left: FrameFeatures,
    right: FrameFeatures,
    fx_baseline,
    params: StereoParams = StereoParams(),
    near_horizontal_deg: float = 10.0,
) -> FrameFeatures:
    """Associate left<->right lines and recover endpoint depths.

    Rectified stereo: a left endpoint at row y matches the right line where it
    crosses row y; disparity = x_L - x_R(y), depth = fx * b / disp
    (SURVEY §4.2 '[DEV: Hamming top-k on MXU]'). Near-horizontal lines are
    rejected (disparity ill-conditioned along the epipolar direction).

    One fused program with flat, fully-used arguments (the shapes of the
    per-frame device pipeline are set by the terminal's resident-executable
    budget and the compile-service pathologies documented in PERF_NOTES.md:
    flat f32/uint32 args, additive-penalty gates, Python-float constants).
    """
    depth, okf = _fused_stereo(
        left.midpoint, left.angle, left.length, left.desc_bits, left.valid, left.endpoints,
        right.midpoint, right.angle, right.length, right.desc_bits, right.valid, right.endpoints,
        jnp.asarray(fx_baseline, jnp.float32), params, near_horizontal_deg,
    )
    return left._replace(depth=depth, has_depth=okf)
