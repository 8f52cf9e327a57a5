"""Direct epipolar disparity search for line endpoints (SURVEY §4.2 stereo).

The reference associates stereo lines by detecting + describing lines in BOTH
cameras and matching descriptors (SURVEY §3.1 `Frame` "ComputeStereoMatches").
That design made sense on a CPU where LSD is already paid for; on this
backend the right-camera detect+LBD is ~20 ms of the ~53 ms fused frame —
for an output that is just two endpoint depths per left line.

This module recovers those depths WITHOUT detecting on the right image:
for each valid left segment, sample S points along it, and for each sample
correlate a horizontal intensity window (zero-mean SAD) against the same row
of the right image over a disparity range. Per-sample integer argmin +
quadratic subpixel, then a robust (IRLS) affine fit of disparity along the
segment parameter t — a 3D line's disparity is affine in t, so the fit both
denoises the samples and extrapolates to the endpoints.

TPU shape discipline: everything is fixed-capacity (K lines x S samples x D
disparities); the only gathers are two flat window fetches (~0.3 M elements,
vs the ~40 M random gathers a naive per-(sample, disparity) patch lookup
would issue). The sliding-window cost is built from STATIC slices over the
fetched windows (an unrolled W-loop + cumsum moving means), so nothing
K x S x D x W ever materializes in HBM.

Accuracy: subpixel disparity from the parabola + affine fit beats the
descriptor path's endpoint-crossing construction on the synthetic rig
(see tests/test_stereo_direct.py); near-horizontal lines remain rejected
(epipolar direction parallel to the line = aperture ambiguity), as in the
descriptor path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DirectStereoParams(NamedTuple):
    n_samples: int = 8  # S sample points per segment
    window: int = 12  # correlation window width W (px, along the row)
    max_disp: float = 128.0  # disparity search range (integer grid 0..D-1)
    min_disp: float = 0.5
    min_samples: int = 4  # valid samples required for the affine fit
    max_fit_rms: float = 0.75  # px: residual gate on the affine fit
    ratio: float = 0.85  # best/second-best cost uniqueness gate
    min_contrast: float = 3.0  # left-window stddev gate (0..255 scale)
    max_cost: float = 28.0  # mean ZSAD gate (0..255 scale)
    near_horizontal_deg: float = 10.0
    irls_sigma: float = 0.6  # px: residual scale for the IRLS reweighting
    # the image pair is at coord_scale x the coordinate frame of `endpoints`
    # (host-prescaled half-res ingest: FrontendParams.prescaled). Input
    # coordinates are multiplied by this before sampling; the returned
    # disparity is divided by it (full-res px). Window/disp/rms params above
    # are in IMAGE px.
    coord_scale: float = 1.0


def inject_coord_scale(p, base_scale: float, prescaled: bool):
    """Adapt direct-stereo params to prescaled host ingest: the correlation
    images arrive at base_scale while feature geometry stays full-res.
    No-op if the config already set an explicit coord_scale."""
    if prescaled and base_scale != 1.0 and p.coord_scale == 1.0:
        return p._replace(
            coord_scale=base_scale,
            max_disp=max(8.0, round(p.max_disp * base_scale)),
        )
    return p


def _moving_mean(win: jnp.ndarray, W: int) -> jnp.ndarray:
    """Mean of each length-W window of the last axis (len L -> L - W + 1)."""
    cs = jnp.cumsum(win, axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    return (cs[..., W:] - cs[..., :-W]) / float(W)


def direct_line_disparity_body(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    endpoints: jnp.ndarray,
    validf: jnp.ndarray,
    angle: jnp.ndarray,
    p: DirectStereoParams,
):
    """Per-endpoint disparities of left segments by direct epipolar search.

    img_l/img_r: (H, W) f32 in [0, 1], rectified. endpoints: (K, 2, 2) px.
    validf/angle: (K,) f32 / rad. Returns (disp (K, 2), okf (K,) f32).
    """
    H, W_img = img_l.shape
    K = endpoints.shape[0]
    S, W = p.n_samples, p.window
    D = int(p.max_disp)
    if p.coord_scale != 1.0:
        endpoints = endpoints * p.coord_scale
    L = img_l * 255.0
    R = img_r * 255.0

    t = jnp.linspace(0.1, 0.9, S)
    p0, p1 = endpoints[:, 0], endpoints[:, 1]
    pts = p0[:, None, :] + t[None, :, None] * (p1 - p0)[:, None, :]  # (K,S,2)
    x, y = pts[..., 0], pts[..., 1]
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
    xi = jnp.round(x).astype(jnp.int32)

    # ---- left profile window (flat gather, K*S*W elements) ----------------
    woff = jnp.arange(-(W // 2), W - W // 2)
    colL = xi[..., None] + woff  # (K, S, W)
    l_inb = (colL >= 0) & (colL < W_img)
    colLc = jnp.clip(colL, 0, W_img - 1)
    profL = L.reshape(-1)[yi[..., None] * W_img + colLc]  # (K, S, W)

    # ---- right row span covering every disparity window -------------------
    # window for disparity d starts at column xi - d - W//2; spans of all
    # d in [0, D) form ONE contiguous range of length D - 1 + W per sample.
    span = D - 1 + W
    colR0 = xi - (D - 1) - W // 2
    colR = colR0[..., None] + jnp.arange(span)  # (K, S, span)
    r_inb = (colR >= 0) & (colR < W_img)
    colRc = jnp.clip(colR, 0, W_img - 1)
    winR = R.reshape(-1)[yi[..., None] * W_img + colRc]  # (K, S, span)

    # ---- zero-mean SAD over the sliding window (static slices only) -------
    # index j along the span corresponds to disparity d = D - 1 - j.
    mR = _moving_mean(winR, W)  # (K, S, D)
    mL = jnp.mean(profL, axis=-1, keepdims=True)  # (K, S, 1)
    okR = _moving_mean(r_inb.astype(jnp.float32), W)  # 1.0 iff fully in-bounds
    cost_j = jnp.zeros_like(mR)
    for w in range(W):
        cost_j = cost_j + jnp.abs(
            (winR[..., w : w + D] - mR) - (profL[..., w : w + 1] - mL)
        )
    cost_j = cost_j / float(W) + (1.0 - (okR > 0.999).astype(jnp.float32)) * 1e6
    cost = jnp.flip(cost_j, axis=-1)  # (K, S, D) indexed by disparity d

    # ---- per-sample best + uniqueness + subpixel --------------------------
    dgrid = jnp.arange(D)
    best = jnp.argmin(cost, axis=-1)  # (K, S)
    cbest = jnp.min(cost, axis=-1)
    near = (jnp.abs(dgrid[None, None, :] - best[..., None]) <= 2).astype(jnp.float32)
    c2 = jnp.min(cost + near * 1e6, axis=-1)
    uniq = cbest < p.ratio * c2

    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    cm1 = jnp.take_along_axis(cost, bm1[..., None], -1)[..., 0]
    cp1 = jnp.take_along_axis(cost, bp1[..., None], -1)[..., 0]
    denom = jnp.maximum(cm1 - 2.0 * cbest + cp1, 1e-6)
    sub = jnp.clip(0.5 * (cm1 - cp1) / denom, -1.0, 1.0)
    # NOTE: no sampling-offset term — correlation measures the CONTENT shift
    # between the two windows (both referenced to the same integer column
    # xi), which IS the local disparity; the parabola supplies the subpixel.
    d_s = best.astype(jnp.float32) + sub  # (K, S)

    contrast = jnp.std(profL, axis=-1)
    samp_ok = (
        uniq
        & (cbest < p.max_cost)
        & (contrast > p.min_contrast)
        & jnp.all(l_inb, axis=-1)
        & (y >= 0.0)
        & (y <= H - 1.0)
    ).astype(jnp.float32)

    # ---- robust affine fit d(t) = a + b t over the samples ---------------
    w_s = samp_ok
    a = jnp.zeros((K,))
    b = jnp.zeros((K,))
    tb = jnp.broadcast_to(t[None, :], (K, S))
    for _ in range(3):  # 1 LS + 2 IRLS rounds
        sw = jnp.sum(w_s, axis=-1)
        st_ = jnp.sum(w_s * tb, axis=-1)
        stt = jnp.sum(w_s * tb * tb, axis=-1)
        sd = jnp.sum(w_s * d_s, axis=-1)
        std_ = jnp.sum(w_s * tb * d_s, axis=-1)
        det = sw * stt - st_ * st_
        detc = jnp.where(jnp.abs(det) > 1e-6, det, 1.0)
        a = jnp.where(jnp.abs(det) > 1e-6, (stt * sd - st_ * std_) / detc, 0.0)
        b = jnp.where(jnp.abs(det) > 1e-6, (sw * std_ - st_ * sd) / detc, 0.0)
        r = d_s - (a[:, None] + b[:, None] * tb)
        w_s = samp_ok / (1.0 + (r / p.irls_sigma) ** 2)

    r = d_s - (a[:, None] + b[:, None] * tb)
    n_ok = jnp.sum(samp_ok, axis=-1)
    rms = jnp.sqrt(jnp.sum(samp_ok * r * r, axis=-1) / jnp.maximum(n_ok, 1.0))

    d0 = a  # t = 0 endpoint
    d1 = a + b  # t = 1 endpoint
    disp = jnp.stack([d0, d1], axis=-1)  # (K, 2)

    ang = jnp.abs(angle) % jnp.pi
    ang = jnp.minimum(ang, jnp.pi - ang)
    steep = ang > jnp.deg2rad(p.near_horizontal_deg)
    okf = (
        (validf > 0.5)
        & (n_ok >= p.min_samples)
        & (rms <= p.max_fit_rms)
        & jnp.all(disp > p.min_disp, axis=-1)
        & jnp.all(disp < p.max_disp, axis=-1)
        & steep
    ).astype(jnp.float32)
    return disp / p.coord_scale, okf


@partial(jax.jit, static_argnums=(5,))
def direct_line_disparity(img_l, img_r, endpoints, validf, angle, p: DirectStereoParams):
    return direct_line_disparity_body(img_l, img_r, endpoints, validf, angle, p)


class DirectPointStereoParams(NamedTuple):
    window: int = 12  # correlation window width (px along the row)
    rows: int = 5  # vertical patch extent (a corner needs 2D support —
    # a 1-row profile is ambiguous on vertical edges' antialiased ramps)
    max_disp: float = 128.0
    min_disp: float = 0.5
    ratio: float = 0.8  # best/second-best uniqueness gate
    min_contrast: float = 4.0  # patch stddev gate (0..255 scale)
    max_cost: float = 25.0  # mean ZSAD gate (0..255 scale)
    coord_scale: float = 1.0  # see DirectStereoParams.coord_scale


def direct_point_disparity_body(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    uv: jnp.ndarray,
    validf: jnp.ndarray,
    p: DirectPointStereoParams,
):
    """Per-corner disparity by direct epipolar patch correlation.

    The point analog of `direct_line_disparity_body`: one (rows x window)
    zero-mean-SAD patch per corner, slid over the disparity range on the
    same rows of the right image, integer argmin + quadratic subpixel.
    img_l/img_r: (H, W) f32 in [0, 1], rectified. uv: (K, 2) px.
    Returns (disp (K,), okf (K,) f32).
    """
    H, W_img = img_l.shape
    K = uv.shape[0]
    W, RW = p.window, p.rows
    D = int(p.max_disp)
    if p.coord_scale != 1.0:
        uv = uv * p.coord_scale
    L = img_l * 255.0
    R = img_r * 255.0

    xi = jnp.round(uv[:, 0]).astype(jnp.int32)
    yi0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    roff = jnp.arange(-(RW // 2), RW - RW // 2)
    yi = jnp.clip(yi0[:, None] + roff, 0, H - 1)  # (K, RW)

    woff = jnp.arange(-(W // 2), W - W // 2)
    colL = xi[:, None] + woff  # (K, W)
    l_inb = (colL >= 0) & (colL < W_img)
    colLc = jnp.clip(colL, 0, W_img - 1)
    profL = L.reshape(-1)[yi[:, :, None] * W_img + colLc[:, None, :]]  # (K, RW, W)

    span = D - 1 + W
    colR0 = xi - (D - 1) - W // 2
    colR = colR0[:, None] + jnp.arange(span)  # (K, span)
    r_inb = (colR >= 0) & (colR < W_img)
    colRc = jnp.clip(colR, 0, W_img - 1)
    winR = R.reshape(-1)[yi[:, :, None] * W_img + colRc[:, None, :]]  # (K, RW, span)

    # zero-mean SAD: per-patch means over the full (RW x W) patch
    mR = jnp.mean(_moving_mean(winR, W), axis=1, keepdims=True)  # (K, 1, D)
    mL = jnp.mean(profL, axis=(1, 2))[:, None, None]  # (K, 1, 1)
    cost_j = jnp.zeros((K, 1, D))
    for w in range(W):
        cost_j = cost_j + jnp.sum(
            jnp.abs((winR[:, :, w : w + D] - mR) - (profL[:, :, w : w + 1] - mL)),
            axis=1,
            keepdims=True,
        )
    cost_j = cost_j[:, 0, :] / float(W * RW)
    # per-corner in-bounds penalty over the sliding windows
    okR_j = _moving_mean(r_inb.astype(jnp.float32), W)  # (K, D)
    cost_j = cost_j + (1.0 - (okR_j > 0.999).astype(jnp.float32)) * 1e6
    cost = jnp.flip(cost_j, axis=-1)  # (K, D) indexed by disparity d

    dgrid = jnp.arange(D)
    best = jnp.argmin(cost, axis=-1)  # (K,)
    cbest = jnp.min(cost, axis=-1)
    near = (jnp.abs(dgrid[None, :] - best[:, None]) <= 2).astype(jnp.float32)
    c2 = jnp.min(cost + near * 1e6, axis=-1)
    uniq = cbest < p.ratio * c2

    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    cm1 = jnp.take_along_axis(cost, bm1[:, None], -1)[:, 0]
    cp1 = jnp.take_along_axis(cost, bp1[:, None], -1)[:, 0]
    denom = jnp.maximum(cm1 - 2.0 * cbest + cp1, 1e-6)
    sub = jnp.clip(0.5 * (cm1 - cp1) / denom, -1.0, 1.0)
    disp = best.astype(jnp.float32) + sub

    contrast = jnp.std(profL, axis=(1, 2))
    okf = (
        (validf > 0.5)
        & uniq
        & (cbest < p.max_cost)
        & (contrast > p.min_contrast)
        & jnp.all(l_inb, axis=-1)
        & (disp > p.min_disp)
        & (disp < p.max_disp - 1.0)
        & (uv[:, 1] >= 0.0)
        & (uv[:, 1] <= H - 1.0)
    ).astype(jnp.float32)
    return disp / p.coord_scale, okf


@partial(jax.jit, static_argnums=(4,))
def direct_point_disparity(img_l, img_r, uv, validf, p: DirectPointStereoParams):
    return direct_point_disparity_body(img_l, img_r, uv, validf, p)


def direct_stereo_point_depths(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    pfeats,
    fx_baseline,
    p: DirectPointStereoParams = DirectPointStereoParams(),
):
    """PointFeatures variant of `stereo_point_depths`: corner depths from
    the right IMAGE (no right-camera FAST/BRIEF)."""
    disp, okf = direct_point_disparity(
        jnp.asarray(img_l, jnp.float32),
        jnp.asarray(img_r, jnp.float32),
        pfeats.uv,
        pfeats.valid,
        p,
    )
    depth = okf * jnp.asarray(fx_baseline, jnp.float32) / jnp.maximum(disp, 1e-6)
    return pfeats._replace(depth=depth, has_depth=okf)


def direct_stereo_depths(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    feats,
    fx_baseline,
    p: DirectStereoParams = DirectStereoParams(),
):
    """FrameFeatures variant of the descriptor path's `stereo_line_depths`:
    fills `depth`/`has_depth` of left features from the right IMAGE (no
    right-camera detection)."""
    disp, okf = direct_line_disparity(
        jnp.asarray(img_l, jnp.float32),
        jnp.asarray(img_r, jnp.float32),
        feats.endpoints,
        feats.valid,
        feats.angle,
        p,
    )
    depth = okf[:, None] * jnp.asarray(fx_baseline, jnp.float32) / jnp.maximum(disp, 1e-6)
    return feats._replace(depth=depth, has_depth=okf)
