"""TPU-native LSD-style line segment detector (SURVEY §2 L1, §5 'LSD').

The reference wraps OpenCV's sequential region-growing LSD. Region growing is
inherently serial, so this is a data-parallel reformulation (SURVEY §9.4
risk 1) with the same ingredients — level-line angle field, 22.5 deg angular
tolerance, magnitude threshold rho = q / sin(tol), rectangle fit by weighted
moments, density validation — but grown via *connected-component labeling*:

1. gradient magnitude + level-line angle per pixel (kernels/image.py)
2. support mask: mag > rho
3. connectivity: 8-neighbors whose level-line angles agree within tol
4. labels = min-label flood: alternate 3x3 masked min-propagation with
   pointer jumping (label <- label[label]), O(log max_segment_len) rounds —
   the classic GPU/TPU connected-components scheme, all dense vector ops
5. per-component weighted moments via jax.ops.segment_sum over flat labels;
   principal direction from the 2x2 second-moment matrix (rectangle fit)
6. endpoints from per-component min/max of the projection onto the principal
   direction (segment_min/max)
7. validation: support count, length, density (count / (length * width)) —
   the a-contrario NFA test collapses to these geometric criteria here
   (detector differences are absorbed at trajectory level, SURVEY §9.4)

Outputs fixed-capacity arrays: (K, 2, 2) endpoints + masks, top-K by support
size. Oracle for tests: cv2.createLineSegmentDetector (SURVEY §6.2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.kernels.image import gaussian_blur, image_gradients


class LSDParams(NamedTuple):
    angle_tol: float = math.pi / 8  # 22.5 deg
    quant: float = 2.0  # gradient quantization error bound (on [0,255] scale)
    min_length: float = 15.0  # px, at detection level
    min_support: int = 20  # pixels in component
    min_density: float = 0.35  # support / (length * width)
    max_width: float = 8.0  # px, reject blobs (density is the main gate;
    # the Gaussian prefilter widens legitimate edge strips to ~2-5 px)
    n_iters: int = 5  # (3 propagations + 1 jump) rounds; reach ~370 px
    # (junction-split fragments beyond that merge in merge_collinear)
    prefilter_sigma: float = 0.75  # LSD's 0.6/0.8 pre-smoothing (0 = off);
    # without it, anti-aliased near-axis lines fragment at stair-steps
    merge_fragments: bool = True  # collinear post-merge (junction splits)


class DetectedLines(NamedTuple):
    endpoints: jnp.ndarray  # (K, 2, 2) [[x0,y0],[x1,y1]] in px
    valid: jnp.ndarray  # (K,) f32 {0,1} (f32: crosses jit boundaries)
    response: jnp.ndarray  # (K,) support pixel count
    angle: jnp.ndarray  # (K,) segment direction angle
    width: jnp.ndarray  # (K,) rectangle width
    midpoint: jnp.ndarray  # (K, 2)
    length: jnp.ndarray  # (K,)


def _angle_close(a: jnp.ndarray, b: jnp.ndarray, tol: float) -> jnp.ndarray:
    d = jnp.abs(a - b)
    d = jnp.minimum(d, 2.0 * jnp.pi - d)
    return d < tol


def _shift(x: jnp.ndarray, dy: int, dx: int):
    """Shift a 2D array by (dy, dx). Uses roll; wrap-around artifacts are
    blocked by the 1px zero-magnitude border from image_gradients (border
    pixels are never in the support mask, so masked compat kills them)."""
    return jnp.roll(x, (dy, dx), axis=(0, 1))


@partial(jax.jit, static_argnums=(1, 2))
def detect_lines(img: jnp.ndarray, max_lines: int = 256, params: LSDParams = LSDParams()):
    """Detect line segments in an (H, W) grayscale f32 image in [0, 1].

    Returns DetectedLines with capacity ``max_lines`` (mask-padded).
    """
    H, W = img.shape
    N = H * W
    if params.prefilter_sigma > 0:
        img = gaussian_blur(img, params.prefilter_sigma)
    gx, gy, mag, angle = image_gradients(img * 255.0)  # LSD thresholds on 0..255

    rho = params.quant / math.sin(params.angle_tol)
    support = mag > rho

    # --- connected components by masked min-label propagation -------------
    idx = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    BIG = jnp.int32(N)  # sentinel for non-support
    labels = jnp.where(support, idx, BIG)

    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    # Pre-compute neighbor compatibility masks once (they don't change).
    compat = [
        support & _shift(support, dy, dx) & _angle_close(angle, _shift(angle, dy, dx), params.angle_tol)
        for dy, dx in offsets
    ]

    def jump(lf):
        """One pointer-jumping hop: label <- min(label, label-of-label).

        The ONE random gather per round (N elements) — gathers scalarize on
        this backend, so rounds use two cheap roll-propagations (dense VPU)
        per jump; reach grows ~(r+2)*2 per round (PERF_NOTES.md).
        """
        lut = jnp.append(lf, BIG)  # slot N = sentinel
        return jnp.minimum(lut[jnp.minimum(lf, N)], lf)

    def propagate(labels):
        m = labels
        for (dy, dx), ok in zip(offsets, compat):
            m = jnp.minimum(m, jnp.where(ok, _shift(labels, dy, dx), BIG))
        return m

    def body(labels, _):
        m = propagate(propagate(propagate(labels)))
        return jump(m.reshape(-1)).reshape(H, W), None

    labels, _ = jax.lax.scan(body, labels, None, length=params.n_iters)

    flat_labels = jnp.where(labels.reshape(-1) < BIG, labels.reshape(-1), N)

    # --- per-component weighted moments (segment_sum over N+1 bins) -------
    ys, xs = jnp.divmod(jnp.arange(N, dtype=jnp.int32), W)
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    w = jnp.where(support.reshape(-1), mag.reshape(-1), 0.0)

    # single fused scatter: all 7 per-component moments in one segment_sum
    moments = jnp.stack(
        [
            support.reshape(-1).astype(jnp.float32),
            w,
            w * xs,
            w * ys,
            w * xs * xs,
            w * ys * ys,
            w * xs * ys,
        ],
        axis=-1,
    )
    sums = jax.ops.segment_sum(moments, flat_labels, N + 1)  # (N+1, 7)
    count, sw, sx, sy, sxx, syy, sxy = [sums[:, i] for i in range(7)]

    # --- top-K components by support count --------------------------------
    count = count.at[N].set(0.0)
    resp, comp_ids = jax.lax.top_k(count, max_lines)  # (K,)

    csw = jnp.maximum(sw[comp_ids], 1e-6)
    cx = sx[comp_ids] / csw
    cy = sy[comp_ids] / csw
    # central second moments
    mxx = sxx[comp_ids] / csw - cx * cx
    myy = syy[comp_ids] / csw - cy * cy
    mxy = sxy[comp_ids] / csw - cx * cy
    # principal direction of the 2x2 moment matrix (largest eigenvector)
    tr = mxx + myy
    det = mxx * myy - mxy * mxy
    lam1 = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    lam2 = tr - lam1
    # eigenvector for lam1: (mxy, lam1 - mxx) or (lam1 - myy, mxy)
    e1 = jnp.stack([mxy, lam1 - mxx], axis=-1)
    e2 = jnp.stack([lam1 - myy, mxy], axis=-1)
    use_e1 = jnp.linalg.norm(e1, axis=-1) > jnp.linalg.norm(e2, axis=-1)
    ev = jnp.where(use_e1[:, None], e1, e2)
    ev = ev / jnp.maximum(jnp.linalg.norm(ev, axis=-1, keepdims=True), 1e-9)

    # --- per-component extent along the principal direction ---------------
    # gather per-pixel component slot: map each pixel's label to its slot in
    # comp_ids (or K = invalid). Build inverse map label -> slot.
    inv = jnp.full((N + 1,), max_lines, jnp.int32)
    inv = inv.at[comp_ids].set(jnp.arange(max_lines, dtype=jnp.int32))
    pix_slot = inv[flat_labels]  # (N,) slot in 0..K, K = not selected

    # one vector gather instead of five scalar-table gathers
    tbl = jnp.concatenate(
        [
            jnp.stack([ev[:, 0], ev[:, 1], cx, cy], axis=-1),
            jnp.zeros((1, 4), jnp.float32),
        ]
    )  # (K+1, 4)
    vals = tbl[pix_slot]  # (N, 4)
    dirx, diry, ccx, ccy = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
    t = (xs - ccx) * dirx + (ys - ccy) * diry
    t = jnp.where(support.reshape(-1), t, 0.0)
    tn = (xs - ccx) * (-diry) + (ys - ccy) * dirx  # normal offset

    # one fused segment_min for both extents (max = -min of negated)
    ext = jax.ops.segment_min(
        jnp.stack(
            [
                jnp.where(support.reshape(-1), t, jnp.inf),
                jnp.where(support.reshape(-1), -t, jnp.inf),
            ],
            axis=-1,
        ),
        pix_slot,
        max_lines + 1,
    )
    t_min = ext[:max_lines, 0]
    t_max = -ext[:max_lines, 1]
    # robust width: sqrt of second moment normal to the line (std * 2*sqrt(3)
    # equals full width for a uniform strip)
    sn2 = jax.ops.segment_sum(
        jnp.where(support.reshape(-1), w * tn * tn, 0.0), pix_slot, max_lines + 1
    )[:max_lines]
    # weighted variance normal to the line; full width of a uniform strip is
    # sqrt(12 * var) = 2 * sqrt(3 * var)
    width = 2.0 * jnp.sqrt(3.0 * jnp.maximum(sn2 / csw, 1e-9))

    t_min = jnp.where(jnp.isfinite(t_min), t_min, 0.0)
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 0.0)
    length = t_max - t_min
    p0 = jnp.stack([cx + t_min * ev[:, 0], cy + t_min * ev[:, 1]], axis=-1)
    p1 = jnp.stack([cx + t_max * ev[:, 0], cy + t_max * ev[:, 1]], axis=-1)

    density = resp / jnp.maximum(length * jnp.maximum(width, 1.0), 1e-6)
    valid = (
        (resp >= params.min_support)
        & (length >= params.min_length)
        & (density >= params.min_density)
        & (width <= params.max_width)
    )

    seg_angle = jnp.arctan2(ev[:, 1], ev[:, 0])
    det = DetectedLines(
        endpoints=jnp.stack([p0, p1], axis=1),
        valid=valid.astype(jnp.float32),
        response=resp,
        angle=seg_angle,
        width=width,
        midpoint=jnp.stack([cx, cy], axis=-1),
        length=length,
    )
    if params.merge_fragments:
        det = merge_collinear(det)
    return det


def merge_collinear(
    det: DetectedLines,
    tol_angle: float = 0.06,
    tol_perp: float = 2.0,
    max_gap: float = 12.0,
    n_rounds: int = 6,
) -> DetectedLines:
    """Merge collinear, nearly-touching segments (junction/stair fragments).

    The connected-component labeling reformulated at segment granularity:
    a K x K mutual-collinearity adjacency matrix, min-label propagation over
    it (log K rounds of masked row-min + pointer jumping), then per-group
    moments for the merged endpoints. All dense fixed-shape ops.
    """
    K = det.endpoints.shape[0]
    validb = det.valid > 0.5  # internal bool is fine; boundary stays f32
    p0, p1 = det.endpoints[:, 0], det.endpoints[:, 1]
    d = p1 - p0
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

    def perp_to_i(p):  # (K, 2) points -> (K, K): dist of p[j] to line i
        rel = p[None, :, :] - det.midpoint[:, None, :]
        return jnp.abs(rel[..., 0] * (-dn[:, None, 1]) + rel[..., 1] * dn[:, None, 0])

    perp_ok = (perp_to_i(p0) < tol_perp) & (perp_to_i(p1) < tol_perp)

    da = jnp.abs(det.angle[:, None] - det.angle[None, :]) % jnp.pi
    da = jnp.minimum(da, jnp.pi - da)
    ang_ok = da < tol_angle

    # interval gap along i's direction
    def proj_to_i(p):  # (K, K): coordinate of p[j] along line i
        rel = p[None, :, :] - det.midpoint[:, None, :]
        return rel[..., 0] * dn[:, None, 0] + rel[..., 1] * dn[:, None, 1]

    tj0, tj1 = proj_to_i(p0), proj_to_i(p1)
    j_lo = jnp.minimum(tj0, tj1)
    j_hi = jnp.maximum(tj0, tj1)
    # i's own interval along its direction (midpoint is the support CENTROID,
    # not the endpoint midpoint, so the interval is not symmetric around 0)
    ti = jnp.sum((det.endpoints - det.midpoint[:, None, :]) * dn[:, None, :], axis=-1)
    i_lo = jnp.min(ti, axis=1)[:, None]
    i_hi = jnp.max(ti, axis=1)[:, None]
    gap = jnp.maximum(j_lo - i_hi, i_lo - j_hi)  # <0 if overlapping
    gap_ok = gap < max_gap

    vv = validb[:, None] & validb[None, :]
    adj = perp_ok & ang_ok & gap_ok & vv
    adj = adj & adj.T
    adj = adj | jnp.eye(K, dtype=bool)

    labels = jnp.arange(K, dtype=jnp.int32)
    for _ in range(n_rounds):
        labels = jnp.min(jnp.where(adj, labels[None, :], K), axis=1)
        labels = labels[labels]  # pointer jump

    is_rep = (labels == jnp.arange(K)) & validb
    w = det.response * det.valid

    def seg(x):
        return jax.ops.segment_sum(x, labels, K)

    sw = jnp.maximum(seg(w), 1e-6)
    # group centroid and second moments over member endpoints (each endpoint
    # weighted by half the member response)
    epw = 0.5 * w[:, None]
    ex = seg(jnp.sum(det.endpoints[..., 0] * epw, axis=1)) / sw
    ey = seg(jnp.sum(det.endpoints[..., 1] * epw, axis=1)) / sw
    exx = seg(jnp.sum(det.endpoints[..., 0] ** 2 * epw, axis=1)) / sw - ex * ex
    eyy = seg(jnp.sum(det.endpoints[..., 1] ** 2 * epw, axis=1)) / sw - ey * ey
    exy = (
        seg(jnp.sum(det.endpoints[..., 0] * det.endpoints[..., 1] * epw, axis=1)) / sw
        - ex * ey
    )
    tr = exx + eyy
    dt = exx * eyy - exy * exy
    lam1 = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - dt, 0.0))
    e1 = jnp.stack([exy, lam1 - exx], axis=-1)
    e2 = jnp.stack([lam1 - eyy, exy], axis=-1)
    ev = jnp.where(
        (jnp.linalg.norm(e1, axis=-1) > jnp.linalg.norm(e2, axis=-1))[:, None], e1, e2
    )
    ev = ev / jnp.maximum(jnp.linalg.norm(ev, axis=-1, keepdims=True), 1e-9)

    # member-endpoint extent along the group direction
    gd = ev[labels]  # (K, 2) group direction per member
    gc = jnp.stack([ex, ey], axis=-1)[labels]
    t_ep = jnp.sum((det.endpoints - gc[:, None, :]) * gd[:, None, :], axis=-1)  # (K, 2)
    t_lo = jnp.min(jnp.where(validb[:, None], t_ep, jnp.inf), axis=1)
    t_hi = jnp.max(jnp.where(validb[:, None], t_ep, -jnp.inf), axis=1)
    g_lo = jax.ops.segment_min(t_lo, labels, K)
    g_hi = jax.ops.segment_max(t_hi, labels, K)
    g_lo = jnp.where(jnp.isfinite(g_lo), g_lo, 0.0)
    g_hi = jnp.where(jnp.isfinite(g_hi), g_hi, 0.0)

    c = jnp.stack([ex, ey], axis=-1)
    new_p0 = c + g_lo[:, None] * ev
    new_p1 = c + g_hi[:, None] * ev
    new_resp = seg(w)
    new_width = seg(w * det.width) / sw
    new_len = g_hi - g_lo
    return DetectedLines(
        endpoints=jnp.stack([new_p0, new_p1], axis=1),
        valid=is_rep.astype(jnp.float32),
        response=new_resp,
        angle=jnp.arctan2(ev[:, 1], ev[:, 0]),
        width=new_width,
        midpoint=c + 0.5 * (g_lo + g_hi)[:, None] * ev,
        length=new_len,
    )
