"""TPU-native LSD-style line segment detector (SURVEY §2 L1, §5 'LSD').

The reference wraps OpenCV's sequential region-growing LSD. Region growing is
inherently serial, so this is a data-parallel reformulation (SURVEY §9.4
risk 1) with the same ingredients — level-line angle field, 22.5 deg angular
tolerance, magnitude threshold rho = q / sin(tol), rectangle fit by weighted
moments, density validation — but grown via *connected-component labeling*:

1. gradient magnitude + level-line angle per pixel (kernels/image.py)
2. support mask: mag > rho
3. connectivity: 8-neighbors whose level-line angles agree within tol
4. labels = min-label flood: R rounds of 3x3 masked min-propagation — PURE
   dense vector ops, no pointer-jump gathers (random gathers scalarize to
   ~12 ns/element on this backend, PERF_NOTES.md). A max-label channel is
   propagated with the same masks; at a component root the (min,max) pixel
   pair spans the component, giving a selection key without any per-label
   reduction. Components longer than the propagation reach fragment; the
   segment-level collinear merge re-joins them.
5. top-K roots by spanned-diagonal length (a line-appropriate criterion),
   via one top_k over the dense root-key image — no N-bin segment_sum
   (a 307k-bin scatter costs ~45 ms on this backend; the compare-reduce
   below costs ~2 ms)
6. per-component weighted moments, extents along the principal direction,
   and normal second moment via FUSED compare-reduce over the (K, N)
   virtual one-hot (XLA fuses the label==root compare into the reductions;
   nothing K x N ever hits HBM)
7. validation: support count, length, density (count / (length * width)) —
   the a-contrario NFA test collapses to these geometric criteria here
   (detector differences are absorbed at trajectory level, SURVEY §9.4)

Outputs fixed-capacity arrays: (K, 2, 2) endpoints + masks. Oracle for
tests: cv2.createLineSegmentDetector (SURVEY §6.2). The propagation loop
has a strip-tiled Pallas twin (kernels/pallas_ccl.py, `ccl="pallas"`);
XLA is the default — see `_use_pallas_ccl` for the measured tradeoff.
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
    ccl_rounds: int = 64  # min/max-propagation rounds = base geodesic reach
    ccl_jumps: int = 1  # pointer-jump rounds after propagation; each roughly
    # doubles the converged reach (64 -> ~128-192 px). Jumps are the only
    # gathers in the detector at ~2.5 ms each on-chip (rounds cost ~0.02 ms
    # each), so fragments beyond the reach are cheaper to re-join in the
    # segment-level collinear merge than to label globally: oracle recall is
    # flat from 3 jumps down to 1 (0.65 vs 0.66) and drops only at 0. Raise
    # for very long structural lines (KITTI) if merge quality degrades.
    prefilter_sigma: float = 0.75  # LSD's 0.6/0.8 pre-smoothing (0 = off);
    # without it, anti-aliased near-axis lines fragment at stair-steps
    merge_fragments: bool = True  # collinear post-merge (junction splits)
    ccl: str = "auto"  # 'auto' | 'pallas' | 'xla': propagation-loop backend
    # (identical math; pallas keeps all rounds VMEM-resident on TPU)


class DetectedLines(NamedTuple):
    endpoints: jnp.ndarray  # (K, 2, 2) [[x0,y0],[x1,y1]] in px
    valid: jnp.ndarray  # (K,) f32 {0,1} (f32: crosses jit boundaries)
    response: jnp.ndarray  # (K,) support pixel count
    angle: jnp.ndarray  # (K,) segment direction angle
    width: jnp.ndarray  # (K,) rectangle width
    midpoint: jnp.ndarray  # (K, 2)
    length: jnp.ndarray  # (K,)


def _shift(x: jnp.ndarray, dy: int, dx: int):
    """Shift a 2D array by (dy, dx). Uses roll; wrap-around artifacts are
    blocked by the 1px zero-magnitude border from image_gradients (border
    pixels are never in the support mask, so masked compat kills them)."""
    return jnp.roll(x, (dy, dx), axis=(0, 1))


def _ccl_xla(labels: jnp.ndarray, maxlab: jnp.ndarray, compat_bits: jnp.ndarray, rounds: int):
    """R rounds of masked min/max-label propagation (XLA scan twin of the
    Pallas kernel; identical math, used on CPU and as fallback)."""
    H, W = labels.shape
    BIG = jnp.int32(H * W)

    def body(carry, _):
        lab, mx = carry
        lm, mm = lab, mx
        for d, (dy, dx) in enumerate(_OFFSETS):
            ok = (compat_bits >> d) & 1
            lm = jnp.minimum(lm, jnp.where(ok > 0, _shift(lab, dy, dx), BIG))
            mm = jnp.maximum(mm, jnp.where(ok > 0, _shift(mx, dy, dx), jnp.int32(-1)))
        return (lm, mm), None

    (labels, maxlab), _ = jax.lax.scan(body, (labels, maxlab), None, length=rounds)
    return labels, maxlab


_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _use_pallas_ccl(params: LSDParams) -> bool:
    if params.ccl == "pallas":
        return True
    if params.ccl == "xla":
        return False
    # 'auto' = XLA everywhere — FINAL measured verdict (benchmarks/
    # probe_ccl.py on the chip, 2026-08-17, parity OK at every size):
    #   half-VGA 320x240:  XLA 3.70 ms  vs Pallas  8.24 ms  (Pallas 2.2x slower)
    #   VGA 640x480:       XLA 11.63 ms vs Pallas 32.20 ms  (Pallas 2.8x slower)
    #   KITTI 1248x376:    XLA 23.86 ms vs Pallas 51.23 ms (strip=48 to fit
    #                      the 16 MB scoped-VMEM limit; deeper halo redundancy)
    # Why: the propagation loop is copy/compute-bound with a tiny working
    # set per round; XLA's fused scan already keeps it on-chip, while the
    # strip kernel re-reads a 2R-row halo per strip (R=64 -> 128 halo rows
    # vs 96 payload rows, >2x redundant work — worse at smaller strips).
    # The regime where strip-residency could win (R large enough that halo
    # amortizes, image too big for XLA fusion) does not occur at any
    # production resolution. The kernel stays parity-tested
    # (tests/test_pallas.py) as the documented reference implementation.
    return False


@partial(jax.jit, static_argnums=(1, 2))
def detect_lines(img: jnp.ndarray, max_lines: int = 256, params: LSDParams = LSDParams()):
    """Detect line segments in an (H, W) grayscale f32 image in [0, 1].

    Returns DetectedLines with capacity ``max_lines`` (mask-padded).
    """
    H, W = img.shape
    N = H * W
    K = max_lines
    if params.prefilter_sigma > 0:
        img = gaussian_blur(img, params.prefilter_sigma)
    gx, gy, mag, _ = image_gradients(img * 255.0)  # LSD thresholds on 0..255

    rho = params.quant / math.sin(params.angle_tol)
    support = mag > rho

    # --- neighbor compatibility as one bit-packed i32 plane ----------------
    # angle agreement via the gradient dot product, NOT angle differences:
    # dot(u, u') > cos(tol) |u||u'|  <=>  |Δangle| < tol  (identical math for
    # support pixels, which have mag > 0), and it lets XLA dead-code-
    # eliminate the dense arctan2 plane — a 307k-pixel transcendental on the
    # per-frame path.
    cos_tol = math.cos(params.angle_tol)
    compat_bits = jnp.zeros((H, W), jnp.int32)
    for d, (dy, dx) in enumerate(_OFFSETS):
        dots = gx * _shift(gx, dy, dx) + gy * _shift(gy, dy, dx)
        ok = (
            support
            & _shift(support, dy, dx)
            & (dots > cos_tol * mag * _shift(mag, dy, dx))
        )
        compat_bits = compat_bits | (ok.astype(jnp.int32) << d)

    # --- connected components: min/max-label propagation + pointer jumps ---
    # CCL reach must track the image scale: jumps roughly double the
    # converged reach, and structural lines grow with image width (KITTI's
    # 1241-px frames carry 300-500 px lines that fragment beyond repair at
    # VGA-tuned reach — the collinear merge re-joins short-range fragments
    # but cannot bridge many-piece splits). Shape is static under jit, so
    # this costs nothing at VGA.
    jumps = params.ccl_jumps if W <= 768 else max(params.ccl_jumps, 3)
    idx = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    BIG = jnp.int32(N)
    labels0 = jnp.where(support, idx, BIG)
    maxlab0 = jnp.where(support, idx, jnp.int32(-1))
    if _use_pallas_ccl(params):
        from tpuslam.kernels.pallas_ccl import ccl_propagate_pallas

        labels, maxlab = ccl_propagate_pallas(labels0, maxlab0, compat_bits, params.ccl_rounds)
    else:
        labels, maxlab = _ccl_xla(labels0, maxlab0, compat_bits, params.ccl_rounds)
    # Chain collapse: without jumps a component longer than the propagation
    # reach is keyed by NON-ROOT interior window-minima, and those groups are
    # invisible to root-based selection. Each jump composes the reach
    # (~doubles it); the single propagate between jumps reconnects stragglers.
    for _ in range(jumps):
        lf = labels.reshape(-1)
        lut = jnp.append(lf, BIG)
        labels = jnp.minimum(lut[jnp.minimum(lf, N)], lf).reshape(H, W)
        m = labels
        for d, (dy, dx) in enumerate(_OFFSETS):
            ok = (compat_bits >> d) & 1
            m = jnp.minimum(m, jnp.where(ok > 0, _shift(labels, dy, dx), BIG))
        labels = m

    flat_labels = labels.reshape(-1)  # BIG (=N) marks non-support

    # --- top-K roots by spanned diagonal (no per-label reduction) ---------
    ys_i, xs_i = jnp.divmod(jnp.arange(N, dtype=jnp.int32), W)
    xs = xs_i.astype(jnp.float32)
    ys = ys_i.astype(jnp.float32)
    my, mx_ = jnp.divmod(jnp.maximum(maxlab.reshape(-1), 0), W)
    span = jnp.hypot(
        (mx_ - xs_i).astype(jnp.float32), (my - ys_i).astype(jnp.float32)
    )
    is_root = (flat_labels == jnp.arange(N, dtype=jnp.int32)) & support.reshape(-1)
    key = jnp.where(is_root, span + 1.0, 0.0)
    _, comp_ids = jax.lax.top_k(key, K)  # (K,) root pixel indices

    # --- per-component moments via fused compare-reduce -------------------
    # eq is a virtual (K, N) one-hot; XLA fuses the compare into each
    # reduction, so no K x N intermediate is materialized.
    w = jnp.where(support.reshape(-1), mag.reshape(-1), 0.0)
    eq = flat_labels[None, :] == comp_ids[:, None]  # (K, N) virtual
    eqf = eq.astype(jnp.float32)

    def red(v):  # (N,) -> (K,)
        return jnp.sum(eqf * v[None, :], axis=1)

    count = red(support.reshape(-1).astype(jnp.float32))
    csw = jnp.maximum(red(w), 1e-6)
    cx = red(w * xs) / csw
    cy = red(w * ys) / csw
    mxx = red(w * xs * xs) / csw - cx * cx
    myy = red(w * ys * ys) / csw - cy * cy
    mxy = red(w * xs * ys) / csw - cx * cy
    resp = count

    # principal direction of the 2x2 moment matrix (largest eigenvector)
    tr = mxx + myy
    det = mxx * myy - mxy * mxy
    lam1 = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    e1 = jnp.stack([mxy, lam1 - mxx], axis=-1)
    e2 = jnp.stack([lam1 - myy, mxy], axis=-1)
    use_e1 = jnp.linalg.norm(e1, axis=-1) > jnp.linalg.norm(e2, axis=-1)
    ev = jnp.where(use_e1[:, None], e1, e2)
    ev = ev / jnp.maximum(jnp.linalg.norm(ev, axis=-1, keepdims=True), 1e-9)

    # --- extents along the principal direction (same fused pattern) -------
    relx = xs[None, :] - cx[:, None]  # (K, N) virtual
    rely = ys[None, :] - cy[:, None]
    t_kn = relx * ev[:, 0:1] + rely * ev[:, 1:2]
    tn_kn = -relx * ev[:, 1:2] + rely * ev[:, 0:1]
    pen = jnp.where(eq, 0.0, jnp.float32(1e9))
    t_min = jnp.min(t_kn + pen, axis=1)
    t_max = jnp.max(t_kn - pen, axis=1)
    sn2 = jnp.sum(jnp.where(eq, w[None, :] * tn_kn * tn_kn, 0.0), axis=1)
    # weighted variance normal to the line; full width of a uniform strip is
    # sqrt(12 * var) = 2 * sqrt(3 * var)
    width = 2.0 * jnp.sqrt(3.0 * jnp.maximum(sn2 / csw, 1e-9))

    empty = count < 0.5
    t_min = jnp.where(empty, 0.0, t_min)
    t_max = jnp.where(empty, 0.0, t_max)
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
