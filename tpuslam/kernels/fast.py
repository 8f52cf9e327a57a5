"""TPU-native FAST corner detector + patch-BRIEF point descriptor.

SURVEY §3.1 `MapPoint` / [P:6] hybrid point+line: the reference-class
systems detect ORB points (FAST + steered BRIEF) with a per-pixel serial
test and per-keypoint sampling loops. The TPU formulation is dense:

- FAST-9/16 segment test evaluated for EVERY pixel at once: the 16
  Bresenham-circle neighbors are 16 static shifts (contiguous, no gathers);
  brighter/darker comparisons bit-pack into a 16-bit ring per pixel, and
  the "≥9 contiguous" test is a log-doubling AND of shifted rings on the
  ring doubled to 32 bits — pure dense int ops.
- Score = max(sum of brighter-excesses, sum of darker-excesses) over the
  circle (the standard FAST V-score family), NMS = reduce_window max-pool
  equality, selection = one top_k over the masked score plane.
- Descriptor = BRIEF-256 on a contiguous PATCH x PATCH window per corner
  (ONE vmapped dynamic_slice — the gather-free restructure that took LBD
  from 147 ms to 3.5 ms, kernels/lbd.py), comparing fixed in-patch position
  pairs of the blurred intensity. Pairs are a fixed-seed pattern (part of
  the descriptor definition). Upright BRIEF: no orientation steering —
  inter-frame rotation in tracking is small, and the binarization pattern
  is shared by both frames; a documented deviation from ORB (the hybrid
  tests absorb it at trajectory level, SURVEY §9.4).

Axon rules honored throughout (PERF_NOTES.md): f32 {0,1} masks at jit
boundaries, additive penalties downstream (kernels/match.py is reused
unchanged for point matching), no data-dependent shapes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.kernels.image import gaussian_blur


class FASTParams(NamedTuple):
    threshold: float = 20.0  # intensity margin t on the 0..255 scale
    arc: int = 9  # contiguous circle arc length (FAST-9/16)
    nms_radius: int = 2  # non-max suppression window radius
    border: int = 17  # keep-out border (descriptor patch reach)
    blur_sigma: float = 2.0  # BRIEF smoothing sigma
    patch: int = 32  # descriptor window (PATCH x PATCH)
    n_bits: int = 256
    pair_radius: int = 13  # max |offset| of BRIEF test positions


class PointFeatures(NamedTuple):
    """Fixed-capacity per-frame corner features (level-0 pixel coords)."""

    uv: jnp.ndarray  # (K, 2) x, y
    valid: jnp.ndarray  # (K,) f32 {0, 1}
    response: jnp.ndarray  # (K,) FAST score
    desc_bits: jnp.ndarray  # (K, n_bits/32) uint32
    depth: jnp.ndarray  # (K,) metric depth, 0 = unknown (stereo fills)
    has_depth: jnp.ndarray  # (K,) f32 {0, 1}


# Bresenham circle of radius 3, in ring order (dy, dx)
_CIRCLE = [
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
]


def _brief_pairs(params: FASTParams) -> np.ndarray:
    """Fixed BRIEF pattern: (n_bits, 2) flat in-patch indices. Gaussian-
    distributed offsets (BRIEF-G II), fixed seed = descriptor definition."""
    rs = np.random.RandomState(7)
    P = params.patch
    c = P // 2
    sigma = params.pair_radius / 2.0
    pts = []
    while len(pts) < 2 * params.n_bits:
        o = rs.normal(0.0, sigma, 2)
        if np.max(np.abs(o)) <= params.pair_radius:
            y, x = int(round(c + o[0])), int(round(c + o[1]))
            if 0 <= y < P and 0 <= x < P:
                pts.append(y * P + x)
    a = np.asarray(pts[: params.n_bits], np.int32)
    b = np.asarray(pts[params.n_bits :], np.int32)
    same = a == b
    b = np.where(same, (b + P + 1) % (P * P), b)  # never compare a cell to itself
    return np.stack([a, b], axis=1)


def _shift(x: jnp.ndarray, dy: int, dx: int):
    """Static shift via roll; the border keep-out mask blocks wraparound."""
    return jnp.roll(x, (dy, dx), axis=(0, 1))


@partial(jax.jit, static_argnums=(1, 2))
def detect_corners(img: jnp.ndarray, max_points: int = 256, params: FASTParams = FASTParams()):
    """FAST-9 corners of an (H, W) grayscale f32 image in [0, 1].

    Returns PointFeatures with capacity ``max_points`` (mask-padded),
    depth/has_depth zeroed (stereo association fills them).
    """
    H, W = img.shape
    K = max_points
    I = img * 255.0
    t = params.threshold

    ring_b = jnp.zeros((H, W), jnp.int32)
    ring_d = jnp.zeros((H, W), jnp.int32)
    exc_b = jnp.zeros((H, W), jnp.float32)
    exc_d = jnp.zeros((H, W), jnp.float32)
    for i, (dy, dx) in enumerate(_CIRCLE):
        s = _shift(I, -dy, -dx)  # value at p + (dy, dx)
        ring_b = ring_b | ((s > I + t).astype(jnp.int32) << i)
        ring_d = ring_d | ((s < I - t).astype(jnp.int32) << i)
        exc_b = exc_b + jnp.maximum(s - (I + t), 0.0)
        exc_d = exc_d + jnp.maximum((I - t) - s, 0.0)

    def has_run(ring: jnp.ndarray, n: int) -> jnp.ndarray:
        """f32 {0,1}: any >= n contiguous set bits on the 16-bit ring."""
        x = ring | (ring << 16)  # unwrap the ring into 32 bits
        run = 1
        while run * 2 <= n:
            x = x & (x >> run)
            run *= 2
        if run < n:
            x = x & (x >> (n - run))
        return ((x & 0xFFFF) != 0).astype(jnp.float32)

    cornerf = jnp.maximum(has_run(ring_b, params.arc), has_run(ring_d, params.arc))
    score = jnp.maximum(exc_b, exc_d) * cornerf

    # border keep-out (also blocks roll wraparound)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    bdr = params.border
    inside = (
        (yy >= bdr).astype(jnp.float32)
        * (yy < H - bdr).astype(jnp.float32)
        * (xx >= bdr).astype(jnp.float32)
        * (xx < W - bdr).astype(jnp.float32)
    )
    score = score * inside

    # NMS: keep pixels that equal their neighborhood max. Exact-tie
    # double-selection is resolved by a second max-pool over the flat index
    # of own-window maxima: two equal-score maxima within one window see
    # each other (symmetric radius), so only the higher index survives.
    # (A score dither cannot do this exactly in f32 — an index step small
    # enough to never reorder distinct scores is below the ULP of typical
    # score magnitudes, and a representable step biases near-ties.)
    r = params.nms_radius
    win = (2 * r + 1, 2 * r + 1)
    mx = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, win, (1, 1), "SAME")
    posf = (score > 0).astype(jnp.float32)
    is_max = (score >= mx).astype(jnp.float32) * posf
    idx_f = (yy * W + xx).astype(jnp.float32)  # exact in f32: H*W < 2^24
    g = jnp.where(is_max > 0, idx_f, -1.0)
    gmx = jax.lax.reduce_window(g, -jnp.inf, jax.lax.max, win, (1, 1), "SAME")
    keepf = is_max * (idx_f >= gmx).astype(jnp.float32)
    flat_score = (score * keepf).reshape(-1)

    top, idx = jax.lax.top_k(flat_score, K)
    ky, kx = jnp.divmod(idx, W)
    validf = (top > 0.0).astype(jnp.float32)

    # sub-pixel refinement: polarity-aware contrast centroid over a 7x7
    # window. Integer corner coords quantize stereo disparity (a few px at
    # SLAM working depths) into >10% depth error. Parabolic fits on the FAST
    # score/excess fields fail (plateau-shaped peaks); a plain |I - mean|
    # centroid fails when the feature fills half the window. The polarity of
    # the firing arc (darker vs brighter than the ring) selects the right
    # contrast measure: centroid of (local max - I) for dark features,
    # (I - local min) for bright — subpixel-exact for symmetric blobs, and a
    # VIEW-CONSISTENT bias for generic corners (identical left/right
    # appearance -> the bias cancels in disparity).
    RW = 3
    win = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(I, (y - RW, x - RW), (2 * RW + 1, 2 * RW + 1))
    )(jnp.maximum(ky, RW), jnp.maximum(kx, RW))  # (K, 7, 7)
    darkf = jax.vmap(lambda y, x: (exc_b[y, x] > exc_d[y, x]).astype(jnp.float32))(ky, kx)
    w_dark = jnp.max(win, axis=(1, 2), keepdims=True) - win
    w_bright = win - jnp.min(win, axis=(1, 2), keepdims=True)
    w = darkf[:, None, None] * w_dark + (1.0 - darkf)[:, None, None] * w_bright
    grid = jnp.arange(-RW, RW + 1, dtype=jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1e-6)
    dy = jnp.clip(jnp.sum(w * grid[None, :, None], axis=(1, 2)) / wsum, -1.0, 1.0)
    dx = jnp.clip(jnp.sum(w * grid[None, None, :], axis=(1, 2)) / wsum, -1.0, 1.0)
    uv = jnp.stack(
        [kx.astype(jnp.float32) + dx, ky.astype(jnp.float32) + dy], axis=-1
    )

    # ---- BRIEF on one contiguous patch per corner -------------------------
    S = gaussian_blur(I, params.blur_sigma)
    P = params.patch
    x0 = jnp.clip(kx - P // 2, 0, max(W - P, 0))
    y0 = jnp.clip(ky - P // 2, 0, max(H - P, 0))
    patches = jax.vmap(
        lambda yy0, xx0: jax.lax.dynamic_slice(S, (yy0, xx0), (P, P))
    )(y0, x0).reshape(K, P * P)

    pairs = _brief_pairs(params)  # host numpy; static indices lower to slices
    bits = (patches[:, pairs[:, 0]] < patches[:, pairs[:, 1]]).astype(jnp.uint32)
    word_idx = jnp.arange(params.n_bits) // 32
    bit_idx = jnp.arange(params.n_bits) % 32
    words = jax.ops.segment_sum(
        (bits << bit_idx[None, :]).T, word_idx, params.n_bits // 32
    ).T.astype(jnp.uint32)
    words = words * validf[:, None].astype(jnp.uint32)

    return PointFeatures(
        uv=uv * validf[:, None],
        valid=validf,
        response=top * validf,
        desc_bits=words,
        depth=jnp.zeros((K,), jnp.float32),
        has_depth=jnp.zeros((K,), jnp.float32),
    )
