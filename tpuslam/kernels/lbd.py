"""Line Band Descriptor (LBD-style) as dense patch pooling (SURVEY §5 'LBD').

The textbook LBD samples a rotated line-support region with per-sample
bilinear interpolation — on TPU that is millions of random gathers, which
Mosaic scalarizes (~150 ms/frame measured, PERF_NOTES.md). This
implementation restructures the computation to be gather-free except for
ONE contiguous `dynamic_slice` per segment:

1. slice a fixed PATCH x PATCH window centered on the segment midpoint
   (contiguous copy -> DMA-friendly),
2. express the band geometry densely: per-pixel parallel/perpendicular
   coordinates w.r.t. the line come from two dot products with the
   direction; band membership is a triangular soft-assignment matrix,
3. per-band statistics = batched matvecs over the flattened patch (MXU),
   giving Gaussian-weighted mean and std of the 4 directional gradient
   channels per band -> 8*m floats, L2-normalized, binarized by a fixed
   pairwise comparison pattern into 256 bits.

Descriptor semantics match LBD's structure (band gradient statistics in the
line frame); values differ from OpenCV's (no oracle exists in this
environment anyway — SURVEY §6.2); rotation/illumination invariance and
matching precision are property-tested. Segments longer than the patch are
described by their central PATCH-px extent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LBDParams(NamedTuple):
    n_bands: int = 9  # m
    band_width: int = 7  # w (rows per band)
    patch: int = 64  # sampling window (PATCH x PATCH) around the midpoint
    n_bits: int = 256  # binarized descriptor length


def _pair_pattern(n_floats: int, n_bits: int) -> np.ndarray:
    """Deterministic comparison pairs for binarization (fixed seed — part of
    the descriptor definition, identical across runs/platforms)."""
    rs = np.random.RandomState(42)
    pairs = []
    seen = set()
    while len(pairs) < n_bits:
        i, j = rs.randint(0, n_floats, 2)
        if i != j and (i, j) not in seen:
            seen.add((i, j))
            pairs.append((i, j))
    return np.asarray(pairs, np.int32)


@partial(jax.jit, static_argnums=(3,))
def lbd_descriptors(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    endpoints: jnp.ndarray,  # (K, 2, 2) [[x0,y0],[x1,y1]] px
    params: LBDParams = LBDParams(),
):
    """Compute float + binary LBD descriptors for K segments.

    Returns (desc_float (K, 8*m) L2-normalized, desc_bits (K, n_bits/32)
    uint32). Degenerate (zero-length / padded) segments yield zeros.
    """
    m, w, P = params.n_bands, params.band_width, params.patch
    H, W = gx.shape
    K = endpoints.shape[0]

    p0 = endpoints[:, 0]
    p1 = endpoints[:, 1]
    d = p1 - p0
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dL = d / jnp.maximum(length, 1e-6)  # parallel unit vector
    dO = jnp.stack([-dL[:, 1], dL[:, 0]], axis=-1)  # orthogonal
    mid = 0.5 * (p0 + p1)

    # one contiguous patch per segment (corner clipped inside the image)
    cx = jnp.clip(jnp.round(mid[:, 0]).astype(jnp.int32) - P // 2, 0, max(W - P, 0))
    cy = jnp.clip(jnp.round(mid[:, 1]).astype(jnp.int32) - P // 2, 0, max(H - P, 0))

    def patch_of(im, x0, y0):
        return jax.lax.dynamic_slice(im, (y0, x0), (P, P))

    pgx = jax.vmap(patch_of, in_axes=(None, 0, 0))(gx, cx, cy)  # (K, P, P)
    pgy = jax.vmap(patch_of, in_axes=(None, 0, 0))(gy, cx, cy)

    # per-pixel line-frame coordinates (dense)
    yy = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1).astype(jnp.float32)
    ax = xx[None] + cx[:, None, None].astype(jnp.float32) - mid[:, 0, None, None]
    ay = yy[None] + cy[:, None, None].astype(jnp.float32) - mid[:, 1, None, None]
    t = ax * dL[:, 0, None, None] + ay * dL[:, 1, None, None]  # parallel coord
    n = ax * dO[:, 0, None, None] + ay * dO[:, 1, None, None]  # perpendicular

    # gradient in the line frame
    gL = pgx * dL[:, 0, None, None] + pgy * dL[:, 1, None, None]
    gO = pgx * dO[:, 0, None, None] + pgy * dO[:, 1, None, None]
    ch = jnp.stack(
        [
            jnp.maximum(gO, 0.0),
            jnp.maximum(-gO, 0.0),
            jnp.maximum(gL, 0.0),
            jnp.maximum(-gL, 0.0),
        ],
        axis=-1,
    )  # (K, P, P, 4)

    # sample weight: global Gaussian across the support region (sigma = R/2,
    # R = m*w rows as in the LBD paper) x parallel-extent mask (soft edge)
    R = m * w
    half_len = jnp.minimum(0.5 * length[:, 0], P / 2.0 - 1.0)[:, None, None]
    fg = jnp.exp(-0.5 * (n / (R / 2.0)) ** 2)
    in_len = jnp.clip(half_len + 1.0 - jnp.abs(t), 0.0, 1.0)
    wgt = fg * in_len  # (K, P, P)

    # triangular soft band assignment over the perpendicular coordinate
    band_centers = (jnp.arange(m, dtype=jnp.float32) - (m - 1) / 2.0) * w  # (m,)
    a = jnp.clip(
        1.0 - jnp.abs((n[..., None] - band_centers) / w), 0.0, 1.0
    )  # (K, P, P, m)

    flat_ch = (ch * wgt[..., None]).reshape(K, P * P, 4)
    flat_ch2 = (ch * ch * wgt[..., None]).reshape(K, P * P, 4)
    flat_a = a.reshape(K, P * P, m)
    flat_w = wgt.reshape(K, P * P)

    # per-band weighted sums via batched matmuls (MXU)
    s1 = jnp.einsum("kpc,kpm->kmc", flat_ch, flat_a)  # (K, m, 4)
    s2 = jnp.einsum("kpc,kpm->kmc", flat_ch2, flat_a)
    s0 = jnp.einsum("kp,kpm->km", flat_w, flat_a)[..., None]  # (K, m, 1)
    mean = s1 / jnp.maximum(s0, 1e-6)
    var = jnp.maximum(s2 / jnp.maximum(s0, 1e-6) - mean * mean, 0.0)
    std = jnp.sqrt(var)
    desc = jnp.concatenate([mean, std], axis=-1).reshape(K, 8 * m)

    # L2 normalize mean-part and std-part separately (LBD practice), then
    # clamp outliers and renormalize jointly.
    def l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    mean_n = l2n(desc[:, : 4 * m])
    std_n = l2n(desc[:, 4 * m :])
    desc = jnp.concatenate([mean_n, std_n], axis=-1)
    desc = jnp.clip(desc, -0.4, 0.4)
    desc = l2n(desc)

    degeneratef = (length[:, 0] >= 1e-3).astype(jnp.float32)[:, None]
    desc = desc * degeneratef

    # binarize with the fixed pair pattern, pack to uint32
    pairs = jnp.asarray(_pair_pattern(8 * m, params.n_bits))
    bits = (desc[:, pairs[:, 0]] > desc[:, pairs[:, 1]]).astype(jnp.uint32)  # (K, B)
    word_idx = jnp.arange(params.n_bits) // 32
    bit_idx = jnp.arange(params.n_bits) % 32
    words = jax.ops.segment_sum(
        (bits << bit_idx[None, :]).T, word_idx, params.n_bits // 32
    ).T.astype(jnp.uint32)  # (K, B/32)
    words = words * degeneratef.astype(jnp.uint32)
    return desc, words
