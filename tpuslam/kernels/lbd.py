"""Line Band Descriptor (LBD) as a batched gather+reduce XLA program.

SURVEY §5 'LBD': for each segment, a line-support region of ``m`` bands x
width ``w`` aligned to the segment; per band, Gaussian-weighted sums of the
gradient projected onto the local (d_parallel, d_orthogonal) frame, split by
sign into 4 directional channels; descriptor = per-band (mean, std) of the 4
channels -> ``8 * m`` floats (72 for m=9), L2-normalized; binarized by a
fixed pairwise-comparison pattern into 256 bits for MXU/Hamming matching.

No cv2 oracle exists in this environment (SURVEY §6.2) — validated by
invariance/matching property tests against the paper spec.

Batched over a fixed segment capacity K; invalid segments produce zero
descriptors. All sampling is bilinear gather on the gradient images —
vectorized, fixed-shape, fuses into one XLA program with detection.
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
    n_samples: int = 48  # samples along the segment per row
    n_bits: int = 256  # binarized descriptor length


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at float coords; zero outside."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, v, 0.0) * wgt

    return (
        tap(x0i, y0i, (1 - fx) * (1 - fy))
        + tap(x0i + 1, y0i, fx * (1 - fy))
        + tap(x0i, y0i + 1, (1 - fx) * fy)
        + tap(x0i + 1, y0i + 1, fx * fy)
    )


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
    m, w, S = params.n_bands, params.band_width, params.n_samples
    R = m * w  # total rows across the support region

    p0 = endpoints[:, 0]  # (K, 2)
    p1 = endpoints[:, 1]
    d = p1 - p0
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dL = d / jnp.maximum(length, 1e-6)  # parallel unit vector
    dO = jnp.stack([-dL[:, 1], dL[:, 0]], axis=-1)  # orthogonal

    # sample grid: rows r in [-(R-1)/2, (R-1)/2] along dO, S samples along dL
    r_off = jnp.arange(R, dtype=jnp.float32) - (R - 1) / 2.0  # (R,)
    s_frac = jnp.linspace(0.0, 1.0, S)  # (S,)

    # positions: (K, R, S, 2)
    base = p0[:, None, None, :] + s_frac[None, None, :, None] * d[:, None, None, :]
    pos = base + r_off[None, :, None, None] * dO[:, None, None, :]

    sgx = _bilinear(gx, pos[..., 0].reshape(-1), pos[..., 1].reshape(-1)).reshape(
        pos.shape[:-1]
    )
    sgy = _bilinear(gy, pos[..., 0].reshape(-1), pos[..., 1].reshape(-1)).reshape(
        pos.shape[:-1]
    )
    # gradient in the line frame
    gL = sgx * dL[:, None, None, 0] + sgy * dL[:, None, None, 1]
    gO = sgx * dO[:, None, None, 0] + sgy * dO[:, None, None, 1]

    # 4 directional channels, summed along the row (S samples)
    v1 = jnp.sum(jnp.maximum(gO, 0.0), axis=-1)  # (K, R)
    v2 = jnp.sum(jnp.maximum(-gO, 0.0), axis=-1)
    v3 = jnp.sum(jnp.maximum(gL, 0.0), axis=-1)
    v4 = jnp.sum(jnp.maximum(-gL, 0.0), axis=-1)
    rows = jnp.stack([v1, v2, v3, v4], axis=-1)  # (K, R, 4)

    # global Gaussian weight over rows (sigma = R/2 per the LBD paper)
    fg = jnp.exp(-0.5 * (r_off / (R / 2.0)) ** 2)  # (R,)
    rows = rows * fg[None, :, None]

    # per-band mean/std over the w rows of each band
    band_rows = rows.reshape(rows.shape[0], m, w, 4)
    mean = jnp.mean(band_rows, axis=2)  # (K, m, 4)
    std = jnp.std(band_rows, axis=2)  # (K, m, 4)
    desc = jnp.concatenate([mean, std], axis=-1).reshape(rows.shape[0], 8 * m)

    # L2 normalize mean-part and std-part separately (LBD practice), then
    # clamp outliers and renormalize jointly.
    def l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    mean_n = l2n(desc[:, : 4 * m])
    std_n = l2n(desc[:, 4 * m :])
    desc = jnp.concatenate([mean_n, std_n], axis=-1)
    desc = jnp.clip(desc, -0.4, 0.4)
    desc = l2n(desc)

    degenerate = (length[:, 0] < 1e-3)[:, None]
    desc = jnp.where(degenerate, 0.0, desc)

    # binarize with the fixed pair pattern, pack to uint32
    pairs = jnp.asarray(_pair_pattern(8 * m, params.n_bits))
    bits = (desc[:, pairs[:, 0]] > desc[:, pairs[:, 1]]).astype(jnp.uint32)  # (K, B)
    word_idx = jnp.arange(params.n_bits) // 32
    bit_idx = jnp.arange(params.n_bits) % 32
    words = jax.ops.segment_sum(
        (bits << bit_idx[None, :]).T, word_idx, params.n_bits // 32
    ).T.astype(jnp.uint32)  # (K, B/32)
    words = jnp.where(degenerate, jnp.uint32(0), words)
    return desc, words
