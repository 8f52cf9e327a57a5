"""Image pyramid and gradient field (SURVEY §2 L1).

Replaces the reference's OpenCV pyramid/gradient stages. Pure XLA: separable
Gaussian blur as two depthwise convolutions + bilinear resize; gradients by
central differences (matching LSD's 2x2 scheme closely enough — the detector
downstream quantizes angles to a 22.5 deg tolerance).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _pallas_mode():
    """'' = off, 'compile' = Mosaic kernels, 'interpret' = interpreter."""
    import os

    v = os.environ.get("TPUSLAM_PALLAS", "0")
    return {"0": "", "1": "compile", "interpret": "interpret"}.get(v, "")


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of an (H, W) image; reflect padding."""
    mode = _pallas_mode()
    if mode:
        from tpuslam.kernels.pallas_image import blur_pallas

        return blur_pallas(img, sigma, interpret=(mode == "interpret"))
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gaussian_kernel1d(sigma, radius)
    # separable blur as two depthwise convs (one fused conv op each — the
    # per-row vmapped convolve variant lowers to hundreds of tiny ops)
    x = jnp.pad(img, ((radius, radius), (radius, radius)), mode="edge")
    x = x[None, None]  # (1, 1, H+2r, W+2r)
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID")
    return x[0, 0]


def pyramid_shapes(height: int, width: int, n_levels: int, scale: float = 0.8):
    """Static per-level shapes (fixed at trace time; SURVEY §9.4 item 2)."""
    shapes = [(height, width)]
    for _ in range(1, n_levels):
        h, w = shapes[-1]
        shapes.append((max(16, int(round(h * scale))), max(16, int(round(w * scale)))))
    return shapes


def build_pyramid(
    img: jnp.ndarray, n_levels: int = 2, scale: float = 0.8, blur_sigma: float = 0.6
):
    """(H, W) f32 image in [0, 1] -> list of per-level images (static shapes).

    LSD's canonical pre-filter: x0.8 downscale with a Gaussian of
    sigma = blur_sigma / scale applied before each resample.
    """
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, scale)
    levels = [img]
    cur = img
    for lvl in range(1, n_levels):
        blurred = gaussian_blur(cur, blur_sigma / scale)
        cur = jax.image.resize(blurred, shapes[lvl], method="linear")
        levels.append(cur)
    return levels


def image_gradients(img: jnp.ndarray):
    """Central-difference gradients of an (H, W) image.

    Returns (gx, gy, mag, angle) where ``angle`` is the level-line angle
    (orthogonal to the gradient): angle = atan2(gx, -gy), as in LSD.
    Border pixels get zero magnitude (never seeds nor members).
    """
    mode = _pallas_mode()
    if mode:
        from tpuslam.kernels.pallas_image import gradients_pallas

        return gradients_pallas(img, interpret=(mode == "interpret"))
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    gy = gy.at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # zero out a 1px border to keep the region-grower in bounds
    border = jnp.zeros_like(img).at[1:-1, 1:-1].set(1.0)
    mag = mag * border
    angle = jnp.arctan2(gx, -gy)
    return gx, gy, mag, angle
