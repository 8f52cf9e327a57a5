"""Pallas TPU kernels for the image front half (SURVEY §2 L1, B:5 'fused
Pallas kernels over tiled image pyramids').

Two kernels:
- `gradients_pallas`: fused central-difference gradient + magnitude +
  level-line angle in one VMEM pass (the XLA path materializes four
  separate HBM arrays; the fused kernel reads the image once).
- `blur_pallas`: separable Gaussian as two in-VMEM passes with a
  compile-time kernel width.

Both are drop-in replacements for kernels/image.py functions, gated by
``TPUSLAM_PALLAS=1`` (see `use_pallas()`): the Mosaic pipeline on the
current axon backend is experimental, so the XLA path stays the default.
VGA/KITTI images (<=2 MB f32) fit whole in VMEM (~16 MB), so the kernels
use a single grid step with full-array blocks; larger inputs would tile
rows with halo exchange.

Validated against the XLA implementations in tests/test_pallas.py (interpret
mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on non-TPU builds; interpret mode doesn't need it
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def use_pallas() -> bool:
    return os.environ.get("TPUSLAM_PALLAS", "0") == "1"


def _block_specs(n):
    if _VMEM is None:
        return [pl.BlockSpec()] * n
    return [pl.BlockSpec(memory_space=_VMEM)] * n


def _grad_kernel(img_ref, gx_ref, gy_ref, mag_ref):
    img = img_ref[:]
    H, W = img.shape
    z_col = jnp.zeros((H, 1), img.dtype)
    z_row = jnp.zeros((1, W), img.dtype)
    # central differences with zeroed 1px border (matches kernels/image.py)
    gx = 0.5 * (
        jnp.concatenate([img[:, 1:], z_col], axis=1)
        - jnp.concatenate([z_col, img[:, :-1]], axis=1)
    )
    gy = 0.5 * (
        jnp.concatenate([img[1:, :], z_row], axis=0)
        - jnp.concatenate([z_row, img[:-1, :]], axis=0)
    )
    # border mask without boolean selects: product of edge indicators
    # iota must be integer-typed on TPU; cast to f32 after
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    row_int = jnp.minimum(ii, 1.0) * jnp.minimum(H - 1.0 - ii, 1.0)
    col_int = jnp.minimum(jj, 1.0) * jnp.minimum(W - 1.0 - jj, 1.0)
    interior = row_int * col_int
    gx = gx * col_int  # zero at first/last column (central diff undefined)
    gy = gy * row_int
    gx_ref[:] = gx
    gy_ref[:] = gy
    mag_ref[:] = jnp.sqrt(gx * gx + gy * gy) * interior
    # NOTE: the level-line angle (atan2) is computed by the caller in XLA —
    # Mosaic has no atan2 lowering (KernelType.TC) as of jax 0.9


@functools.partial(jax.jit, static_argnames=("interpret",))
def gradients_pallas(img: jnp.ndarray, interpret: bool = False):
    """(H, W) f32 (0..255 scale) -> (gx, gy, mag, angle), fused in VMEM."""
    H, W = img.shape
    out = jax.ShapeDtypeStruct((H, W), img.dtype)
    gx, gy, mag = pl.pallas_call(
        _grad_kernel,
        out_shape=(out, out, out),
        in_specs=_block_specs(1),
        out_specs=tuple(_block_specs(3)),
        interpret=interpret,
    )(img)
    return gx, gy, mag, jnp.arctan2(gx, -gy)


def _blur_kernel(taps, img_ref, out_ref):
    img = img_ref[:]
    H, W = img.shape
    radius = len(taps) // 2

    def shift_rows(x, d):
        if d == 0:
            return x
        pad = jnp.zeros((abs(d), W), x.dtype)
        return (
            jnp.concatenate([pad, x[:-d, :]], axis=0)
            if d > 0
            else jnp.concatenate([x[-d:, :], pad], axis=0)
        )

    def shift_cols(x, d):
        if d == 0:
            return x
        pad = jnp.zeros((H, abs(d)), x.dtype)
        return (
            jnp.concatenate([pad, x[:, :-d]], axis=1)
            if d > 0
            else jnp.concatenate([x[:, -d:], pad], axis=1)
        )

    # replicate-edge normalization: accumulate weights actually applied so
    # borders renormalize (equivalent to edge padding for smooth images)
    row = jnp.zeros_like(img)
    wsum = jnp.zeros_like(img)
    ones = jnp.ones_like(img)
    for k, t in enumerate(taps):
        d = k - radius
        row = row + t * shift_cols(img, d)
        wsum = wsum + t * shift_cols(ones, d)
    row = row / wsum
    col = jnp.zeros_like(img)
    wsum = jnp.zeros_like(img)
    for k, t in enumerate(taps):
        d = k - radius
        col = col + t * shift_rows(row, d)
        wsum = wsum + t * shift_rows(ones, d)
    out_ref[:] = col / wsum


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def blur_pallas(img: jnp.ndarray, sigma: float, interpret: bool = False):
    """Separable Gaussian blur, fused in VMEM. Border: renormalized taps."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    xs = [k - radius for k in range(2 * radius + 1)]
    taps = [math.exp(-0.5 * (x / sigma) ** 2) for x in xs]
    s = sum(taps)
    taps = tuple(t / s for t in taps)
    return pl.pallas_call(
        functools.partial(_blur_kernel, taps),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        in_specs=_block_specs(1),
        out_specs=_block_specs(1)[0],
        interpret=interpret,
    )(img)
