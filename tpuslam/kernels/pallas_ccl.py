"""Pallas TPU kernel for the LSD connected-component propagation loop.

The XLA scan in kernels/lsd.py round-trips the label image through HBM every
round. This kernel runs all R rounds VMEM-resident.

Strip-tiled with an R-row halo: information travels at most one cell per
propagation round, so R rounds of the full-image recurrence restricted to a
strip plus R halo rows are BITWISE identical to the full-image result on the
strip's central rows. Each grid step therefore loads (strip + 2R) x W once,
does R rounds of pure VPU work, and writes its strip rows — the redundant
halo compute is the price of bounding the VMEM live set (a whole-frame VGA
variant exceeded the 16 MB scoped-vmem limit: Mosaic keeps the 8 shifted
neighbor temporaries live, ~18 MB at 480 x 640).

Math is IDENTICAL to lsd._ccl_xla (masked 8-neighbor min/max propagation on
a bit-packed compat plane); parity is asserted in tests/test_pallas.py via
interpret mode, and the strip/halo equivalence is tested against the XLA
twin at several strip sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on non-TPU builds; interpret mode doesn't need it
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _shift_fill(x: jnp.ndarray, dy: int, dx: int, fill):
    """Shift a 2D value by (dy, dx), filling vacated cells (no wraparound).

    Equivalent to jnp.roll for our use: the compat mask is always 0 at the
    image border (1px zero-magnitude frame), so filled/wrapped cells are
    never selected."""
    H, W = x.shape
    if dy > 0:
        x = jnp.concatenate([jnp.full((dy, W), fill, x.dtype), x[:-dy]], axis=0)
    elif dy < 0:
        x = jnp.concatenate([x[-dy:], jnp.full((-dy, W), fill, x.dtype)], axis=0)
    if dx > 0:
        x = jnp.concatenate([jnp.full((H, dx), fill, x.dtype), x[:, :-dx]], axis=1)
    elif dx < 0:
        x = jnp.concatenate([x[:, -dx:], jnp.full((H, -dx), fill, x.dtype)], axis=1)
    return x


def _ccl_kernel(lab_ref, mx_ref, cb_ref, lab_out, mx_out, *, rounds: int, big: int, strip: int):
    # Two sequential single-channel loops instead of one joint loop: halves
    # the peak VMEM live set; rounds are pure VPU time either way.
    cb = cb_ref[0]
    BIG = jnp.int32(big)
    NEG = jnp.int32(-1)
    R = rounds

    def lab_body(_, lab):
        lm = lab
        for d, (dy, dx) in enumerate(_OFFSETS):
            ok = ((cb >> d) & 1) > 0
            lm = jnp.minimum(lm, jnp.where(ok, _shift_fill(lab, dy, dx, BIG), BIG))
        return lm

    lab = jax.lax.fori_loop(0, rounds, lab_body, lab_ref[0])
    lab_out[0] = lab[R : R + strip]

    def mx_body(_, mx):
        mm = mx
        for d, (dy, dx) in enumerate(_OFFSETS):
            ok = ((cb >> d) & 1) > 0
            mm = jnp.maximum(mm, jnp.where(ok, _shift_fill(mx, dy, dx, NEG), NEG))
        return mm

    mx = jax.lax.fori_loop(0, rounds, mx_body, mx_ref[0])
    mx_out[0] = mx[R : R + strip]


def ccl_propagate_pallas(
    labels: jnp.ndarray,  # (H, W) i32, BIG sentinel at non-support pixels
    maxlab: jnp.ndarray,  # (H, W) i32, -1 sentinel
    compat_bits: jnp.ndarray,  # (H, W) i32, bit d = neighbor d compatible
    rounds: int,
    interpret: bool | None = None,
    strip: int | None = None,
):
    H, W = labels.shape
    R = rounds
    big = H * W
    if strip is None:
        # block VMEM ~ (strip + 2R) * W * 4 B * ~12 live arrays; at KITTI
        # width (1241+) strip=96 blows the 16 MB scoped-vmem limit (measured
        # 17.5 MB) — shrink the strip, the 2R halo dominates anyway
        strip = 96 if W <= 1024 else 48
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    n = -(-H // strip)
    Hp = n * strip

    def stack_strips(x, fill):
        xp = jnp.pad(x, ((R, Hp - H + R), (0, 0)), constant_values=fill)
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(xp, (s, 0), (strip + 2 * R, W))
        )(jnp.arange(n) * strip)

    labs = stack_strips(labels, big)
    mxs = stack_strips(maxlab, -1)
    cbs = stack_strips(compat_bits, 0)  # compat 0 blocks cross-halo flow

    block_in = pl.BlockSpec((1, strip + 2 * R, W), lambda i: (i, 0, 0))
    block_out = pl.BlockSpec((1, strip, W), lambda i: (i, 0, 0))
    kernel = functools.partial(_ccl_kernel, rounds=rounds, big=big, strip=strip)
    lab_o, mx_o = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=[
            jax.ShapeDtypeStruct((n, strip, W), jnp.int32),
            jax.ShapeDtypeStruct((n, strip, W), jnp.int32),
        ],
        in_specs=[block_in] * 3,
        out_specs=[block_out] * 2,
        interpret=interpret,
    )(labs, mxs, cbs)
    return lab_o.reshape(Hp, W)[:H], mx_o.reshape(Hp, W)[:H]
