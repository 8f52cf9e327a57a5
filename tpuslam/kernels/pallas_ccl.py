"""Pallas TPU kernel for the LSD connected-component propagation loop.

The XLA scan in kernels/lsd.py round-trips the label image through HBM every
round (~25 us/round measured). This kernel keeps labels, the max-label
channel, and the bit-packed compatibility masks VMEM-resident for all R
rounds — one HBM read + one write total — so rounds cost pure VPU time.

Math is IDENTICAL to lsd._ccl_xla (masked 8-neighbor min/max propagation on
a bit-packed compat plane); parity is asserted in tests/test_pallas.py via
interpret mode. VGA needs ~3.7 MB of VMEM (3 i32 planes); KITTI-resolution
(padded to 384x1280) ~5.9 MB — both fit the ~16 MB budget, so blocks are
whole arrays with a single grid step.
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


def _ccl_kernel(lab_ref, mx_ref, cb_ref, lab_out, mx_out, *, rounds: int, big: int):
    # Two sequential single-channel loops instead of one joint loop: halves
    # the peak VMEM live set (a joint loop at VGA exceeded the 16 MB scoped
    # vmem limit); rounds are pure VPU time either way.
    cb = cb_ref[:]
    BIG = jnp.int32(big)
    NEG = jnp.int32(-1)

    def lab_body(_, lab):
        lm = lab
        for d, (dy, dx) in enumerate(_OFFSETS):
            ok = ((cb >> d) & 1) > 0
            lm = jnp.minimum(lm, jnp.where(ok, _shift_fill(lab, dy, dx, BIG), BIG))
        return lm

    lab_out[:] = jax.lax.fori_loop(0, rounds, lab_body, lab_ref[:])

    def mx_body(_, mx):
        mm = mx
        for d, (dy, dx) in enumerate(_OFFSETS):
            ok = ((cb >> d) & 1) > 0
            mm = jnp.maximum(mm, jnp.where(ok, _shift_fill(mx, dy, dx, NEG), NEG))
        return mm

    mx_out[:] = jax.lax.fori_loop(0, rounds, mx_body, mx_ref[:])


def ccl_propagate_pallas(
    labels: jnp.ndarray,  # (H, W) i32, BIG sentinel at non-support pixels
    maxlab: jnp.ndarray,  # (H, W) i32, -1 sentinel
    compat_bits: jnp.ndarray,  # (H, W) i32, bit d = neighbor d compatible
    rounds: int,
    interpret: bool | None = None,
):
    H, W = labels.shape
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    specs = (
        [pl.BlockSpec(memory_space=_VMEM)] * 3 if _VMEM is not None and not interpret
        else [pl.BlockSpec()] * 3
    )
    out_specs = specs[:2]
    kernel = functools.partial(_ccl_kernel, rounds=rounds, big=H * W)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((H, W), jnp.int32),
        ],
        in_specs=specs,
        out_specs=out_specs,
        input_output_aliases={0: 0, 1: 1},  # reuse label/maxlab buffers
        interpret=interpret,
    )(labels, maxlab, compat_bits)
