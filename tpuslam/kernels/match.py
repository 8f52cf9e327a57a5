"""Descriptor matching lowered to MXU matmuls + masked top-k (SURVEY §2 L2).

The reference's matcher is a per-feature loop over Hamming distances with
geometric gates (`LineMatcher::SearchByDescriptor/SearchByProjection`). The
TPU formulation is dense and batched:

- Binary LBD descriptors are bit-packed uint32 words. Hamming distance for
  *all pairs at once* lowers to a +-1 matmul on the MXU:

      d_H(a, b) = (n_bits - <s_a, s_b>) / 2,   s = 2*bit - 1 in {-1, +1}

  One (KA, B) x (B, KB) matmul replaces KA*KB popcount loops. A popcount
  XOR route is kept as the test oracle (`hamming_distance_matrix`).
- Geometric gates are **additive f32 penalties**, not boolean masks: on the
  axon Mosaic backend a `jnp.where(bool_matrix, ...)` feeding a reduction
  or sort scalarizes catastrophically (ms-scale dispatches, minutes-long
  compiles that fall back to the remote compile service). Penalties keep
  every op a dense f32 VPU op: gate(x) = max(violation, 0) * BIG.
- Best/second-best selection is `top_k(2)` on the penalized matrix; the
  mutual check is a column argmin + vector gather (vector-level selects and
  gathers are cheap; matrix-level ones are not).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Python-float scales, NOT jnp scalars: module-level jnp constants are
# device arrays created eagerly at import and embedded per-program — plain
# floats lower as HLO literals with zero device interaction.
INF = 1e9
_PEN = 1e6  # generic gate penalty scale (>> any Hamming dist)


def unpack_bits(words: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """(K, W) uint32 -> (K, n_bits) float32 in {0, 1} (bit i of word i//32)."""
    bit_idx = jnp.arange(n_bits, dtype=jnp.uint32)
    w = words[:, bit_idx // 32]  # (K, n_bits)
    return ((w >> (bit_idx % 32)) & 1).astype(jnp.float32)


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Vectorized 32-bit popcount (SWAR); int32 result."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance via XOR+popcount. (KA, W) x (KB, W) -> (KA, KB).

    Reference semantics oracle; the MXU path below is the production route.
    """
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(popcount_u32(x), axis=-1)


def hamming_distance_mxu(a: jnp.ndarray, b: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """All-pairs Hamming distance as a +-1 matmul on the MXU (f32 accum)."""
    sa = unpack_bits(a, n_bits) * 2.0 - 1.0  # (KA, B)
    sb = unpack_bits(b, n_bits) * 2.0 - 1.0  # (KB, B)
    dot = jax.lax.dot_general(
        sa,
        sb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return 0.5 * (n_bits - dot)


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (KA,) int32 best match in B, -1 if none
    dist: jnp.ndarray  # (KA,) float32 best distance (INF if none)
    valid: jnp.ndarray  # (KA,) f32 {0, 1} (f32 so it can feed further jits)


class MatchParams(NamedTuple):
    max_dist: float = 96.0  # absolute Hamming threshold (of n_bits)
    ratio: float = 0.85  # best/second-best Lowe ratio
    mutual: bool = True
    n_bits: int = 256


def _as_f32(v: jnp.ndarray) -> jnp.ndarray:
    return v if v.dtype == jnp.float32 else v.astype(jnp.float32)


def _select_from_penalized(Dg: jnp.ndarray, params: MatchParams) -> MatchResult:
    """Best+ratio(+mutual) selection on an additively-penalized matrix."""
    KA = Dg.shape[0]
    neg2, idx2 = jax.lax.top_k(-Dg, 2)  # (KA, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    best_j = idx2[:, 0]
    okf = _as_f32(best <= params.max_dist) * _as_f32(best <= params.ratio * second)
    if params.mutual:
        best_i = jnp.argmin(Dg, axis=0)  # (KB,)
        okf = okf * _as_f32(best_i[best_j] == jnp.arange(KA))
    oki = okf.astype(jnp.int32)
    return MatchResult(
        idx=best_j * oki - (1 - oki),
        dist=best + (1.0 - okf) * INF,
        valid=okf,
    )


def _match_body(bits_a, valid_a, bits_b, valid_b, gate_penalty, params) -> MatchResult:
    D = hamming_distance_mxu(bits_a, bits_b, params.n_bits)
    D = D + (1.0 - _as_f32(valid_a))[:, None] * _PEN + (1.0 - _as_f32(valid_b))[None, :] * _PEN
    if gate_penalty is not None:
        D = D + gate_penalty
    return _select_from_penalized(D, params)


@partial(jax.jit, static_argnums=(5,))
def _match_jit(bits_a, valid_a, bits_b, valid_b, gate_penalty, params) -> MatchResult:
    return _match_body(bits_a, valid_a, bits_b, valid_b, gate_penalty, params)


@partial(jax.jit, static_argnums=(4,))
def _match_jit_nogate(bits_a, valid_a, bits_b, valid_b, params) -> MatchResult:
    return _match_body(bits_a, valid_a, bits_b, valid_b, None, params)


def match_descriptors(
    bits_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    bits_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    params: MatchParams = MatchParams(),
    gate_penalty: jnp.ndarray | None = None,
) -> MatchResult:
    """Mutual-best descriptor matching A->B with validity + optional gates.

    gate_penalty: optional (KA, KB) f32 — 0 where the pair is geometrically
    admissible, >> max_dist where not (see the *_penalty helpers).

    This is its OWN jit boundary by design: on the axon Mosaic backend,
    fusing the gate-penalty construction (vector -> matrix broadcasts) into
    the same program as the matmul+top_k selection triggers a pathological
    compile; as separate small programs both sides compile locally in <1 s
    and dispatch in ~0.05 ms. Callers should hand in penalty matrices built
    by separately-jitted gate builders (see frontend/frame.py).
    """
    if gate_penalty is not None:
        return _match_jit(bits_a, _as_f32(valid_a), bits_b, _as_f32(valid_b), gate_penalty, params)
    return _match_jit_nogate(bits_a, _as_f32(valid_a), bits_b, _as_f32(valid_b), params)


def angle_penalty(angles_a: jnp.ndarray, angles_b: jnp.ndarray, tol: float) -> jnp.ndarray:
    """(KA,), (KB,) segment angles -> (KA, KB) f32 penalty, 0 iff
    |diff| mod pi < tol (lines are direction-ambiguous)."""
    d = jnp.abs(angles_a[:, None] - angles_b[None, :]) % jnp.pi
    d = jnp.minimum(d, jnp.pi - d)
    return jnp.maximum(d - tol, 0.0) * _PEN


def length_ratio_penalty(len_a: jnp.ndarray, len_b: jnp.ndarray, min_ratio: float) -> jnp.ndarray:
    """(KA,), (KB,) -> (KA, KB) f32, 0 iff min/max length ratio > threshold."""
    la = len_a[:, None]
    lb = len_b[None, :]
    r = jnp.minimum(la, lb) / jnp.maximum(jnp.maximum(la, lb), 1e-6)
    return jnp.maximum(min_ratio - r, 0.0) * _PEN


def midpoint_radius_penalty(
    mid_a: jnp.ndarray, mid_b: jnp.ndarray, radius: float
) -> jnp.ndarray:
    """(KA, 2), (KB, 2) midpoints -> (KA, KB) f32, 0 iff within radius."""
    d2 = jnp.sum((mid_a[:, None, :] - mid_b[None, :, :]) ** 2, axis=-1)
    return jnp.maximum(d2 - radius * radius, 0.0) * 1e3


@jax.jit
def epipolar_penalty(
    uv_a: jnp.ndarray, uv_b: jnp.ndarray, F: jnp.ndarray, tol_px: jnp.ndarray
) -> jnp.ndarray:
    """(KA, 2), (KB, 2) pixel coords, F (3, 3) fundamental (A -> B lines):
    (KA, KB) f32 additive penalty, 0 iff uv_b lies within tol_px of the
    epipolar line l = F [uv_a; 1]. Two-view point-triangulation gate
    (SURVEY §4.3 SearchForTriangulation, point analog). Separately jitted
    per the repo's gate-builder rule (see match_descriptors docstring)."""
    ah = jnp.concatenate([uv_a, jnp.ones((uv_a.shape[0], 1), jnp.float32)], -1)
    l = ah @ F.T.astype(jnp.float32)  # (KA, 3) epipolar lines in image B
    den = jnp.maximum(jnp.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2), 1e-9)
    bh = jnp.concatenate([uv_b, jnp.ones((uv_b.shape[0], 1), jnp.float32)], -1)
    d = jnp.abs(l @ bh.T) / den[:, None]
    return jnp.maximum(d - tol_px, 0.0) * _PEN


def stereo_row_penalty(
    mid_a: jnp.ndarray,
    mid_b: jnp.ndarray,
    max_dy: float,
    min_disp: float,
    max_disp: float,
) -> jnp.ndarray:
    """Rectified-stereo gate: same row band, positive bounded disparity.

    a = left features, b = right features; disparity = x_left - x_right.
    """
    dy = jnp.abs(mid_a[:, None, 1] - mid_b[None, :, 1])
    disp = mid_a[:, None, 0] - mid_b[None, :, 0]
    return (
        jnp.maximum(dy - max_dy, 0.0)
        + jnp.maximum(min_disp - disp, 0.0)
        + jnp.maximum(disp - max_disp, 0.0)
    ) * _PEN


# Boolean-gate aliases kept as reference oracles for tests (host-side only —
# do NOT feed these into jitted reductions; see module docstring).
def angle_gate(angles_a, angles_b, tol):
    d = jnp.abs(angles_a[:, None] - angles_b[None, :]) % jnp.pi
    d = jnp.minimum(d, jnp.pi - d)
    return d < tol


def length_ratio_gate(len_a, len_b, min_ratio):
    la = len_a[:, None]
    lb = len_b[None, :]
    r = jnp.minimum(la, lb) / jnp.maximum(jnp.maximum(la, lb), 1e-6)
    return r > min_ratio


def midpoint_radius_gate(mid_a, mid_b, radius):
    d2 = jnp.sum((mid_a[:, None, :] - mid_b[None, :, :]) ** 2, axis=-1)
    return d2 < radius * radius


def stereo_row_gate(mid_a, mid_b, max_dy, min_disp, max_disp):
    dy = jnp.abs(mid_a[:, None, 1] - mid_b[None, :, 1])
    disp = mid_a[:, None, 0] - mid_b[None, :, 0]
    return (dy < max_dy) & (disp > min_disp) & (disp < max_disp)


def match_topk_database(
    query_bits: jnp.ndarray,
    db_bits: jnp.ndarray,
    db_valid: jnp.ndarray,
    k: int,
    n_bits: int = 256,
):
    """Top-k nearest database descriptors per query (relocalization / loop
    shortlist). Returns (dist (Q, k), idx (Q, k)); masked rows get ~INF."""
    D = hamming_distance_mxu(query_bits, db_bits, n_bits)
    D = D + (1.0 - _as_f32(db_valid))[None, :] * _PEN
    neg_d, idx = jax.lax.top_k(-D, k)
    return -neg_d, idx
