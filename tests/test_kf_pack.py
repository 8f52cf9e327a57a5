"""PackedPayload round-trip (ADVICE r3: direct unit coverage for the
single-buffer device->host payload packing, frontend/kf_pack.py).

The encoding must be exact for EVERY 32-bit pattern, including the ones a
TPU backend's flush-to-zero/NaN-canonicalization would corrupt if the
words rode the f32 buffer as bitcasts (measured on the axon chip:
0x00000001 -> 0, 0x7f800001 -> 0x7fc00000) — hence the u16-split encoding
these tests pin down.
"""

import numpy as np
import jax.numpy as jnp

from tpuslam.frontend.kf_pack import PackedPayload


def _adversarial_u32():
    # patterns that are f32 denormals / NaN payloads / infinities / -0.0 —
    # exactly what flush/canonicalize passes rewrite
    return np.array(
        [0x00000001, 0x007FFFFF, 0x7FC00001, 0x7F800001, 0xFF800000,
         0x80000000, 0xFFFFFFFF, 0x12345678, 0, 0x7F800000],
        dtype=np.uint32,
    )


def _mixed_tree():
    rng = np.random.default_rng(7)
    return {
        "f": jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32)),
        "i": jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, (7,), dtype=np.int64).astype(np.int32)
        ),
        "u": jnp.asarray(_adversarial_u32()),
        "b": jnp.asarray(np.array([True, False, True])),
        "scalar": jnp.float32(3.25),
        "nested": (jnp.arange(4, dtype=jnp.int32), jnp.ones((2, 2), jnp.float32)),
    }


def test_roundtrip_mixed_dtypes():
    tree = _mixed_tree()
    out = PackedPayload(tree).unpack()
    for k in ("f", "i", "u", "b"):
        got, want = np.asarray(out[k]), np.asarray(tree[k])
        assert got.dtype == want.dtype, k
        assert got.shape == want.shape, k
        assert np.array_equal(got, want), k
    assert float(out["scalar"]) == 3.25
    assert np.array_equal(np.asarray(out["nested"][0]), np.arange(4, dtype=np.int32))
    assert np.array_equal(np.asarray(out["nested"][1]), np.ones((2, 2), np.float32))


def test_small_ints_survive():
    """match_idx/level-class values: small ints bitcast to f32 denormals —
    the exact class the original design lost on TPU."""
    tree = {
        "idx": jnp.asarray(np.arange(100, dtype=np.int32)),
        "neg": jnp.asarray(np.array([-1, -2, -100], dtype=np.int32)),
    }
    out = PackedPayload(tree).unpack()
    assert np.array_equal(np.asarray(out["idx"]), np.arange(100, dtype=np.int32))
    assert np.array_equal(np.asarray(out["neg"]), np.array([-1, -2, -100], np.int32))


def test_empty_tree():
    p = PackedPayload({})
    assert p.unpack() == {}


def test_int64_leaf_slot_accounting():
    """ADVICE r4 low: an np.int64 host leaf is demoted to int32 at the jit
    boundary (x64 off) and packs into 2 slots; the host-side slot math must
    see the SAME (canonicalized) dtype or every later leaf's offset is
    silently wrong. The float32 leaf AFTER the int64 one pins the offsets."""
    tree = {
        "a_i64": np.arange(9, dtype=np.int64),
        "b_f32": np.linspace(-3.0, 3.0, 11).astype(np.float32),
        "c_u32": _adversarial_u32(),
    }
    out = PackedPayload(tree).unpack()
    assert np.array_equal(np.asarray(out["a_i64"]), tree["a_i64"])
    assert np.array_equal(np.asarray(out["b_f32"]), tree["b_f32"])
    assert np.array_equal(np.asarray(out["c_u32"]), tree["c_u32"])
    assert np.asarray(out["a_i64"]).dtype == np.int64  # host dtype restored
