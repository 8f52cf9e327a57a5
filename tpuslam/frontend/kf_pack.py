"""Single-buffer device->host payload packing.

On the axon tunnel every `copy_to_host_async` START is itself a serialized
wire round trip (~2-3 ms each, PERF_NOTES round-3); a keyframe's host
payload is ~12-17 small leaves (match arrays, the FrameFeatures tuple,
triangulations), so the per-leaf starts alone cost ~30 ms/KF
(probe_semidirect2: `_kf_begin` ~32 ms/call). Packing every leaf into ONE
flat f32 vector inside ONE jitted program turns the whole payload into a
single dispatch + a single async d2h; the host unpacks with numpy views.

Dtype handling (round-4 rework — the original bitcast design CORRUPTS on
TPU): inside a jitted TPU program, f32 denormals are flushed to zero and
NaN payloads canonicalized (measured on the axon chip: 0x00000001 -> 0,
0x7f800001 -> 0x7fc00000 through a bitcast+concatenate program), so any
4-byte int leaf bitcast to f32 loses exactly the values SLAM payloads are
full of (small match indices bitcast to denormals; descriptor words with
NaN-pattern bits). Int leaves therefore ride as TWO u16 halves value-cast
to f32 — every value 0..65535 is exactly representable and a normal
number, so the encoding survives any IEEE-conforming flush/canonicalize
pass. Wire cost: 2x on int leaves only (~16 KB extra on a 512-line
payload, ~1 ms at tunnel rate) — far cheaper than the per-leaf round
trips this module exists to avoid. bool and sub-4-byte integer leaves are
value-cast to f32 directly (their ranges fit exactly).

SURVEY §4.3 CreateNewKeyFrame host hand-off; the reference pays nothing
here (shared-memory threads) — on a PCIe/tunnel topology the transfer
plan IS the keyframe cost, hence this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_payload", "unpack_payload", "PackedPayload"]


def _encode(x):
    """Leaf -> (f32 vector, slots-per-element). Int32/uint32 split into
    exact u16 halves (see module docstring); f32 passes through; bool and
    narrow ints value-cast (exact)."""
    x = jnp.asarray(x)
    dt = np.dtype(x.dtype)
    if dt == np.float32:
        return x.ravel(), 1
    if dt.itemsize == 4 and dt.kind in "iu":
        u = x if dt.kind == "u" else jax.lax.bitcast_convert_type(x, jnp.uint32)
        u = u.ravel()
        lo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (u >> jnp.uint32(16)).astype(jnp.float32)
        return jnp.concatenate([lo, hi]), 2
    return x.astype(jnp.float32).ravel(), 1


@jax.jit
def _pack(leaves):
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate([_encode(l)[0] for l in jax.tree_util.tree_leaves(leaves)])


def _slots(dt: np.dtype) -> int:
    return 2 if (dt.itemsize == 4 and dt.kind in "iu" and dt != np.float32) else 1


class PackedPayload:
    """A pytree in flight as one flat f32 device vector.

    Construction dispatches the pack program and starts the async d2h;
    `unpack()` (later) blocks only on that single transfer and rebuilds
    the original tree from host-side views.
    """

    __slots__ = ("buf", "_treedef", "_entries")

    def __init__(self, tree):
        leaves, self._treedef = jax.tree_util.tree_flatten(tree)
        entries = []
        off = 0
        for leaf in leaves:
            shape = tuple(np.shape(leaf))
            # slot math must see the dtype the jitted _pack sees: jax
            # canonicalizes 64-bit leaves at the jit boundary (x64 disabled:
            # int64 -> int32, 2 slots), so an np.int64 host leaf (itemsize 8,
            # naively 1 slot) would corrupt every subsequent offset
            dt_orig = np.dtype(getattr(leaf, "dtype", np.float32))
            dt = np.dtype(jax.dtypes.canonicalize_dtype(dt_orig))
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            entries.append((shape, dt_orig, dt, off, n))
            off += n * _slots(dt)
        self._entries = entries
        self.buf = _pack(leaves)
        if hasattr(self.buf, "copy_to_host_async"):
            try:
                self.buf.copy_to_host_async()
            except Exception:
                pass  # backend without async d2h: unpack stays synchronous

    def unpack(self):
        buf = np.asarray(self.buf)
        out = []
        for shape, dt_orig, dt, off, n in self._entries:
            if dt == np.float32:
                arr = buf[off : off + n]
            elif dt.itemsize == 4 and dt.kind in "iu":
                lo = buf[off : off + n].astype(np.uint32)
                hi = buf[off + n : off + 2 * n].astype(np.uint32)
                u = lo | (hi << np.uint32(16))
                arr = u if dt.kind == "u" else u.view(dt)
            elif dt == np.bool_:
                arr = buf[off : off + n] > 0.5
            else:
                arr = buf[off : off + n].astype(dt)
            if dt_orig != arr.dtype:  # give callers back their host dtype
                arr = arr.astype(dt_orig)
            out.append(arr.reshape(shape))
        return jax.tree_util.tree_unflatten(self._treedef, out)


def pack_payload(tree) -> PackedPayload:
    return PackedPayload(tree)


def unpack_payload(payload: PackedPayload):
    return payload.unpack()
