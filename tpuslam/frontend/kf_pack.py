"""Single-buffer device->host payload packing.

On the axon tunnel every `copy_to_host_async` START is itself a serialized
wire round trip (~2-3 ms each, PERF_NOTES round-3); a keyframe's host
payload is ~12-17 small leaves (match arrays, the FrameFeatures tuple,
triangulations), so the per-leaf starts alone cost ~30 ms/KF
(probe_semidirect2: `_kf_begin` ~32 ms/call). Packing every leaf into ONE
flat f32 vector inside ONE jitted program turns the whole payload into a
single dispatch + a single async d2h; the host unpacks with numpy views.

Dtype handling: 4-byte dtypes (f32 / i32 / u32) are BITCAST, not
value-cast — lossless and free on the device; the host recovers them with
`ndarray.view`. bool and sub-4-byte integer leaves are value-cast to f32
and cast back on the host (4x wire inflation, acceptable for the small
mask arrays this path carries — validity masks are f32 by convention
anyway, frame.py:80).

SURVEY §4.3 CreateNewKeyFrame host hand-off; the reference pays nothing
here (shared-memory threads) — on a PCIe/tunnel topology the transfer
plan IS the keyframe cost, hence this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_payload", "unpack_payload", "PackedPayload"]


def _to_f32(x):
    x = jnp.asarray(x)
    dt = np.dtype(x.dtype)
    if dt == np.float32:
        return x.ravel()
    if dt.itemsize == 4 and dt.kind in "iu":
        return jax.lax.bitcast_convert_type(x, jnp.float32).ravel()
    return x.astype(jnp.float32).ravel()


@jax.jit
def _pack(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate([_to_f32(l) for l in leaves])


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
            shape = tuple(leaf.shape)
            dt = np.dtype(leaf.dtype)
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            entries.append((shape, dt, off, n))
            off += n
        self._entries = entries
        self.buf = _pack(tree)
        if hasattr(self.buf, "copy_to_host_async"):
            try:
                self.buf.copy_to_host_async()
            except Exception:
                pass  # backend without async d2h: unpack stays synchronous

    def unpack(self):
        buf = np.asarray(self.buf)
        out = []
        for shape, dt, off, n in self._entries:
            seg = buf[off : off + n]
            if dt == np.float32:
                arr = seg
            elif dt.itemsize == 4 and dt.kind in "iu":
                arr = seg.view(dt)
            elif dt == np.bool_:
                arr = seg > 0.5
            else:
                arr = seg.astype(dt)
            out.append(arr.reshape(shape))
        return jax.tree_util.tree_unflatten(self._treedef, out)


def pack_payload(tree) -> PackedPayload:
    return PackedPayload(tree)


def unpack_payload(payload: PackedPayload):
    return payload.unpack()
