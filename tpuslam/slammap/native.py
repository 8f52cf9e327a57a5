"""ctypes bindings for the native map-store runtime (native/mapstore.cpp).

Builds the shared library on first use (g++, cached under native/build/) and
exposes `NativeMapStore`, a drop-in accelerated backend for the host-side
observation/covisibility bookkeeping (SURVEY §2 L3). Geometry payloads
(Pluecker, endpoints, descriptors) stay in numpy arrays owned by Python —
the native side holds only the graph structure, which is what the per-frame
host loop actually churns.

Falls back cleanly: `load_native()` returns None when no compiler is
available; `MapLineStore` (pure Python) remains the default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "mapstore.cpp")
_OUT_DIR = os.path.join(os.path.dirname(_SRC), "build")
_SO = os.path.join(_OUT_DIR, "libmapstore.so")

_I32P = ctypes.POINTER(ctypes.c_int32)


def _build() -> str:
    os.makedirs(_OUT_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_native():
    """Load (building if needed) the native library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            so = _build()
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            return None
        lib.ms_create.restype = ctypes.c_void_p
        lib.ms_create.argtypes = [ctypes.c_int32] * 3
        lib.ms_destroy.argtypes = [ctypes.c_void_p]
        lib.ms_add_keyframe.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ms_allocate.restype = ctypes.c_int32
        lib.ms_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ms_add_observation.restype = ctypes.c_int32
        lib.ms_add_observation.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
        lib.ms_erase_observation.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 2
        lib.ms_kill.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ms_replace.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 2
        lib.ms_n_obs.restype = ctypes.c_int32
        lib.ms_n_obs.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ms_alive.restype = ctypes.c_int32
        lib.ms_alive.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ms_get_line_ids.argtypes = [ctypes.c_void_p, ctypes.c_int32, _I32P]
        lib.ms_covisibility.restype = ctypes.c_int32
        lib.ms_covisibility.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            _I32P,
            _I32P,
            ctypes.c_int32,
        ]
        lib.ms_window_lines.restype = ctypes.c_int32
        lib.ms_window_lines.argtypes = [ctypes.c_void_p, _I32P, ctypes.c_int32, _I32P, ctypes.c_int32]
        lib.ms_observations.restype = ctypes.c_int32
        lib.ms_observations.argtypes = [
            ctypes.c_void_p,
            _I32P,
            ctypes.c_int32,
            _I32P,
            _I32P,
            _I32P,
            ctypes.c_int32,
        ]
        lib.ms_remove_keyframe.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        _LIB = lib
        return _LIB


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(_I32P)


class NativeMapStore:
    """Graph-structure store backed by native/mapstore.cpp."""

    def __init__(self, line_capacity: int = 16384, kf_capacity: int = 4096, feat_capacity: int = 512):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native mapstore unavailable (no g++?)")
        self._lib = lib
        self._h = lib.ms_create(line_capacity, kf_capacity, feat_capacity)
        self.line_capacity = line_capacity
        self.kf_capacity = kf_capacity
        self.feat_capacity = feat_capacity

    def __del__(self):
        try:
            self._lib.ms_destroy(self._h)
        except Exception:
            pass

    def add_keyframe(self, kid: int):
        self._lib.ms_add_keyframe(self._h, kid)

    def allocate(self, first_kf: int) -> int:
        return int(self._lib.ms_allocate(self._h, first_kf))

    def add_observation(self, lid: int, kid: int, slot: int) -> bool:
        return bool(self._lib.ms_add_observation(self._h, lid, kid, slot))

    def erase_observation(self, lid: int, kid: int):
        self._lib.ms_erase_observation(self._h, lid, kid)

    def kill(self, lid: int):
        self._lib.ms_kill(self._h, lid)

    def replace(self, old: int, new: int):
        self._lib.ms_replace(self._h, old, new)

    def n_obs(self, lid: int) -> int:
        return int(self._lib.ms_n_obs(self._h, lid))

    def alive(self, lid: int) -> bool:
        return bool(self._lib.ms_alive(self._h, lid))

    def line_ids(self, kid: int) -> np.ndarray:
        out = np.empty(self.feat_capacity, np.int32)
        self._lib.ms_get_line_ids(self._h, kid, _i32p(out))
        return out

    def covisibility(self, kid: int, min_weight: int = 1, max_out: int = 256):
        kids = np.empty(max_out, np.int32)
        counts = np.empty(max_out, np.int32)
        n = self._lib.ms_covisibility(self._h, kid, min_weight, _i32p(kids), _i32p(counts), max_out)
        return kids[:n].copy(), counts[:n].copy()

    def window_lines(self, kids, max_out: int = 4096) -> np.ndarray:
        kids = np.ascontiguousarray(kids, np.int32)
        out = np.empty(max_out, np.int32)
        n = self._lib.ms_window_lines(self._h, _i32p(kids), len(kids), _i32p(out), max_out)
        return out[:n].copy()

    def observations(self, lines, max_out: int = 16384):
        lines = np.ascontiguousarray(lines, np.int32)
        li = np.empty(max_out, np.int32)
        kids = np.empty(max_out, np.int32)
        slots = np.empty(max_out, np.int32)
        n = self._lib.ms_observations(
            self._h, _i32p(lines), len(lines), _i32p(li), _i32p(kids), _i32p(slots), max_out
        )
        return li[:n].copy(), kids[:n].copy(), slots[:n].copy()

    def remove_keyframe(self, kid: int):
        self._lib.ms_remove_keyframe(self._h, kid)
