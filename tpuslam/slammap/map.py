"""Map data model: keyframes, 3D line landmarks, covisibility (SURVEY §2 L3).

The reference's `Map`/`KeyFrame`/`MapLine` are mutex-guarded C++ object graphs
(three threads mutate them concurrently). The rebuild is single-host-threaded
by design (SURVEY §7 'race detection: eliminated by design'), so the map is
plain host bookkeeping: a fixed-capacity struct-of-arrays for landmarks
(device-uploadable without repacking) plus light per-keyframe python state.

Layout choices are TPU-driven:
- `MapLineStore` is SoA with capacity `Lmax`: the local-BA window assembly
  and projection-guided matching gather slices of these arrays directly into
  padded device buffers.
- observations are stored twice: per-line dict (line -> kf, feature index)
  for BA assembly, and per-keyframe array (feature index -> line id) for
  matching/fusion. Both sides are O(1) to update and trivially serialized
  for checkpointing.
- covisibility weights are a dict keyed by unordered kf pairs; the graph
  walks (local window, essential graph) are host-side and tiny compared to
  the device solves they feed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpuslam.frontend.frame import FrameFeatures


def _as_np(f: FrameFeatures) -> FrameFeatures:
    # jax.device_get starts copy_to_host_async on EVERY leaf before blocking
    # on any: one overlapped transfer instead of ~12 serial ~24 ms round
    # trips on the serialized tunnel (measured 315 ms/KF -> ~30 ms,
    # benchmarks/probe_kf.py)
    import jax

    return FrameFeatures(*[np.asarray(x) for x in jax.device_get(tuple(f))])


@dataclass
class KeyFrame:
    """A persistent frame promoted into the map."""

    kid: int
    frame_idx: int
    timestamp: float
    T_cw: np.ndarray  # (4, 4)
    features: FrameFeatures  # numpy copies, capacity K
    line_ids: np.ndarray  # (K,) int32: feature slot -> MapLine id (-1 = none)
    is_bad: bool = False
    # spanning tree / loop edges (SURVEY §2 'KeyFrame')
    parent: Optional[int] = None
    children: set = field(default_factory=set)
    loop_edges: set = field(default_factory=set)
    # hybrid point landmarks (SURVEY §3.1 `MapPoint`): present only when the
    # point front-end is enabled; None keeps line-only maps lightweight
    point_features: Optional[object] = None  # kernels.fast.PointFeatures (np)
    point_ids: Optional[np.ndarray] = None  # (KP,) int32 slot -> MapPoint id
    # transient DEVICE-resident copies of the feature structs (never
    # serialized): set at creation when the caller handed device arrays,
    # consumed by the mapper's duplicate-fusion dispatch on the same
    # keyframe event — saves re-uploading ~50 KB of features the device
    # already holds. Only the newest keyframe keeps them (see new_keyframe).
    dev_features: Optional[object] = None
    dev_point_features: Optional[object] = None

    @property
    def T_wc(self) -> np.ndarray:
        R = self.T_cw[:3, :3]
        t = self.T_cw[:3, 3]
        Ti = np.eye(4, dtype=self.T_cw.dtype)
        Ti[:3, :3] = R.T
        Ti[:3, 3] = -R.T @ t
        return Ti

    @property
    def center(self) -> np.ndarray:
        """Camera center in world coordinates."""
        return self.T_wc[:3, 3]


class MapLineStore:
    """Fixed-capacity SoA store of 3D line landmarks (Pluecker, world frame).

    Slot 0..capacity-1; `alive` marks active landmarks. Endpoints are kept
    for visualization, culling, and endpoint-based re-triangulation; the
    optimized state is the Pluecker vector (SURVEY §5).
    """

    def __init__(self, capacity: int = 16384, desc_words: int = 8):
        self.capacity = capacity
        # optional native graph mirror (slammap/native.py): id allocation is
        # kept in lockstep (both free lists are LIFO and every mutation is
        # mirrored), so the C++ side can answer the graph queries
        self.mirror = None
        self.plucker = np.zeros((capacity, 6), np.float32)
        self.endpoints = np.zeros((capacity, 2, 3), np.float32)  # world 3D
        self.alive = np.zeros(capacity, bool)
        self.desc_bits = np.zeros((capacity, desc_words), np.uint32)
        self.n_obs = np.zeros(capacity, np.int32)
        self.first_kf = np.full(capacity, -1, np.int32)
        # per-line observations: line id -> {kf id: feature slot}
        self.obs: Dict[int, Dict[int, int]] = {}
        self._next = 0
        self._free: List[int] = []

    def allocate(self, plucker, endpoints, desc_bits, first_kf: int) -> int:
        if self._free:
            lid = self._free.pop()
        else:
            lid = self._next
            if lid >= self.capacity:
                raise RuntimeError("MapLineStore capacity exceeded")
            self._next += 1
        self.plucker[lid] = plucker
        self.endpoints[lid] = endpoints
        self.desc_bits[lid] = desc_bits
        self.alive[lid] = True
        self.n_obs[lid] = 0
        self.first_kf[lid] = first_kf
        self.obs[lid] = {}
        if self.mirror is not None:
            nid = self.mirror.allocate(first_kf)
            if nid != lid:  # lockstep broken (capacity mismatch?) — drop it
                self.mirror = None
        return lid

    def add_observation(self, lid: int, kf: "KeyFrame", slot: int):
        if not self.alive[lid]:
            return
        self.obs[lid][kf.kid] = slot
        self.n_obs[lid] = len(self.obs[lid])
        kf.line_ids[slot] = lid
        if self.mirror is not None:
            self.mirror.add_observation(lid, kf.kid, slot)

    def erase_observation(self, lid: int, kf: "KeyFrame"):
        o = self.obs.get(lid)
        if o is None or kf.kid not in o:
            return
        slot = o.pop(kf.kid)
        if kf.line_ids[slot] == lid:
            kf.line_ids[slot] = -1
        self.n_obs[lid] = len(o)
        if self.mirror is not None:
            self.mirror.erase_observation(lid, kf.kid)

    def kill(self, lid: int, keyframes: Dict[int, "KeyFrame"]):
        """SetBadFlag: remove the landmark and all its observations."""
        if not self.alive[lid]:
            return
        for kid, slot in list(self.obs.get(lid, {}).items()):
            kf = keyframes.get(kid)
            if kf is not None and kf.line_ids[slot] == lid:
                kf.line_ids[slot] = -1
        self.obs.pop(lid, None)
        self.alive[lid] = False
        self._free.append(lid)
        if self.mirror is not None:
            self.mirror.kill(lid)

    def replace(self, old: int, new: int, keyframes: Dict[int, "KeyFrame"]):
        """Fuse duplicate landmarks: move old's observations onto new."""
        if old == new or not self.alive[old]:
            return
        for kid, slot in list(self.obs.get(old, {}).items()):
            kf = keyframes.get(kid)
            if kf is None:
                continue
            if kid not in self.obs.setdefault(new, {}):
                self.obs[new][kid] = slot
                kf.line_ids[slot] = new
            else:
                if kf.line_ids[slot] == old:
                    kf.line_ids[slot] = -1
        self.n_obs[new] = len(self.obs[new])
        self.obs.pop(old, None)
        self.alive[old] = False
        self._free.append(old)
        if self.mirror is not None:
            self.mirror.replace(old, new)

    def live_ids(self) -> np.ndarray:
        return np.nonzero(self.alive)[0]


class SlamMap:
    """Global map: keyframes + line landmarks + covisibility graph."""

    def __init__(
        self,
        line_capacity: int = 16384,
        point_capacity: int = 16384,
        native: bool | None = None,
    ):
        import os

        from tpuslam.slammap.points import MapPointStore

        self.keyframes: Dict[int, KeyFrame] = {}
        self.lines = MapLineStore(line_capacity)
        self.points = MapPointStore(point_capacity)
        # bumped on every global pose/landmark correction (loop closure);
        # async BA results assembled under an older generation are stale
        # (the reference's mbAbortBA analog) and must be discarded
        self.generation = 0
        # native C++ graph runtime (SURVEY §2 L3; native/mapstore.cpp): the
        # per-keyframe covisibility recount is the hottest host loop, and it
        # runs over flat C arrays there instead of python dict churn. The
        # python dicts REMAIN authoritative (BA assembly, serialization);
        # update_connections cross-checks against the native counts in tests.
        if native is None:
            native = os.environ.get("TPUSLAM_NATIVE_MAP", "1") == "1"
        if native:
            try:
                from tpuslam.slammap.native import NativeMapStore, load_native

                if load_native() is not None:
                    self.lines.mirror = NativeMapStore(line_capacity=line_capacity)
            except Exception:
                self.lines.mirror = None
        self._next_kid = 0
        # covisibility: kf id -> {other kf id: shared landmark count}
        self.covis: Dict[int, Dict[int, int]] = {}
        self.covis_threshold = 15
        # callback(kid) invoked when a keyframe is culled (System hooks the
        # keyframe database here so culled KFs leave the scoring set)
        self.on_keyframe_erased = None

    # ---- keyframes ------------------------------------------------------
    def new_keyframe(
        self,
        frame_idx: int,
        timestamp: float,
        T_cw: np.ndarray,
        features: FrameFeatures,
        point_features=None,
    ) -> KeyFrame:
        f = _as_np(features)
        kf = KeyFrame(
            kid=self._next_kid,
            frame_idx=frame_idx,
            timestamp=timestamp,
            T_cw=np.asarray(T_cw, np.float32).copy(),
            features=f,
            line_ids=np.full(f.valid.shape[0], -1, np.int32),
        )
        if point_features is not None:
            import jax

            pf = type(point_features)(
                *[np.asarray(x) for x in jax.device_get(tuple(point_features))]
            )
            kf.point_features = pf
            kf.point_ids = np.full(pf.valid.shape[0], -1, np.int32)
        # stash the device-resident structs for the mapper's fusion dispatch
        # on this keyframe event; only the newest KF keeps them (bounded
        # device memory even when no mapper consumes them)
        if hasattr(getattr(features, "endpoints", None), "copy_to_host_async"):
            kf.dev_features = features
        if point_features is not None and hasattr(
            getattr(point_features, "uv", None), "copy_to_host_async"
        ):
            kf.dev_point_features = point_features
        prev = getattr(self, "_last_dev_kf", None)
        if prev is not None:
            prev.dev_features = None
            prev.dev_point_features = None
        self._last_dev_kf = kf
        self._next_kid += 1
        self.keyframes[kf.kid] = kf
        self.covis[kf.kid] = {}
        m = self.lines.mirror
        if m is not None:
            if kf.kid < m.kf_capacity and f.valid.shape[0] <= m.feat_capacity:
                m.add_keyframe(kf.kid)
            else:  # beyond the native capacities: fall back to pure python
                self.lines.mirror = None
        return kf

    def erase_keyframe(self, kid: int):
        """KeyFrame culling (redundant KFs). Re-parents spanning-tree
        children to the culled node's parent."""
        kf = self.keyframes.get(kid)
        if kf is None:
            return
        for lid in np.unique(kf.line_ids):
            if lid >= 0:
                self.lines.erase_observation(int(lid), kf)
        if kf.point_ids is not None:
            for pid in np.unique(kf.point_ids):
                if pid >= 0:
                    self.points.erase_observation(int(pid), kf)
        for other in list(self.covis.get(kid, {})):
            self.covis.get(other, {}).pop(kid, None)
        self.covis.pop(kid, None)
        for child in kf.children:
            ckf = self.keyframes.get(child)
            if ckf is not None:
                ckf.parent = kf.parent
                if kf.parent is not None:
                    self.keyframes[kf.parent].children.add(child)
        if kf.parent is not None:
            self.keyframes[kf.parent].children.discard(kid)
        kf.is_bad = True
        del self.keyframes[kid]
        if self.lines.mirror is not None:
            self.lines.mirror.remove_keyframe(kid)
        if self.on_keyframe_erased is not None:
            self.on_keyframe_erased(kid)

    # ---- covisibility ---------------------------------------------------
    def update_connections(self, kf: KeyFrame):
        """Recount shared landmarks between kf and all keyframes observing
        its landmarks; refresh both adjacency rows and the spanning tree
        (reference behavior: parent = best covisible; SURVEY §2 'KeyFrame')."""
        m = self.lines.mirror
        if m is not None:
            kids, ws = m.covisibility(kf.kid)
            counts: Dict[int, int] = {
                int(k): int(w) for k, w in zip(kids, ws) if int(k) != kf.kid
            }
        else:
            counts = {}
            for lid in kf.line_ids:
                if lid < 0:
                    continue
                for kid in self.lines.obs.get(int(lid), {}):
                    if kid != kf.kid:
                        counts[kid] = counts.get(kid, 0) + 1
        if kf.point_ids is not None:
            for pid in kf.point_ids:
                if pid < 0:
                    continue
                for kid in self.points.obs.get(int(pid), {}):
                    if kid != kf.kid:
                        counts[kid] = counts.get(kid, 0) + 1
        old = self.covis.get(kf.kid, {})
        for other in list(old):
            if other not in counts:
                self.covis.get(other, {}).pop(kf.kid, None)
        self.covis[kf.kid] = counts
        for other, c in counts.items():
            if other in self.covis:
                self.covis[other][kf.kid] = c
        if kf.parent is None and counts and kf.kid != min(self.keyframes):
            best = max(counts, key=counts.get)
            kf.parent = best
            self.keyframes[best].children.add(kf.kid)

    def covisible_keyframes(self, kid: int, n: int | None = None, min_weight: int = 1) -> List[int]:
        """GetBestCovisibilityKeyFrames: neighbors sorted by weight desc."""
        row = self.covis.get(kid, {})
        ids = sorted(
            (k for k, w in row.items() if w >= min_weight and k in self.keyframes),
            key=lambda k: -row[k],
        )
        return ids if n is None else ids[:n]

    # ---- queries --------------------------------------------------------
    def all_keyframe_ids(self) -> List[int]:
        return sorted(self.keyframes)

    def local_window(self, kid: int, size: int) -> Tuple[List[int], List[int]]:
        """(window KF ids, their landmark ids) for local BA: the current KF +
        its best covisible KFs (SURVEY §4.3)."""
        window = [kid] + self.covisible_keyframes(kid, n=size - 1)
        lids = set()
        for k in window:
            kf = self.keyframes[k]
            lids.update(int(l) for l in kf.line_ids if l >= 0)
        return window, sorted(lids)

    def window_point_ids(self, window: List[int]) -> List[int]:
        """Point landmarks observed by a keyframe window (hybrid local BA /
        local-map assembly; companion to `local_window`'s line ids)."""
        pids = set()
        for k in window:
            kf = self.keyframes.get(k)
            if kf is None or kf.point_ids is None:
                continue
            pids.update(int(p) for p in kf.point_ids if p >= 0)
        return sorted(pids)

    def essential_edges(self, min_weight: int = 100) -> List[Tuple[int, int]]:
        """Essential graph: spanning tree + loop edges + strong covis edges."""
        edges = set()
        for kid, kf in self.keyframes.items():
            if kf.parent is not None and kf.parent in self.keyframes:
                edges.add((min(kid, kf.parent), max(kid, kf.parent)))
            for le in kf.loop_edges:
                if le in self.keyframes:
                    edges.add((min(kid, le), max(kid, le)))
            for other, w in self.covis.get(kid, {}).items():
                if w >= min_weight and other in self.keyframes:
                    edges.add((min(kid, other), max(kid, other)))
        return sorted(edges)
