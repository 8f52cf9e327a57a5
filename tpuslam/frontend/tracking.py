"""The tracking front-end: per-frame pose estimation (SURVEY §2 L5, §4.2).

Host-side sequential control flow (reference thread T1, minus the threads —
SURVEY §3.3: single host thread by design) orchestrating jitted device
programs:

  extract_features (+ stereo_line_depths)   -> 1-2 dispatches
  tracked_pose_step (motion-model stage)    -> 1 dispatch
  tracked_pose_step (local-map stage)       -> 1 dispatch

State machine: NOT_INITIALIZED -> OK -> LOST (relocalization against the
keyframe database; SURVEY §7 'failure detection').

All map gathers into device buffers use fixed capacities (`local_capacity`)
so tracking never recompiles after warmup.
"""

from __future__ import annotations

import enum
import os
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.backend.pose_opt import PoseOptConfig
from tpuslam.frontend.frame import (
    FrameFeatures,
    FrontendParams,
    StereoParams,
    extract_features,
    host_prescale,
    stereo_line_depths,
)
from tpuslam.frontend.matcher import (
    ProjectionSearchParams,
    TrackStepResult,
    tracked_pose_step,
    triangulate_stereo_lines,
)
from tpuslam.frontend.points import (
    HybridTrackResult,
    PointFrontendParams,
    extract_points,
    stereo_point_depths,
    tracked_pose_step_hybrid,
    triangulate_stereo_points,
)
from tpuslam.frontend.kf_pack import pack_payload
from tpuslam.geometry.camera import Intrinsics
from tpuslam.kernels.align_direct import DirectAlignParams, inject_coord_scale_align
from tpuslam.kernels.stereo_direct import (
    DirectPointStereoParams,
    DirectStereoParams,
    direct_stereo_depths,
    direct_stereo_point_depths,
)
from tpuslam.slammap.map import KeyFrame, SlamMap


class TrackingState(enum.Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@jax.jit
def _unpack_local_jit(buf):
    """Device unpack of the single-buffer local-LINE-map upload (see
    _local_map_arrays): [plucker 6 | ep3d 6 | bits_lo 8 | bits_hi 8 |
    valid 1] per row, desc_bits recombined from exact u16 halves."""
    NL = buf.shape[0]
    lo = buf[:, 12:20].astype(jnp.uint32)
    hi = buf[:, 20:28].astype(jnp.uint32)
    return dict(
        plucker=buf[:, :6],
        ep3d=buf[:, 6:12].reshape(NL, 2, 3),
        bits=lo | (hi << jnp.uint32(16)),
        valid=buf[:, 28],
    )


@jax.jit
def _unpack_plocal_jit(buf):
    """Point-map analog: [xyz 3 | bits_lo 8 | bits_hi 8 | valid 1]."""
    lo = buf[:, 3:11].astype(jnp.uint32)
    hi = buf[:, 11:19].astype(jnp.uint32)
    return dict(
        xyz=buf[:, :3],
        bits=lo | (hi << jnp.uint32(16)),
        valid=buf[:, 19],
    )


def _img_f32(img: np.ndarray) -> np.ndarray:
    """Accept u8 (0..255) or f32 (0..1) frames; return f32 in [0, 1]."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32, copy=False)




@dataclass
class TrackerConfig:
    frontend: FrontendParams = FrontendParams()
    stereo: StereoParams = StereoParams()
    search_coarse: ProjectionSearchParams = ProjectionSearchParams(radius=50.0)
    search_fine: ProjectionSearchParams = ProjectionSearchParams(radius=20.0)
    pose_opt: PoseOptConfig = PoseOptConfig()
    local_capacity: int = 1024  # padded local-map landmark count
    pipelined: bool = False  # one-frame-lagged host syncs (latency hiding):
    # pose prediction/acceptance stay device-resident; host state, keyframe
    # decisions, and returned FrameResults lag one frame (PERF_NOTES.md —
    # every host<->device sync pays a relay round trip on the axon backend)
    fused: bool = True  # with pipelined stereo: ONE device program per frame
    # (extract pair + stereo + coarse + fine + acceptance) with the pose
    # chain device-resident, plus a worker-thread image uploader — the
    # tunnel's ~4 ms/dispatch and thread-blocking h2d make this the fast
    # path (frontend/pipeline.py). Results lag 1 + fuse_lag frames. Kill
    # switch: TPUSLAM_FUSED=0.
    fuse_lag: int = 2  # fused frames in flight before the oldest is resolved.
    # The tunnel's d2h round trip is ~24 ms; at lag 1 the resolve lands
    # ~one frame after its copy_to_host_async and blocks on the wire, at
    # lag 2 the bytes are host-resident by resolve time (probe_direct lag
    # sweep + probe_overlap2, PERF_NOTES round-3).
    chunk: int = 1  # fused frames per device dispatch (direct-stereo lines-
    # only mode): C consecutive frames ride ONE upload + ONE lax.scan program
    # (pipeline.fused_stereo_chunk), amortizing the tunnel's ~4 ms dispatch
    # and ~24 ms per-upload RTT over C frames. Results lag up to 2 chunks;
    # all frames of a chunk match against the same local-map snapshot (the
    # fuse_lag staleness class, one step deeper). 1 = off.
    min_init_lines: int = 20
    min_track_matches: int = 10
    min_track_inliers: int = 8
    max_frames_between_kf: int = 20
    min_frames_between_kf: int = 0
    kf_tracked_ratio: float = 0.6  # new KF if inliers < ratio * ref tracked
    min_new_kf_lines: int = 30  # (stereo) close lines needed to defer KF
    local_window_kfs: int = 10
    # hybrid point+line tracking (SURVEY §3.1 `MapPoint`, [P:6]): FAST/BRIEF
    # corners feed 3-DoF point blocks next to the line blocks in the same
    # pose LM / local BA. None = lines only. Stereo sync path (the hybrid
    # step is not folded into the fused device pipeline yet).
    points: Optional["PointFrontendParams"] = None
    point_local_capacity: int = 512
    # direct epipolar stereo (kernels/stereo_direct.py): recover line depths
    # by correlating left segments against the right IMAGE instead of
    # detecting + describing right-camera lines. Halves the per-frame
    # detector cost (the largest term in the frame budget). None = the
    # descriptor stereo path (SURVEY §3.1 Frame "ComputeStereoMatches").
    direct_stereo: Optional["DirectStereoParams"] = None
    # corner analog, used when `points` and `direct_stereo` are both set
    # (the fused hybrid pipeline and the direct sync path)
    direct_points: "DirectPointStereoParams" = None  # default-constructed lazily
    # semi-direct chunk tracking (kernels/align_direct.py): full detection
    # + matching + pose LM only on the FIRST frame of each chunk; the C-1
    # frames after it are tracked by photometric template alignment against
    # the local 3D line map (PL-SVO/moving-edges style). Needs chunk >= 2 and
    # direct_stereo (lines-only). Keyframes are only made from anchor frames.
    semidirect: Optional["DirectAlignParams"] = None


@dataclass
class FrameResult:
    frame_idx: int
    timestamp: float
    T_cw: np.ndarray
    state: TrackingState
    n_matches: int = 0
    n_inliers: int = 0
    made_keyframe: bool = False


class _ChunkFrameView:
    """Per-frame view into a chunked FusedFrameOut (pipeline.fused_stereo_
    chunk): presents the single-frame FusedFrameOut interface to the resolve
    machinery. `packed` rows come from ONE chunk-wide d2h (cached across the
    chunk's views). Feature/match access materializes the WHOLE chunk to
    NUMPY in one overlapped device_get (cached across the chunk's views) and
    slices on the host: per-leaf-per-index eager device slicing costs a
    ~0.35 s op-compile for EVERY (leaf, index) pair in a fresh process
    (probe_chunk.py: 4.9 s + 2.1 s chunk cycles while the op cache filled),
    and each eager dispatch is wire chatter on the serialized tunnel."""

    pfeats = None
    p_match_idx = None
    p_inlier = None

    def __init__(self, chunk_out, i: int, packed_cache: dict):
        self._chunk = chunk_out
        self._i = i
        self._cache = packed_cache
        self._midx = None
        self._inl = None

    @property
    def packed(self) -> np.ndarray:
        if "packed" not in self._cache:
            self._cache["packed"] = np.asarray(self._chunk.packed)
        return self._cache["packed"][self._i]

    def _np(self, field):
        """Whole-chunk numpy materialization of a FusedFrameOut field, one
        overlapped d2h per chunk (shared via the chunk-wide cache)."""
        if field not in self._cache:
            self._cache[field] = jax.device_get(getattr(self._chunk, field))
        return self._cache[field]

    def start_async(self):
        """Kick the whole-chunk d2h of every field a deferred keyframe
        finish will read, so the bytes ride the tunnel while further frames
        keep tracking (the finish's device_get then finds them on host)."""
        for field in ("feats", "match_idx", "inlier"):
            if field in self._cache:
                continue
            for leaf in jax.tree_util.tree_leaves(getattr(self._chunk, field)):
                if hasattr(leaf, "copy_to_host_async"):
                    try:
                        leaf.copy_to_host_async()
                    except Exception:
                        pass

    @property
    def feats(self):
        return jax.tree_util.tree_map(
            lambda x: x[self._i] if x is not None else None, self._np("feats")
        )

    @property
    def match_idx(self):
        return self._midx if self._midx is not None else self._np("match_idx")[self._i]

    @property
    def inlier(self):
        return self._inl if self._inl is not None else self._np("inlier")[self._i]

    def _replace(self, match_idx=None, inlier=None):
        if match_idx is not None:
            self._midx = match_idx
        if inlier is not None:
            self._inl = inlier
        return self


class _SemiFrameView:
    """Per-frame view into a semi-direct chunk's FusedFrameOut.

    The anchor (i == 0) exposes the chunk output's single-frame feature and
    match arrays directly (they belong to it). Inter frames carry no device
    features — only their `packed` row; the rare host paths that need
    features for them (TrackReferenceKeyFrame fallback, relocalization,
    weak-inlier keyframe promotion) lazily re-extract from the kept host
    image pair through the tracker's sync front-end.

    Hybrid chunks: the anchor also exposes the point family (pfeats /
    p_match_idx / p_inlier); inter frames report None for them (their
    alignment consumed points photometrically — no per-point matches)."""

    def __init__(self, out, i: int, packed_cache: dict, tracker=None, host_pair=None):
        self._out = out
        self._i = i
        self._cache = packed_cache
        self._tracker = tracker
        self._host_pair = host_pair  # (il, ir) numpy, inter frames only
        self._midx = None
        self._inl = None
        self._feats = None

    @property
    def inter(self) -> bool:
        return self._i > 0

    @property
    def pfeats(self):
        return self._out.pfeats if self._i == 0 else None

    @property
    def p_match_idx(self):
        return self._out.p_match_idx if self._i == 0 else None

    @property
    def p_inlier(self):
        return self._out.p_inlier if self._i == 0 else None

    @property
    def packed(self) -> np.ndarray:
        if "packed" not in self._cache:
            self._cache["packed"] = np.asarray(self._out.packed)
        return self._cache["packed"][self._i]

    @property
    def feats(self):
        if self._i == 0:
            return self._out.feats
        if self._feats is None:
            self._feats = self._tracker._stereo_features(*self._host_pair)
        return self._feats

    @property
    def match_idx(self):
        if self._midx is not None:
            return self._midx
        return self._out.match_idx if self._i == 0 else None

    @property
    def inlier(self):
        if self._inl is not None:
            return self._inl
        return self._out.inlier if self._i == 0 else None

    def _replace(self, match_idx=None, inlier=None):
        if match_idx is not None:
            self._midx = match_idx
        if inlier is not None:
            self._inl = inlier
        return self


class Tracker:
    """Per-frame tracking over a shared SlamMap (SURVEY §4.2 Track())."""

    def __init__(self, cam: Intrinsics, slam_map: SlamMap, cfg: TrackerConfig = TrackerConfig()):
        self.cam = cam
        self.map = slam_map
        self.cfg = cfg
        self.state = TrackingState.NOT_INITIALIZED
        self.timer = None  # optional StageTimer (System wires its own in)
        self.T_cw = np.eye(4, dtype=np.float32)
        self.velocity = np.eye(4, dtype=np.float32)  # T_curr @ inv(T_last)
        self.last_T_cw: Optional[np.ndarray] = None
        self.ref_kf: Optional[int] = None
        self.last_kf_frame = -10**9
        self.frame_idx = -1
        self.ref_tracked = 0
        # local-map device cache (rebuilt when the window changes)
        self._local_ids = np.zeros(cfg.local_capacity, np.int32)
        self._local_valid = np.zeros(cfg.local_capacity, bool)
        self._local_dirty = True
        self._plocal_dirty = True
        # callbacks installed by the mapping back-end
        self.on_new_keyframe = None
        # keyframe database for relocalization (installed by System)
        self.kf_db = None
        self.n_relocalizations = 0
        # pipelined-mode state: the in-flight previous frame
        self._pending = None
        # hybrid point front-end state (cfg.points)
        self._cur_pfeats = None  # this frame's PointFeatures (stereo depths)
        self._cur_p_match = None  # (p_match_idx, p_inlier) of the last fine step
        self._plocal_ids = np.zeros(cfg.point_local_capacity, np.int32)
        self._plocal_valid = np.zeros(cfg.point_local_capacity, bool)
        # fused-pipeline state (frontend/pipeline.py)
        self._completed: deque = deque()  # FrameResults finished this call
        self._up_pending = None  # (frame_idx, ts, upload handle)
        # in-flight fused frames, oldest first: entries are
        # (frame_idx, ts, FusedFrameOut, ids, valid, point_ids, point_valid)
        self._fuse_queue: deque = deque()
        self._dev_chain = None  # (T_last, T_prevlast) device arrays
        self._uploader = None
        self._chunk_buf: list = []  # host frames awaiting a full chunk
        # deferred keyframe: the KF decision's d2h (features, matches,
        # triangulation) rides the tunnel while 1-2 more frames track; the
        # map insert happens at a later resolve (_finish_pending_kf) once
        # the transfer has had _kf_defer_s of wall time
        self._pending_kf: Optional[dict] = None
        self._kf_defer_s = float(os.environ.get("TPUSLAM_KF_DEFER_MS", "40")) / 1e3

    # ---- public API ----------------------------------------------------
    def track_stereo(self, img_left: np.ndarray, img_right: np.ndarray, timestamp: float) -> Optional[FrameResult]:
        self.frame_idx += 1
        if not hasattr(self, "_fxb"):
            self._fxb = jnp.float32(self.cam.fx * self.cam.baseline)
        if self.cfg.frontend.prescaled:
            # half-res host ingest: downscale BEFORE the device upload (the
            # h2d image transfer dominates the host path — pipeline.py) so
            # every downstream consumer (fused program, sync fallback,
            # drains) sees one consistent image scale
            img_left = host_prescale(img_left, self.cfg.frontend)
            img_right = host_prescale(img_right, self.cfg.frontend)
        if self._use_fused() and self.state == TrackingState.OK:
            return self._track_stereo_fused(img_left, img_right, timestamp)
        self._drain_fused()
        feats = self._stereo_features(img_left, img_right)
        self._refresh_point_features(img_left, img_right)
        r = self._track(feats, timestamp, stereo=True)
        if r is not None:
            self._completed.append(r)
        return self._completed.popleft() if self._completed else None

    def track_monocular(self, img: np.ndarray, timestamp: float) -> FrameResult:
        self.frame_idx += 1
        if self.cfg.frontend.prescaled:
            img = host_prescale(img, self.cfg.frontend)
        feats = extract_features(jnp.asarray(_img_f32(img)), self.cfg.frontend)
        if self.cfg.points is not None:
            # mono hybrid (SURVEY §3.1 `MapPoint`, [P:6]): corners carry no
            # depth here — map points come from two-view triangulation in the
            # mapper (LocalMapper._create_new_mappoints); tracking against
            # existing map points needs only projection + descriptors
            self._cur_pfeats = self._upscale_points(
                extract_points(jnp.asarray(_img_f32(img)), self.cfg.points)
            )
        return self._track(feats, timestamp, stereo=False)

    def _refresh_point_features(self, img_left: np.ndarray, img_right: np.ndarray):
        """Recompute `_cur_pfeats` (hybrid corner features + stereo depths)
        for THIS frame. Every sync-path track of a new frame must call this
        alongside `_stereo_features`: the hybrid pose LM reads
        `self._cur_pfeats`, and a stale value (the previous anchor's corners)
        drags the joint solve toward that old frame's pose — the round-4
        advisor's hybrid regression was exactly the partial-chunk flush
        tracking frame N against frame N-4's corner set (0.2 m spike)."""
        if self.cfg.points is None:
            return
        pl = self._upscale_points(
            extract_points(jnp.asarray(_img_f32(img_left)), self.cfg.points)
        )
        if self.cfg.direct_stereo is not None:
            self._cur_pfeats = direct_stereo_point_depths(
                jnp.asarray(_img_f32(img_left)), jnp.asarray(_img_f32(img_right)),
                pl, self._fxb, self._direct_points(),
            )
        else:
            pr_ = self._upscale_points(
                extract_points(jnp.asarray(_img_f32(img_right)), self.cfg.points)
            )
            self._cur_pfeats = stereo_point_depths(pl, pr_, self._fxb, self.cfg.points)

    def _stereo_features(self, img_left: np.ndarray, img_right: np.ndarray) -> FrameFeatures:
        """Left features with stereo depths — descriptor stereo (detect both
        cameras) or, with cfg.direct_stereo set, direct epipolar correlation
        against the right image (left-only detection)."""
        il = jnp.asarray(_img_f32(img_left))
        fl = extract_features(il, self.cfg.frontend)
        if self.cfg.direct_stereo is not None:
            ir = jnp.asarray(_img_f32(img_right))
            return direct_stereo_depths(il, ir, fl, self._fxb, self._direct_lines())
        fr = extract_features(jnp.asarray(_img_f32(img_right)), self.cfg.frontend)
        return stereo_line_depths(fl, fr, self._fxb, self.cfg.stereo)

    def pop_results(self) -> List[FrameResult]:
        """Drain FrameResults beyond the one returned by track_* (pipeline
        transitions can complete several frames in one call)."""
        out = list(self._completed)
        self._completed.clear()
        return out

    # ---- fused single-program pipeline (frontend/pipeline.py) -----------
    def _use_fused(self) -> bool:
        return (
            self.cfg.pipelined
            and self.cfg.fused
            # hybrid points run fused only with direct stereo (left-only
            # detection); descriptor-stereo hybrid stays on the sync path
            and (self.cfg.points is None or self.cfg.direct_stereo is not None)
            and os.environ.get("TPUSLAM_FUSED", "1") == "1"
        )

    def _direct_points(self) -> DirectPointStereoParams:
        return self._inject_coord_scale(self.cfg.direct_points or DirectPointStereoParams())

    def _direct_lines(self) -> Optional[DirectStereoParams]:
        if self.cfg.direct_stereo is None:
            return None
        return self._inject_coord_scale(self.cfg.direct_stereo)

    def _upscale_points(self, pf):
        """Corner uv from a prescaled image -> full-res coords (line geometry
        gets this inside _merge_levels; points are detected raw)."""
        fe = self.cfg.frontend
        if fe.prescaled and fe.base_scale != 1.0:
            return pf._replace(uv=pf.uv / fe.base_scale)
        return pf

    def _inject_coord_scale(self, p):
        """With prescaled host ingest the correlation images are at
        base_scale but feature geometry stays full-res: set the kernel's
        coord_scale (and shrink the disparity search to the same metric
        range) unless the config already did."""
        from tpuslam.kernels.stereo_direct import inject_coord_scale

        fe = self.cfg.frontend
        return inject_coord_scale(p, fe.base_scale, fe.prescaled)

    def _chunk_size(self) -> int:
        """Frames per fused dispatch; chunking needs direct stereo. With
        hybrid points enabled the chunk must be the SEMI-DIRECT program
        (pipeline._fused_chunk_semidirect_hybrid aligns followers against
        both landmark families); the lines-only chunk scan has no point
        stage, so points + chunk without semidirect falls back to 1."""
        if self.cfg.direct_stereo is None:
            return 1
        if self.cfg.points is not None and self.cfg.semidirect is None:
            return 1
        return max(1, int(self.cfg.chunk))

    def _use_semidirect(self) -> bool:
        return (
            self.cfg.semidirect is not None
            and self._chunk_size() > 1
            and os.environ.get("TPUSLAM_SEMIDIRECT", "1") == "1"
        )

    def _align_params(self) -> DirectAlignParams:
        fe = self.cfg.frontend
        return inject_coord_scale_align(
            self.cfg.semidirect, fe.base_scale, fe.prescaled
        )

    def _track_stereo_fused(self, il, ir, timestamp: float) -> Optional[FrameResult]:
        from tpuslam.frontend.pipeline import AsyncUploader

        if self._uploader is None:
            self._uploader = AsyncUploader()
        if self._chunk_size() > 1:
            return self._track_stereo_fused_chunk(il, ir, timestamp)
        pair = np.ascontiguousarray(np.stack([il, ir]))
        slot = []

        def _submit():
            # start THIS frame's h2d only after the previous frame's fused
            # dispatch is on the wire: the tunnel is one serialized channel,
            # and image bytes submitted first make the (tiny) dispatch RPC
            # queue behind ~8 ms of upload while the device idles — the
            # upload then rides during the compute instead (PERF_NOTES).
            slot.append(self._uploader.submit(pair))

        prev_up = self._up_pending
        if prev_up is not None:
            self._fuse_compute(prev_up, on_enqueued=_submit)
        if not slot:
            _submit()
        self._up_pending = (self.frame_idx, timestamp, slot[0])
        return self._completed.popleft() if self._completed else None

    def _track_stereo_fused_chunk(self, il, ir, timestamp: float) -> Optional[FrameResult]:
        """Chunked fused ingest: buffer C frames, then ship them as ONE
        (C, 2, H, W) upload + ONE scan dispatch (pipeline.fused_stereo_chunk).
        Same upload-after-dispatch ordering and in-flight queue as the
        single-frame path; results lag up to two chunks."""
        self._chunk_buf.append((self.frame_idx, timestamp, il, ir))
        if len(self._chunk_buf) < self._chunk_size():
            return self._completed.popleft() if self._completed else None
        buf, self._chunk_buf = self._chunk_buf, []
        idxs = [b[0] for b in buf]
        tss = [b[1] for b in buf]
        if self._use_semidirect():
            # [L0, R0, L1, ..., L_{C-1}]: anchor pair + follower LEFT images
            # (inter frames never make keyframes, so their right-camera
            # bytes never cross the tunnel)
            frames = np.ascontiguousarray(
                np.stack([buf[0][2], buf[0][3]] + [b[2] for b in buf[1:]])
            )
            host_pairs = [(b[2], b[3]) for b in buf]
        else:
            frames = np.ascontiguousarray(
                np.stack([np.stack([b[2], b[3]]) for b in buf])
            )
            host_pairs = None
        slot = []

        def _submit():
            slot.append(self._uploader.submit(frames))

        prev_up = self._up_pending
        if prev_up is not None:
            self._chunk_compute(prev_up, on_enqueued=_submit)
        if not slot:
            _submit()
        self._up_pending = (idxs, tss, slot[0], host_pairs)
        return self._completed.popleft() if self._completed else None

    def _chunk_compute(self, up, on_enqueued=None):
        """Enqueue the chunk scan program for an uploaded (C, 2, H, W) chunk
        and append one per-frame view entry per frame to the in-flight
        queue; then resolve everything older than the current chunk."""
        from tpuslam.frontend.pipeline import fused_stereo_chunk

        if self._use_semidirect():
            return self._semidirect_compute(up, on_enqueued=on_enqueued)
        idxs, tss, handle = up[:3]
        (pairs_dev,) = handle.get()
        # a pending keyframe whose d2h has had enough wall time lands NOW,
        # before the local-map snapshot: the chunk dispatched below then
        # matches against the newest map (one chunk less staleness)
        self._finish_pending_kf(force=False)
        if self._dev_chain is None:
            T_last = np.asarray(self.T_cw, np.float32)
            vel_inv = np.linalg.inv(self.velocity).astype(np.float32)
            self._dev_chain = (jnp.asarray(T_last), jnp.asarray(vel_inv @ T_last))
        local = self._local_map_arrays()
        lids_snap = self._local_ids.copy()
        lvalid_snap = self._local_valid.copy()
        out = fused_stereo_chunk(
            pairs_dev,
            self._dev_chain[0],
            self._dev_chain[1],
            local,
            float(self.cam.fx * self.cam.baseline),
            self.cam,
            self.cfg.frontend,
            self.cfg.search_coarse,
            self.cfg.search_fine,
            self.cfg.pose_opt,
            self.cfg.min_track_inliers,
            sd=self._direct_lines(),
        )
        self._dev_chain = (out.T_last, out.T_prevlast)
        try:
            out.packed.copy_to_host_async()
        except Exception:
            pass
        if on_enqueued is not None:
            on_enqueued()  # next chunk's upload rides during this compute
        cache: dict = {}
        for i, (fidx, fts) in enumerate(zip(idxs, tss)):
            if fidx < 0:  # flush padding: device computes it, host discards
                continue
            self._fuse_queue.append(
                (fidx, fts, _ChunkFrameView(out, i, cache),
                 lids_snap, lvalid_snap, None, None)
            )
        # resolve everything from PREVIOUS chunks (their d2h has been in
        # flight for a whole chunk); never the chunk just dispatched — its
        # packed resolve would block on the entire chunk's compute
        while (
            len(self._fuse_queue) > max(self._chunk_size(), self.cfg.fuse_lag)
            and self.state == TrackingState.OK
        ):
            self._resolve_fused_one()
        if self.state != TrackingState.OK:
            self._relocalize_inflight()

    def _semidirect_compute(self, up, on_enqueued=None):
        """Enqueue the semi-direct chunk program for an uploaded
        (C+1, H, W) frame stack (anchor pair + follower left images) and
        queue one `_SemiFrameView` per frame; then resolve older chunks."""
        from tpuslam.frontend.pipeline import fused_stereo_semidirect

        import time as _time

        idxs, tss, handle, host_pairs = up
        _t0 = _time.perf_counter()
        (frames_dev,) = handle.get()
        if self.timer is not None:  # wait for the prev chunk's h2d to land
            self.timer.add("ck.upwait", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        self._finish_pending_kf(force=False)  # newest map before the snapshot
        if self._dev_chain is None:
            T_last = np.asarray(self.T_cw, np.float32)
            vel_inv = np.linalg.inv(self.velocity).astype(np.float32)
            self._dev_chain = (jnp.asarray(T_last), jnp.asarray(vel_inv @ T_last))
        local = self._local_map_arrays()
        lids_snap = self._local_ids.copy()
        lvalid_snap = self._local_valid.copy()
        if self.timer is not None:  # pending-KF land + local-map snapshot
            self.timer.add("ck.prep", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        hybrid = self.cfg.points is not None
        plids_snap = plvalid_snap = None
        if hybrid:
            from tpuslam.frontend.pipeline import fused_stereo_semidirect_hybrid

            plocal = self._point_local_arrays()
            plids_snap = self._plocal_ids.copy()
            plvalid_snap = self._plocal_valid.copy()
            out = fused_stereo_semidirect_hybrid(
                frames_dev,
                self._dev_chain[0],
                self._dev_chain[1],
                local,
                plocal,
                float(self.cam.fx * self.cam.baseline),
                self.cam,
                self.cfg.frontend,
                self.cfg.search_coarse,
                self.cfg.search_fine,
                self.cfg.pose_opt,
                self.cfg.min_track_inliers,
                sd=self._direct_lines(),
                sdp=self._direct_points(),
                pp=self.cfg.points,
                ap=self._align_params(),
            )
        else:
            out = fused_stereo_semidirect(
                frames_dev,
                self._dev_chain[0],
                self._dev_chain[1],
                local,
                float(self.cam.fx * self.cam.baseline),
                self.cam,
                self.cfg.frontend,
                self.cfg.search_coarse,
                self.cfg.search_fine,
                self.cfg.pose_opt,
                self.cfg.min_track_inliers,
                sd=self._direct_lines(),
                ap=self._align_params(),
            )
        self._dev_chain = (out.T_last, out.T_prevlast)
        try:
            # only the packed rows ride eagerly: the anchor's feature/match
            # arrays are needed only on KF events, and _kf_begin starts
            # their d2h then (deferred finish rides it 1-2 resolves)
            out.packed.copy_to_host_async()
            if hybrid:
                out.p_match_idx.copy_to_host_async()
                out.p_inlier.copy_to_host_async()
        except Exception:
            pass
        if on_enqueued is not None:
            on_enqueued()  # next chunk's upload rides during this compute
        if self.timer is not None:  # async program dispatch (trace+enqueue)
            self.timer.add("ck.dispatch", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        cache: dict = {}
        for i, (fidx, fts) in enumerate(zip(idxs, tss)):
            if fidx < 0:  # flush padding: device computes it, host discards
                continue
            view = _SemiFrameView(
                out, i, cache, tracker=self,
                host_pair=None if i == 0 else host_pairs[i],
            )
            self._fuse_queue.append(
                (fidx, fts, view, lids_snap, lvalid_snap,
                 plids_snap, plvalid_snap)
            )
        while (
            len(self._fuse_queue) > max(self._chunk_size(), self.cfg.fuse_lag)
            and self.state == TrackingState.OK
        ):
            self._resolve_fused_one()
        if self.timer is not None:  # host resolve of the previous chunk
            self.timer.add("ck.resolve", _time.perf_counter() - _t0)
        if self.state != TrackingState.OK:
            self._relocalize_inflight()

    def _fuse_compute(self, up, on_enqueued=None):
        """Enqueue the fused frame program for an uploaded frame, then
        resolve the previous fused frame (its d2h overlaps this compute)."""
        from tpuslam.frontend.pipeline import (
            fused_stereo_frame,
            fused_stereo_frame_hybrid,
        )

        pidx, pts, handle = up
        (pair_dev,) = handle.get()
        self._finish_pending_kf(force=False)  # newest map before the snapshot
        if self._dev_chain is None:
            T_last = np.asarray(self.T_cw, np.float32)
            vel_inv = np.linalg.inv(self.velocity).astype(np.float32)
            self._dev_chain = (
                jnp.asarray(T_last),
                jnp.asarray(vel_inv @ T_last),
            )
        local = self._local_map_arrays()
        # snapshot the landmark ids THIS program matches against (the
        # resolve, fuse_lag frames later, binds observations through them)
        lids_snap = self._local_ids.copy()
        lvalid_snap = self._local_valid.copy()
        plids_snap = plvalid_snap = None
        hybrid = self.cfg.points is not None
        if hybrid:
            plocal = self._point_local_arrays()
            plids_snap = self._plocal_ids.copy()
            plvalid_snap = self._plocal_valid.copy()
            out = fused_stereo_frame_hybrid(
                pair_dev,
                self._dev_chain[0],
                self._dev_chain[1],
                local,
                plocal,
                float(self.cam.fx * self.cam.baseline),
                self.cam,
                self.cfg.frontend,
                self._direct_lines(),
                self._direct_points(),
                self.cfg.points,
                self.cfg.search_coarse,
                self.cfg.search_fine,
                self.cfg.pose_opt,
                self.cfg.min_track_inliers,
            )
        else:
            out = fused_stereo_frame(
                pair_dev,
                self._dev_chain[0],
                self._dev_chain[1],
                local,
                float(self.cam.fx * self.cam.baseline),
                self.cam,
                self.cfg.frontend,
                self.cfg.stereo,
                self.cfg.search_coarse,
                self.cfg.search_fine,
                self.cfg.pose_opt,
                self.cfg.min_track_inliers,
                sd=self._direct_lines(),
            )
        self._dev_chain = (out.T_last, out.T_prevlast)
        # start the d2h of THIS frame's host-visible scalars now, so the
        # resolve one frame from now finds the bytes already on host: a
        # synchronous resolve pays a full ~24 ms tunnel round trip that no
        # pipelining depth hides (probe_direct.py lag sweep: sync 33 ms/frame
        # at any lag vs 14 ms with the copy started at enqueue)
        try:
            out.packed.copy_to_host_async()
            if hybrid:
                out.p_match_idx.copy_to_host_async()
                out.p_inlier.copy_to_host_async()
        except Exception:
            pass  # backend without async d2h: resolve stays synchronous
        if on_enqueued is not None:
            on_enqueued()  # next frame's upload rides during this compute
        self._fuse_queue.append(
            (pidx, pts, out, lids_snap, lvalid_snap, plids_snap, plvalid_snap)
        )
        while (
            len(self._fuse_queue) > max(1, self.cfg.fuse_lag)
            and self.state == TrackingState.OK
        ):
            self._resolve_fused_one()
        if self.state != TrackingState.OK:
            self._relocalize_inflight()

    def _relocalize_inflight(self):
        """A resolve declared LOST: every still-in-flight fused frame tracked
        a poisoned pose chain — its track output is garbage. Complete each by
        relocalizing on its (pose-independent) extracted features, in order."""
        self._finish_pending_kf()  # relocalization needs the map complete
        self._dev_chain = None
        q, self._fuse_queue = list(self._fuse_queue), deque()
        saved = self.frame_idx
        for qidx, qts, qout, _, _, _, _ in q:
            self.frame_idx = qidx
            if qout.pfeats is not None:
                self._cur_pfeats = qout.pfeats
                self._cur_p_match = None
            r = self._track_frame_sync(qout.feats, qts, stereo=True, relocalize=True)
            self._completed.append(r)
        self.frame_idx = saved

    def _resolve_fused(self):
        """Drain every in-flight fused frame (pipeline flush)."""
        while self._fuse_queue and self.state == TrackingState.OK:
            self._resolve_fused_one()
        if self._fuse_queue:
            self._relocalize_inflight()

    def _resolve_fused_one(self):
        if not self._fuse_queue:
            return
        if self._pending_kf is not None:
            import time as _t_

            _tf = _t_.perf_counter()
            self._finish_pending_kf(force=False)
            if self.timer is not None:
                self.timer.add("ck.rs_fin", _t_.perf_counter() - _tf)
        fidx, fts, out, lids, lvalid, plids, plvalid = self._fuse_queue.popleft()
        import time as _time

        _t0 = _time.perf_counter()
        packed = np.asarray(out.packed)  # blocks on the chunk's d2h once
        if self.timer is not None:
            self.timer.add("ck.packed_wait", _time.perf_counter() - _t0)
        _t_body = _time.perf_counter()
        n_matches = int(packed[16])
        n_inliers = int(packed[17])
        self._n_depth_cache = int(packed[18])
        accepted = packed[19] > 0.5
        hybrid = out.pfeats is not None
        p_match = None
        if hybrid:
            p_match = (np.asarray(out.p_match_idx), np.asarray(out.p_inlier))
        made_kf = False
        if not accepted:
            # a deferred keyframe must land before any fallback matches
            # against the reference window / relocalizes against the map
            self._finish_pending_kf()
            # TrackReferenceKeyFrame fallback on the already-extracted feats
            _t0 = _time.perf_counter()
            alt = self._track_reference_keyframe(out.feats)
            if self.timer is not None:
                self.timer.add("ck.fallback", _time.perf_counter() - _t0)
            if alt is not None:
                n_matches = int(alt.num_matched)
                n_inliers = int(alt.num_inliers)
                out = out._replace(match_idx=alt.match_idx, inlier=alt.inlier)
                packed = packed.copy()
                packed[:16] = np.asarray(alt.pose).reshape(-1)
                accepted = True
                lids = self._local_ids.copy()
                lvalid = self._local_valid.copy()
                # the fused point matches were gated around the failed
                # motion-model pose — drop them (new points still created)
                p_match = None
                self._dev_chain = None  # chain no longer matches host pose
        if accepted:
            self.state = TrackingState.OK
            new_T = packed[:16].reshape(4, 4).astype(np.float32)
            if self.last_T_cw is not None:
                self.velocity = (new_T @ np.linalg.inv(self.last_T_cw)).astype(np.float32)
            self.last_T_cw = new_T
            self.T_cw = new_T
            saved = self.frame_idx
            self.frame_idx = fidx
            # feats=None: _n_depth_cache was set from packed[18] above, so
            # the KF policy never needs the feature arrays here — touching
            # out.feats on a chunk view would materialize the whole chunk.
            # Semi-direct INTER frames never become keyframes (they carry no
            # detected features or depths; the next anchor, at most C-1
            # frames away, takes the decision instead)
            if not getattr(out, "inter", False) and self._need_new_keyframe(
                n_inliers, None, stereo=True
            ):
                fine = TrackStepResult(
                    pose=new_T,
                    match_idx=out.match_idx,
                    inlier=out.inlier,
                    num_matched=n_matches,
                    num_inliers=n_inliers,
                )
                if hybrid:
                    # _kf_begin snapshots _cur_pfeats/_cur_p_match/_plocal_*
                    # — point them at THIS frame's state (2-frame result lag)
                    self._cur_pfeats = out.pfeats
                    self._cur_p_match = p_match
                    if p_match is not None:
                        self._plocal_ids = plids
                        self._plocal_valid = plvalid
                # begin the keyframe but DON'T block on its d2h: the bytes
                # ride the tunnel while 1-2 more frames track; the map insert
                # happens at a later resolve (_finish_pending_kf)
                self._finish_pending_kf()  # at most one KF in flight
                if isinstance(out, _ChunkFrameView):
                    out.start_async()
                    rec = self._kf_begin(
                        None, fts, fine, True, lids, lvalid,
                        feats_thunk=lambda o=out: o.feats, defer_tri=True,
                    )
                else:
                    rec = self._kf_begin(out.feats, fts, fine, True, lids, lvalid)
                self._pending_kf = rec
                made_kf = True
            self.frame_idx = saved
        else:
            # motion-model pose was kept on device; mirror it and go LOST
            self.state = TrackingState.LOST
            self.T_cw = packed[:16].reshape(4, 4).astype(np.float32)
            self.last_T_cw = self.T_cw.copy()
            self.velocity = np.eye(4, dtype=np.float32)
            self._dev_chain = None
        self._completed.append(
            FrameResult(
                fidx, fts, self.T_cw.copy(), self.state, n_matches, n_inliers, made_kf
            )
        )
        if self.timer is not None:  # post-wait host share of one resolve
            self.timer.add("ck.rs_body", _time.perf_counter() - _t_body)

    def _drain_fused(self):
        """Complete all in-flight fused frames (pipeline transition/flush)."""
        self._finish_pending_kf()
        self._resolve_fused()
        if self._up_pending is not None:
            up, self._up_pending = self._up_pending, None
            chunked = isinstance(up[0], list)
            if self.state == TrackingState.OK:
                if chunked:
                    self._chunk_compute(up)
                else:
                    self._fuse_compute(up)
                self._resolve_fused()
            else:
                # chain is poisoned (LOST): extract only, then relocalize
                pidx, pts, handle = up[:3]
                host_pairs = up[3] if len(up) > 3 else None
                if host_pairs is not None:
                    # semi-direct chunk: the upload holds left-only follower
                    # frames — use the kept host image pairs instead
                    handle.get()  # drain the uploader thread
                    pairs = host_pairs
                else:
                    (pair_dev,) = handle.get()
                    pair_h = np.asarray(pair_dev)
                    if not chunked:
                        pair_h, pidx, pts = pair_h[None], [pidx], [pts]
                    pairs = [
                        (pair_h[i, 0], pair_h[i, 1]) for i in range(pair_h.shape[0])
                    ]
                saved = self.frame_idx
                for i, (il_, ir_) in enumerate(pairs):
                    feats = self._stereo_features(il_, ir_)
                    self._refresh_point_features(il_, ir_)
                    self.frame_idx = pidx[i]
                    r = self._track_frame_sync(feats, pts[i], stereo=True, relocalize=True)
                    self._completed.append(r)
                self.frame_idx = saved
        if self._chunk_buf and self.state == TrackingState.OK and self._use_fused():
            # partial chunk at flush: PAD to C by repeating the last frame
            # and ride the already-compiled chunk program — the sync path
            # here cost ~400 ms of first-use compiles + eager dispatches
            # inside the timed drain (r5 loop profile: 10 in-loop
            # backend_compile_and_load calls, all from this branch). Padded
            # indices are tagged fidx=-1; the compute path skips their views
            # so no FrameResult is fabricated for them.
            buf, self._chunk_buf = self._chunk_buf, []
            C = self._chunk_size()
            last = buf[-1]
            buf_p = buf + [(-1, last[1], last[2], last[3])] * (C - len(buf))
            idxs = [b[0] for b in buf_p]
            tss = [b[1] for b in buf_p]
            if self._use_semidirect():
                frames = np.ascontiguousarray(
                    np.stack([buf_p[0][2], buf_p[0][3]] + [b[2] for b in buf_p[1:]])
                )
                host_pairs = [(b[2], b[3]) for b in buf_p]
            else:
                frames = np.ascontiguousarray(
                    np.stack([np.stack([b[2], b[3]]) for b in buf_p])
                )
                host_pairs = None
            if self._uploader is None:
                self._uploader = AsyncUploader()
            up = (idxs, tss, self._uploader.submit(frames), host_pairs)
            self._chunk_compute(up)
            self._resolve_fused()
        elif self._chunk_buf:
            # LOST / non-fused drain: complete the buffered frames through
            # the sync path (no new program shapes, exact same math)
            buf, self._chunk_buf = self._chunk_buf, []
            saved = self.frame_idx
            for fidx, fts, il, ir in buf:
                feats = self._stereo_features(il, ir)
                self._refresh_point_features(il, ir)
                self.frame_idx = fidx
                r = self._track_frame_sync(
                    feats, fts, stereo=True,
                    relocalize=self.state != TrackingState.OK,
                )
                self._completed.append(r)
            self.frame_idx = saved
            self._dev_chain = None  # host poses advanced past the device chain
        self._finish_pending_kf()  # nothing may stay in flight past a drain

    # ---- pipelined mode --------------------------------------------------
    def _track_pipelined(self, feats: FrameFeatures, timestamp: float, stereo: bool):
        """Latency-hiding tracking: the previous frame's track programs are
        resolved only now — AFTER this frame's extraction/stereo dispatches
        were enqueued (track_stereo) — so the previous frame's device
        compute and the relay round trip overlap this frame's front-end.
        Host state, map updates, and keyframe creation then run exactly as
        in synchronous mode before this frame's track dispatch (no stale
        maps, no device-side pose chain). Results lag one frame; call
        flush() at sequence end."""
        prev_result = None
        prev = self._pending
        self._pending = None
        if prev is not None:
            prev_result = prev[1] if prev[0] == "done" else self._resolve_pending(prev[1:])
        if self.state == TrackingState.LOST:
            # relocalize + track this frame synchronously
            r = self._track_frame_sync(feats, timestamp, stereo, relocalize=True)
            self._pending = ("done", r)
            return prev_result  # None on the first call; callers skip it

        T_pred = (
            self.velocity @ self.last_T_cw if self.last_T_cw is not None else self.T_cw
        )
        local = self._local_map_arrays()
        coarse: TrackStepResult = tracked_pose_step(
            jnp.asarray(T_pred), local["plucker"], local["ep3d"], local["bits"],
            local["valid"], feats, self.cam, self.cfg.search_coarse, self.cfg.pose_opt,
        )
        fine: TrackStepResult = tracked_pose_step(
            coarse.pose, local["plucker"], local["ep3d"], local["bits"],
            local["valid"], feats, self.cam, self.cfg.search_fine, self.cfg.pose_opt,
        )
        self._pending = (
            "pending",
            self.frame_idx,
            timestamp,
            feats,
            fine,
            stereo,
            self._local_ids.copy(),
            self._local_valid.copy(),
        )
        # Results lag one frame: the first pipelined call has nothing resolved
        # yet and returns None (no placeholder rows in the trajectory).
        return prev_result

    def _resolve_pending(self, pending) -> FrameResult:
        frame_idx, timestamp, feats, fine, stereo, local_ids, local_valid = pending
        # single d2h transfer for everything the host needs this frame
        packed = np.asarray(fine.packed)
        n_matches = int(packed[16])
        n_inliers = int(packed[17])
        self._n_depth_cache = int(packed[18])
        made_kf = False
        if n_inliers >= self.cfg.min_track_inliers:
            self.state = TrackingState.OK
            new_T = packed[:16].reshape(4, 4).astype(np.float32)
            if self.last_T_cw is not None:
                self.velocity = (new_T @ np.linalg.inv(self.last_T_cw)).astype(np.float32)
            self.last_T_cw = new_T
            self.T_cw = new_T
            # host frame_idx may have advanced; use the pending frame's
            saved = self.frame_idx
            self.frame_idx = frame_idx
            if self._need_new_keyframe(n_inliers, feats, stereo):
                self._create_keyframe(
                    feats, timestamp, fine, stereo, local_ids, local_valid
                )
                made_kf = True
            self.frame_idx = saved
        else:
            self.state = TrackingState.LOST
            self.velocity = np.eye(4, dtype=np.float32)
        return FrameResult(
            frame_idx, timestamp, self.T_cw.copy(), self.state, n_matches, n_inliers, made_kf
        )

    def flush(self) -> Optional[FrameResult]:
        """Resolve the in-flight pipelined frame (call at sequence end)."""
        if self._pending is None:
            return None
        prev, self._pending = self._pending, None
        return prev[1] if prev[0] == "done" else self._resolve_pending(prev[1:])

    def flush_all(self) -> List[FrameResult]:
        """Drain every in-flight frame (classic + fused pipelines)."""
        out: List[FrameResult] = []
        r = self.flush()
        if r is not None:
            out.append(r)
        self._drain_fused()
        out.extend(self.pop_results())
        return out

    def close(self):
        """Stop the upload worker thread (idempotent). Without this every
        Tracker leaks a daemon thread; a full test suite accumulates enough
        of them to destabilize XLA-CPU compiles (round-3 segfault dump
        showed 8 leaked AsyncUploader threads)."""
        if self._uploader is not None:
            self._uploader.close()
            self._uploader = None

    # ---- core ----------------------------------------------------------
    def _track(self, feats: FrameFeatures, timestamp: float, stereo: bool) -> FrameResult:
        if self.state == TrackingState.NOT_INITIALIZED:
            ok = self._initialize(feats, timestamp, stereo)
            return FrameResult(
                self.frame_idx,
                timestamp,
                self.T_cw.copy(),
                self.state,
                made_keyframe=ok,
            )

        if self.cfg.pipelined and self.cfg.points is None:
            return self._track_pipelined(feats, timestamp, stereo)
        return self._track_frame_sync(feats, timestamp, stereo, relocalize=True)

    def _track_frame_sync(
        self, feats: FrameFeatures, timestamp: float, stereo: bool, relocalize: bool
    ) -> FrameResult:
        if self.state == TrackingState.LOST:
            reloc = self._relocalize(feats) if relocalize else None
            if reloc is None:
                return FrameResult(
                    self.frame_idx, timestamp, self.T_cw.copy(), TrackingState.LOST
                )
            self.T_cw = reloc
            self.last_T_cw = reloc.copy()
            self.velocity = np.eye(4, dtype=np.float32)

        T_pred = (
            self.velocity @ self.last_T_cw
            if self.last_T_cw is not None
            else self.T_cw
        )

        local = self._local_map_arrays()
        if self._cur_pfeats is not None:
            fine = self._track_hybrid_stages(jnp.asarray(T_pred), local, feats)
        else:
            coarse: TrackStepResult = tracked_pose_step(
                jnp.asarray(T_pred),
                local["plucker"],
                local["ep3d"],
                local["bits"],
                local["valid"],
                feats,
                self.cam,
                self.cfg.search_coarse,
                self.cfg.pose_opt,
            )
            fine = tracked_pose_step(
                coarse.pose,
                local["plucker"],
                local["ep3d"],
                local["bits"],
                local["valid"],
                feats,
                self.cam,
                self.cfg.search_fine,
                self.cfg.pose_opt,
            )
        n_matches = int(fine.num_matched)
        n_inliers = int(fine.num_inliers)

        if n_inliers < self.cfg.min_track_inliers:
            # TrackReferenceKeyFrame fallback (SURVEY §4.2): one bad frame
            # (blur, dropped frame, wrong motion model) should not cost a
            # LOST -> relocalization round trip; try a descriptor-only match
            # against the reference keyframe's window first.
            alt = self._track_reference_keyframe(feats)
            if alt is not None:
                fine = alt
                n_matches = int(fine.num_matched)
                n_inliers = int(fine.num_inliers)

        if n_inliers >= self.cfg.min_track_inliers:
            self.state = TrackingState.OK
            new_T = np.asarray(fine.pose)
            if self.last_T_cw is not None:
                self.velocity = (new_T @ np.linalg.inv(self.last_T_cw)).astype(np.float32)
            self.last_T_cw = new_T
            self.T_cw = new_T
        else:
            # tracking failure: keep motion-model pose, flag LOST
            self.state = TrackingState.LOST
            self.T_cw = np.asarray(T_pred, np.float32)
            self.last_T_cw = self.T_cw
            self.velocity = np.eye(4, dtype=np.float32)

        made_kf = False
        if self.state == TrackingState.OK and self._need_new_keyframe(n_inliers, feats, stereo):
            self._create_keyframe(feats, timestamp, fine, stereo)
            made_kf = True

        return FrameResult(
            self.frame_idx,
            timestamp,
            self.T_cw.copy(),
            self.state,
            n_matches,
            n_inliers,
            made_kf,
        )

    # ---- hybrid point+line stages ---------------------------------------
    def _track_hybrid_stages(self, T_pred, local, feats: FrameFeatures) -> TrackStepResult:
        """Coarse + fine hybrid steps (lines AND points in one pose LM).

        Returns the line view as a TrackStepResult (KF creation binds lines
        through it) and stashes the point matches in `_cur_p_match`.
        num_matched/num_inliers are the COMBINED counts — the acceptance and
        keyframe-policy thresholds see the full constraint budget, as the
        reference's hybrid tracking does.
        """
        plocal = self._point_local_arrays()
        pf = self._cur_pfeats
        coarse: HybridTrackResult = tracked_pose_step_hybrid(
            T_pred, local, plocal, feats, pf, self.cam,
            self.cfg.search_coarse, self.cfg.points, self.cfg.pose_opt,
        )
        fine: HybridTrackResult = tracked_pose_step_hybrid(
            coarse.pose, local, plocal, feats, pf, self.cam,
            self.cfg.search_fine, self.cfg.points, self.cfg.pose_opt,
        )
        packed = np.asarray(fine.packed)
        self._cur_p_match = (np.asarray(fine.p_match_idx), np.asarray(fine.p_inlier))
        return TrackStepResult(
            pose=packed[:16].reshape(4, 4).astype(np.float32),
            match_idx=fine.l_match_idx,
            inlier=fine.l_inlier,
            num_matched=int(packed[16]),
            num_inliers=int(packed[17]),
        )

    def _point_local_arrays(self):
        if not self._plocal_dirty and hasattr(self, "_plocal_dev"):
            return self._plocal_dev
        NP_ = self.cfg.point_local_capacity
        pids: List[int] = []
        if self.ref_kf is not None and self.ref_kf in self.map.keyframes:
            window = [self.ref_kf] + self.map.covisible_keyframes(
                self.ref_kf, n=self.cfg.local_window_kfs - 1
            )
            pids = self.map.window_point_ids(window)
        pids = [p for p in pids if self.map.points.alive[p]][:NP_]
        n = len(pids)
        ids = np.zeros(NP_, np.int32)
        ids[:n] = pids
        valid = np.zeros(NP_, np.float32)
        valid[:n] = 1.0
        self._plocal_ids = ids
        self._plocal_valid = valid > 0.5
        st = self.map.points
        # single-upload + device unpack (see _local_map_arrays)
        bits = st.desc_bits[ids]
        buf = np.concatenate(
            [
                st.xyz[ids].astype(np.float32),
                (bits & 0xFFFF).astype(np.float32),
                (bits >> 16).astype(np.float32),
                valid[:, None],
            ],
            axis=1,
        )
        self._plocal_dev = _unpack_plocal_jit(jnp.asarray(buf))
        self._plocal_dirty = False
        return self._plocal_dev

    def _point_arrays_for_window(self, kid: int):
        """Point-landmark device arrays for an arbitrary keyframe's window
        (relocalization candidates; `_point_local_arrays` covers the current
        reference window and keeps its cache)."""
        NP_ = self.cfg.point_local_capacity
        window = [kid] + self.map.covisible_keyframes(
            kid, n=self.cfg.local_window_kfs - 1
        )
        pids = [
            p for p in self.map.window_point_ids(window) if self.map.points.alive[p]
        ][:NP_]
        ids = np.zeros(NP_, np.int32)
        ids[: len(pids)] = pids
        valid = np.zeros(NP_, np.float32)
        valid[: len(pids)] = 1.0
        st = self.map.points
        return dict(
            xyz=jnp.asarray(st.xyz[ids]),
            bits=jnp.asarray(st.desc_bits[ids]),
            valid=jnp.asarray(valid),
        )

    def _bind_point_landmarks(
        self,
        kf: KeyFrame,
        stereo: bool = True,
        pre=None,
        pf=None,
        p_match=None,
        plids=None,
        plvalid=None,
    ):
        """KF creation, point half: bind tracked point inliers and (stereo)
        create new landmarks from unmatched stereo-depth corners. Mono KFs
        bind tracked inliers only — new mono points come from two-view
        triangulation in the mapper (SURVEY §4.3 CreateNewMapPoints).

        `pre`: optional already-resolved (xyz, okf) stereo point
        triangulation (resolved alongside everything else in the keyframe's
        single overlapped d2h). The point-frontend state (`pf`, `p_match`,
        `plids`, `plvalid`) defaults to the tracker's current-frame fields;
        a deferred keyframe finish passes its begin-time snapshots instead."""
        if pf is None:
            pf = self._cur_pfeats
            p_match = self._cur_p_match
            plids, plvalid = self._plocal_ids, self._plocal_valid
        if pf is None or kf.point_ids is None:
            return
        if p_match is not None:
            p_idx, p_inl = p_match
            for i in np.nonzero((p_inl > 0.5) & (p_idx >= 0))[0]:
                pid = int(plids[i])
                if plvalid[i] and self.map.points.alive[pid]:
                    slot = int(p_idx[i])
                    if kf.point_ids[slot] < 0:
                        self.map.points.add_observation(pid, kf, slot)
        if not stereo:
            return
        if pre is not None:
            xyz, okf = pre
        else:
            xyz, okf = triangulate_stereo_points(
                jnp.asarray(np.linalg.inv(self.T_cw)), pf, self.cam
            )
        ok = (np.asarray(okf) > 0.5) & (kf.point_ids < 0)
        xyz = np.asarray(xyz)
        bits = np.asarray(kf.point_features.desc_bits)
        for slot in np.nonzero(ok)[0]:
            pid = self.map.points.allocate(xyz[slot], bits[slot], kf.kid)
            self.map.points.add_observation(pid, kf, int(slot))

    # ---- initialization -------------------------------------------------
    def _initialize(self, feats: FrameFeatures, timestamp: float, stereo: bool) -> bool:
        if not stereo:
            return self._initialize_mono(feats, timestamp)
        plucker, ep3d, ok = triangulate_stereo_lines(
            jnp.asarray(np.linalg.inv(self.T_cw)), feats, self.cam
        )
        ok = np.asarray(ok) > 0.5
        if ok.sum() < self.cfg.min_init_lines:
            return False
        kf = self.map.new_keyframe(
            self.frame_idx, timestamp, self.T_cw, feats,
            point_features=self._cur_pfeats,
        )
        self._bind_new_landmarks(kf, np.asarray(plucker), np.asarray(ep3d), ok)
        self._cur_p_match = None  # no tracked points at init
        self._bind_point_landmarks(kf)
        self.map.update_connections(kf)
        self.ref_kf = kf.kid
        self.ref_tracked = int(ok.sum()) + (
            int(np.sum(kf.point_ids >= 0)) if kf.point_ids is not None else 0
        )
        self.last_kf_frame = self.frame_idx
        self.last_T_cw = self.T_cw.copy()
        self.state = TrackingState.OK
        self._local_dirty = True
        self._plocal_dirty = True
        if self.on_new_keyframe:
            self.on_new_keyframe(kf)
        return True

    def _initialize_mono(self, feats: FrameFeatures, timestamp: float) -> bool:
        from tpuslam.frontend.initializer import MonoInitializer

        if not hasattr(self, "_mono_init"):
            self._mono_init = MonoInitializer(self.cam)
        result = self._mono_init.try_initialize(
            feats, timestamp, self.frame_idx, aux=self._cur_pfeats
        )
        if result is None:
            return False
        (f0, t0, idx0, T1, plucker, ep3d, ok0, slots0, slots1) = result
        kf0 = self.map.new_keyframe(
            idx0, t0, np.eye(4, dtype=np.float32), f0,
            point_features=self._mono_init.ref_aux,
        )
        kf1 = self.map.new_keyframe(
            self.frame_idx, timestamp, T1, feats,
            point_features=self._cur_pfeats,
        )
        for i in range(len(ok0)):
            if not ok0[i]:
                continue
            lid = self.map.lines.allocate(
                plucker[i], ep3d[i], np.asarray(f0.desc_bits)[slots0[i]], kf0.kid
            )
            self.map.lines.add_observation(lid, kf0, int(slots0[i]))
            self.map.lines.add_observation(lid, kf1, int(slots1[i]))
        # hybrid bootstrap: corner triangulations from the same 2-view solve
        ip = getattr(self._mono_init, "init_points", None)
        if ip is not None and kf0.point_ids is not None and kf1.point_ids is not None:
            p_xyz, p_ok, ps0, ps1 = ip
            pst = self.map.points
            bits0 = np.asarray(kf0.point_features.desc_bits)
            for i in np.nonzero(p_ok)[0]:
                pid = pst.allocate(p_xyz[i], bits0[ps0[i]], kf0.kid)
                pst.add_observation(pid, kf0, int(ps0[i]))
                pst.add_observation(pid, kf1, int(ps1[i]))
            self._mono_init.init_points = None  # consumed; never reuse stale
        self.map.update_connections(kf0)
        self.map.update_connections(kf1)
        self.T_cw = T1.copy()
        self.last_T_cw = T1.copy()
        self.ref_kf = kf1.kid
        self.ref_tracked = int(ok0.sum()) + (
            int(ip[1].sum()) if ip is not None else 0
        )
        self.last_kf_frame = self.frame_idx
        self.state = TrackingState.OK
        self._local_dirty = True
        self._plocal_dirty = True
        if self.on_new_keyframe:
            self.on_new_keyframe(kf0)
            self.on_new_keyframe(kf1)
        return True

    # ---- keyframes ------------------------------------------------------
    def _need_new_keyframe(self, n_inliers: int, feats: FrameFeatures, stereo: bool) -> bool:
        since = self.frame_idx - self.last_kf_frame
        if since < max(1, self.cfg.min_frames_between_kf):
            return False
        if since >= self.cfg.max_frames_between_kf:
            return True
        weak = n_inliers < self.cfg.kf_tracked_ratio * max(self.ref_tracked, 1)
        if stereo:
            n_depth = getattr(self, "_n_depth_cache", None)
            if n_depth is None:
                # feats may be None only when the cache is guaranteed set
                # (fused resolve packs the depth count into packed[18])
                n_depth = int(np.asarray(feats.has_depth).sum())
            self._n_depth_cache = None
            return weak or (
                n_inliers < self.cfg.min_new_kf_lines and n_depth > n_inliers + 10
            )
        return weak

    def _create_keyframe(
        self,
        feats: FrameFeatures,
        timestamp: float,
        fine: TrackStepResult,
        stereo: bool,
        local_ids: np.ndarray | None = None,
        local_valid: np.ndarray | None = None,
    ):
        """Synchronous keyframe creation (sync / classic-pipelined paths)."""
        self._finish_pending_kf()  # keep map keyframes in frame order
        rec = self._kf_begin(feats, timestamp, fine, stereo, local_ids, local_valid)
        self._kf_finish(rec)

    def _kf_begin(
        self,
        feats,
        timestamp: float,
        fine: TrackStepResult,
        stereo: bool,
        local_ids=None,
        local_valid=None,
        feats_thunk=None,
        defer_tri: bool = False,
    ) -> dict:
        """Dispatch the keyframe's device work (stereo line + point
        triangulation) and START the d2h of everything the host-side finish
        needs — match arrays, feature structs, triangulations — without
        waiting for any of it. Each serial resolve is a ~24-34 ms tunnel
        round trip (probe_kf2.py); `_kf_finish` 1-2 frames later finds the
        bytes already on host. `defer_tri=True` (chunked ingest, where
        `feats` is a host-side chunk view) postpones the triangulation
        dispatch to the finish."""
        import time as _time

        _t0 = _time.perf_counter()
        if local_ids is None:
            local_ids = self._local_ids
            local_valid = self._local_valid
        pf = self._cur_pfeats
        tri = ptri = payload = None
        if stereo and not defer_tri:
            T_wc = jnp.asarray(np.linalg.inv(self.T_cw))
            tri = triangulate_stereo_lines(T_wc, feats, self.cam)
            if pf is not None:
                ptri = triangulate_stereo_points(T_wc, pf, self.cam)
            # the whole host payload rides as ONE flat device vector with ONE
            # async d2h: per-leaf copy_to_host_async starts are each a wire
            # round trip on the tunnel (~12 leaves ~= 32 ms/KF, kf_pack.py).
            # Only when the features are device-resident (the fused /
            # semi-direct hot path) — packing host-side numpy features (sync
            # path) would upload them just to download them again.
            if hasattr(getattr(feats, "endpoints", None), "copy_to_host_async"):
                payload = pack_payload(
                    (fine.match_idx, fine.inlier, tuple(feats),
                     None if pf is None else tuple(pf), tri, ptri)
                )
            else:
                for leaf in jax.tree_util.tree_leaves(
                    (fine.match_idx, fine.inlier, tri, ptri)
                ):
                    if hasattr(leaf, "copy_to_host_async"):
                        try:
                            leaf.copy_to_host_async()
                        except Exception:
                            pass
        self.last_kf_frame = self.frame_idx  # gate the KF cadence immediately
        if self.timer is not None:
            self.timer.add("kf_begin", _time.perf_counter() - _t0)
        return dict(
            t_begin=_time.perf_counter(),
            fidx=self.frame_idx,
            ts=timestamp,
            T_cw=self.T_cw.copy(),
            stereo=stereo,
            feats=feats,
            feats_thunk=feats_thunk,
            pf=pf,
            fine=fine,
            tri=tri,
            ptri=ptri,
            payload=payload,
            lids=np.asarray(local_ids).copy(),
            lvalid=np.asarray(local_valid).copy(),
            p_match=self._cur_p_match,
            plids=np.asarray(self._plocal_ids).copy(),
            plvalid=np.asarray(self._plocal_valid).copy(),
        )

    def _finish_pending_kf(self, force: bool = True):
        rec = self._pending_kf
        if rec is None:
            return
        if not force:
            # time-based deferral: the begin-time d2h needs ~RTT + transfer
            # (~35 ms on the tunnel) before a resolve stops blocking. Resolve
            # counts are a bad clock — chunked modes run C resolves back to
            # back in one host loop microseconds apart. Checking at each
            # compute/resolve event, the first one past the deadline
            # finishes; CPU runs (tests) pass the deadline within a frame,
            # so map-insert timing there matches the synchronous path.
            import time as _time

            if (_time.perf_counter() - rec["t_begin"]) < self._kf_defer_s:
                return  # let the d2h ride the tunnel a little longer
        self._pending_kf = None
        self._kf_finish(rec)

    def _kf_finish(self, rec: dict):
        """Host half of keyframe creation: resolve the begin-time d2h, insert
        the KeyFrame, bind observations, allocate new landmarks, update the
        covisibility graph, and fire on_new_keyframe (mapper/loop closer)."""
        import time as _time

        _t0 = _time.perf_counter()
        feats = rec["feats"]
        if feats is None:
            feats = rec["feats_thunk"]()  # chunked path: whole-chunk view
        pf, fine = rec["pf"], rec["fine"]
        tri, ptri = rec["tri"], rec["ptri"]
        if rec.get("payload") is not None:
            # single-buffer unpack: blocks on the ONE d2h started at begin
            match_idx, inlier, feats_np, pf_np, tri, ptri = rec["payload"].unpack()
        else:
            if rec["stereo"] and tri is None:  # deferred (chunked) triangulation
                T_wc = jnp.asarray(np.linalg.inv(rec["T_cw"]))
                tri = triangulate_stereo_lines(T_wc, feats, self.cam)
                if pf is not None:
                    ptri = triangulate_stereo_points(T_wc, pf, self.cam)
            match_idx, inlier, feats_np, pf_np, tri, ptri = jax.device_get(
                (fine.match_idx, fine.inlier, tuple(feats),
                 None if pf is None else tuple(pf), tri, ptri)
            )
        if self.timer is not None:  # d2h-resolve share of the KF event
            self.timer.add("kf_resolve", _time.perf_counter() - _t0)
            _t0 = _time.perf_counter()
        feats_np = type(feats)(*[np.asarray(x) for x in feats_np])
        if pf_np is not None:
            pf_np = type(pf)(*[np.asarray(x) for x in pf_np])
        kf = self.map.new_keyframe(
            rec["fidx"], rec["ts"], rec["T_cw"], feats_np,
            point_features=pf_np,
        )
        # hand the mapper the device-resident feature structs (its fusion
        # dispatch otherwise re-uploads ~50 KB the device already holds);
        # chunk views resolve to numpy, so gate on an actual device leaf
        if hasattr(getattr(feats, "endpoints", None), "copy_to_host_async"):
            kf.dev_features = feats
        if pf is not None and hasattr(getattr(pf, "uv", None), "copy_to_host_async"):
            kf.dev_point_features = pf
        # bind tracked landmarks: local slot i -> frame slot fine.match_idx[i]
        match_idx = np.asarray(match_idx)
        inlier = np.asarray(inlier) > 0.5
        lids, lvalid = rec["lids"], rec["lvalid"]
        for i in np.nonzero(inlier & (match_idx >= 0))[0]:
            lid = int(lids[i])
            if lvalid[i] and self.map.lines.alive[lid]:
                slot = int(match_idx[i])
                if kf.line_ids[slot] < 0:
                    self.map.lines.add_observation(lid, kf, slot)
        if rec["stereo"]:
            # create new landmarks from unmatched stereo-depth features
            plucker, ep3d, ok = tri
            ok = (np.asarray(ok) > 0.5) & (kf.line_ids < 0)
            self._bind_new_landmarks(kf, np.asarray(plucker), np.asarray(ep3d), ok)
        if pf is not None:  # explicit snapshots — never the CURRENT frame's
            self._bind_point_landmarks(
                kf, stereo=rec["stereo"], pre=ptri, pf=pf,
                p_match=rec["p_match"], plids=rec["plids"], plvalid=rec["plvalid"],
            )
        self.map.update_connections(kf)
        self.ref_kf = kf.kid
        self.ref_tracked = max(
            int(np.sum(kf.line_ids >= 0))
            + (int(np.sum(kf.point_ids >= 0)) if kf.point_ids is not None else 0),
            1,
        )
        self.last_kf_frame = max(self.last_kf_frame, rec["fidx"])
        self._local_dirty = True
        self._plocal_dirty = True
        if self.timer is not None:  # host map-insert share of the KF event
            self.timer.add("kf_insert", _time.perf_counter() - _t0)
        if self.on_new_keyframe:
            self.on_new_keyframe(kf)

    def _bind_new_landmarks(self, kf: KeyFrame, plucker, ep3d, ok: np.ndarray):
        bits = np.asarray(kf.features.desc_bits)
        for slot in np.nonzero(ok)[0]:
            lid = self.map.lines.allocate(plucker[slot], ep3d[slot], bits[slot], kf.kid)
            self.map.lines.add_observation(lid, kf, int(slot))

    # ---- reference-keyframe fallback -------------------------------------
    def _track_reference_keyframe(self, feats: FrameFeatures):
        """SURVEY §4.2 TrackReferenceKeyFrame(): descriptor matching (no
        projection gate) against the reference keyframe's local window,
        pose-LM seeded from the LAST pose instead of the failed motion-model
        prediction. Returns a TrackStepResult on success, else None."""
        if self.ref_kf is None or self.ref_kf not in self.map.keyframes:
            return None
        st = self.map.lines
        _, lids = self.map.local_window(self.ref_kf, 5)
        lids = [l for l in lids if st.alive[l]][: self.cfg.local_capacity]
        if len(lids) < self.cfg.min_track_inliers:
            return None
        NL = self.cfg.local_capacity
        ids = np.zeros(NL, np.int32)
        ids[: len(lids)] = lids
        valid = np.zeros(NL, np.float32)
        valid[: len(lids)] = 1.0
        T0 = self.last_T_cw if self.last_T_cw is not None else self.T_cw
        res: TrackStepResult = tracked_pose_step(
            jnp.asarray(T0),
            jnp.asarray(st.plucker[ids]),
            jnp.asarray(st.endpoints[ids]),
            jnp.asarray(st.desc_bits[ids]),
            jnp.asarray(valid),
            feats,
            self.cam,
            self.cfg.search_coarse._replace(radius=1e6),  # descriptor-only
            self.cfg.pose_opt,
        )
        if int(res.num_inliers) < self.cfg.min_track_inliers:
            return None
        # keyframe creation binds landmarks through (_local_ids, match_idx);
        # the fallback matched against the ref window, so swap the mapping in
        # (the cache is marked dirty and rebuilt next frame).
        self._local_ids = ids
        self._local_valid = valid > 0.5
        self._local_dirty = True
        self._plocal_dirty = True
        return res

    # ---- relocalization -------------------------------------------------
    def _relocalize(self, feats: FrameFeatures):
        """SURVEY §4.2 Relocalization(): keyframe-database query + descriptor
        match against the candidate's landmarks + pose-only LM from its pose.
        Returns a recovered T_cw or None."""
        if self.kf_db is None:
            return None
        pf = self._cur_pfeats
        use_hybrid = pf is not None and self.cfg.points is not None
        scores = self.kf_db.query_bits(
            np.asarray(feats.desc_bits),
            np.asarray(feats.valid),
            None if pf is None else np.asarray(pf.desc_bits),
            None if pf is None else np.asarray(pf.valid),
        )
        cands = sorted(
            (k for k in scores if k in self.map.keyframes),
            key=lambda k: -scores[k],
        )[:3]
        st = self.map.lines
        for kid in cands:
            if scores[kid] < self.cfg.min_track_matches:
                break
            kf = self.map.keyframes[kid]
            # candidate landmark set: lines observed by this KF + neighbors
            _, lids = self.map.local_window(kid, 5)
            lids = [l for l in lids if st.alive[l]][: self.cfg.local_capacity]
            plocal = self._point_arrays_for_window(kid) if use_hybrid else None
            n_cand = len(lids) + (
                int(np.asarray(plocal["valid"]).sum()) if plocal is not None else 0
            )
            if n_cand < self.cfg.min_track_inliers:
                continue
            NL = self.cfg.local_capacity
            ids = np.zeros(NL, np.int32)
            ids[: len(lids)] = lids
            valid = np.zeros(NL, np.float32)
            valid[: len(lids)] = 1.0
            if use_hybrid:
                # hybrid recovery: corners carry the pose where lines are
                # sparse — the low-texture reloc failure mode (VERDICT r2
                # item 5). Wide radii = descriptor-only global search.
                res = tracked_pose_step_hybrid(
                    jnp.asarray(kf.T_cw),
                    dict(
                        plucker=jnp.asarray(st.plucker[ids]),
                        ep3d=jnp.asarray(st.endpoints[ids]),
                        bits=jnp.asarray(st.desc_bits[ids]),
                        valid=jnp.asarray(valid),
                    ),
                    plocal,
                    feats,
                    pf,
                    self.cam,
                    self.cfg.search_coarse._replace(radius=1e6),
                    self.cfg.points._replace(radius=1e6),
                    self.cfg.pose_opt,
                )
            else:
                res = tracked_pose_step(
                    jnp.asarray(kf.T_cw),
                    jnp.asarray(st.plucker[ids]),
                    jnp.asarray(st.endpoints[ids]),
                    jnp.asarray(st.desc_bits[ids]),
                    jnp.asarray(valid),
                    feats,
                    self.cam,
                    self.cfg.search_coarse._replace(radius=1e6),  # no prior: global search
                    self.cfg.pose_opt,
                )
            if int(res.num_inliers) >= self.cfg.min_track_inliers:
                self.ref_kf = kid
                self.n_relocalizations += 1
                self.state = TrackingState.OK
                self._local_dirty = True
                self._plocal_dirty = True
                return np.asarray(res.pose)
            # DLT-Lines reseed (SURVEY §5, [P:9]): the descriptor matches are
            # pose-independent, but LM seeded at a distant candidate pose can
            # diverge. The linear initialization-free solve recovers a pose
            # from the matches themselves; LM then re-gates from there.
            res2 = self._relocalize_dlt(feats, res, ids, valid)
            if res2 is not None and int(res2.num_inliers) >= self.cfg.min_track_inliers:
                self.ref_kf = kid
                self.n_relocalizations += 1
                self.state = TrackingState.OK
                self._local_dirty = True
                self._plocal_dirty = True
                return np.asarray(res2.pose)
        return None

    def _relocalize_dlt(self, feats: FrameFeatures, res: TrackStepResult, ids, valid):
        from tpuslam.backend.dlt import dlt_lines_pose
        from tpuslam.kernels.match import match_descriptors

        st = self.map.lines
        # pose-FREE descriptor matching: the candidate pose may be arbitrarily
        # wrong (that is why we are here), and the projection search's
        # frustum gate would zero every match under it
        m = match_descriptors(
            jnp.asarray(st.desc_bits[ids]),
            jnp.asarray(valid),
            feats.desc_bits,
            feats.valid,
            self.cfg.search_coarse.match,
        )
        midx = np.asarray(m.idx)
        mvalid = (np.asarray(m.valid) > 0.5) & (midx >= 0) & (valid > 0.5)
        if int(mvalid.sum()) < 8:
            return None
        # image-line coefficients of the matched frame segments (host numpy)
        ep = np.asarray(feats.endpoints)  # (K, 2, 2)
        p0 = np.concatenate([ep[:, 0], np.ones((ep.shape[0], 1), np.float32)], -1)
        p1 = np.concatenate([ep[:, 1], np.ones((ep.shape[0], 1), np.float32)], -1)
        l2d_all = np.cross(p0, p1).astype(np.float32)  # (K, 3)
        l2d = l2d_all[np.maximum(midx, 0)]  # (NL, 3) per map slot
        T_dlt, ok = dlt_lines_pose(
            jnp.asarray(l2d),
            jnp.asarray(st.endpoints[ids]),
            jnp.asarray(mvalid.astype(np.float32)),
            self.cam,
        )
        if float(ok) < 0.5:
            return None
        return tracked_pose_step(
            T_dlt,
            jnp.asarray(st.plucker[ids]),
            jnp.asarray(st.endpoints[ids]),
            jnp.asarray(st.desc_bits[ids]),
            jnp.asarray(valid),
            feats,
            self.cam,
            self.cfg.search_coarse,
            self.cfg.pose_opt,
        )

    # ---- local map cache ------------------------------------------------
    def invalidate_local_map(self):
        """Call after mapping/BA mutates landmark geometry."""
        self._local_dirty = True
        self._plocal_dirty = True

    def adopt_pose(self, T_cw: np.ndarray):
        """Reset the motion-model chain onto an externally corrected pose
        (loop closure rewrites keyframe poses; predicting from the stale
        pre-correction chain would throw the next projection search)."""
        self.T_cw = np.asarray(T_cw, np.float32).copy()
        self.last_T_cw = self.T_cw.copy()
        self.velocity = np.eye(4, dtype=np.float32)
        self._dev_chain = None  # device pose chain re-seeds from host

    def _local_map_arrays(self):
        if not self._local_dirty and hasattr(self, "_local_dev"):
            return self._local_dev
        NL = self.cfg.local_capacity
        lids: List[int] = []
        if self.ref_kf is not None and self.ref_kf in self.map.keyframes:
            _, lids = self.map.local_window(self.ref_kf, self.cfg.local_window_kfs)
        lids = [l for l in lids if self.map.lines.alive[l]][:NL]
        n = len(lids)
        ids = np.zeros(NL, np.int32)
        ids[:n] = lids
        valid = np.zeros(NL, np.float32)
        valid[:n] = 1.0
        self._local_ids = ids
        self._local_valid = valid > 0.5
        st = self.map.lines
        # ONE h2d + one device unpack instead of four uploads: every
        # copy START is a serialized ~2-3 ms wire round trip on the tunnel
        # (PERF_NOTES), and the window re-uploads at every map change.
        # desc_bits ride as exact u16 halves (kf_pack rationale: u32 words
        # bitcast through f32 get denormal-flushed/NaN-canonicalized
        # in-program on TPU).
        bits = st.desc_bits[ids]  # (NL, 8) u32
        buf = np.concatenate(
            [
                st.plucker[ids].astype(np.float32),  # (NL, 6)
                st.endpoints[ids].reshape(NL, 6).astype(np.float32),  # (NL, 2, 3)
                (bits & 0xFFFF).astype(np.float32),  # (NL, 8)
                (bits >> 16).astype(np.float32),  # (NL, 8)
                valid[:, None],  # (NL, 1)
            ],
            axis=1,
        )
        self._local_dev = _unpack_local_jit(jnp.asarray(buf))
        self._local_dirty = False
        return self._local_dev
