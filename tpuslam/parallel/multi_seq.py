"""Batched multi-sequence tracking (BASELINE config #5: N sequences tracked
concurrently).

The per-frame device math vmaps cleanly over a leading sequence axis; with a
`Mesh` + NamedSharding on that axis, XLA partitions every batched program
across chips with no collectives (sequences are independent) — mapping
throughput then scales with the sharded BA (`parallel/sharded_ba.py`).

Host control flow (keyframe policy, map bookkeeping) stays per-sequence:
`MultiTracker` owns N `Tracker`s and feeds them batched device results, so
the expensive stages (pyramid+LSD+LBD x N cameras, stereo association,
projection search + pose LM) run as single sharded programs.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.backend.pose_opt import PoseOptConfig
from tpuslam.frontend.frame import FrameFeatures, FrontendParams, StereoParams, extract_features
from tpuslam.frontend import frame as _frame_mod
from tpuslam.frontend.matcher import ProjectionSearchParams, _pose_opt_from_matches, _project_penalty
from tpuslam.frontend.tracking import Tracker, TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.kernels.match import _match_body


@partial(jax.jit, static_argnums=(1,))
def batched_extract(imgs: jnp.ndarray, params: FrontendParams) -> FrameFeatures:
    """(N, H, W) -> FrameFeatures with leading batch axis."""
    return jax.vmap(lambda im: extract_features(im, params))(imgs)


@partial(jax.jit, static_argnums=(3,))
def batched_stereo(left: FrameFeatures, right: FrameFeatures, fxb: jnp.ndarray, params: StereoParams):
    """Batched stereo association; fxb: (N,) per-sequence fx*baseline."""

    def one(l, r, f):
        pen = _frame_mod._stereo_gate_penalty.__wrapped__(
            l.midpoint, l.angle, l.length, r.midpoint, r.angle, r.length, params
        )
        m = _match_body(l.desc_bits, l.valid, r.desc_bits, r.valid, pen, params.match)
        depth, okf = _frame_mod._stereo_depth_post.__wrapped__(
            l.endpoints, l.angle, r.endpoints, m.idx, m.valid, f, params, 10.0
        )
        return l._replace(depth=depth, has_depth=okf)

    return jax.vmap(one)(left, right, fxb)


def cam_batch(cams: Sequence[Intrinsics]) -> Intrinsics:
    """Lift N Intrinsics to one pytree with (N,) array leaves.

    `Intrinsics` is a NamedTuple of scalars — a pytree — so per-sequence
    calibrations vmap like any other data (BASELINE config #5's sequences
    have per-sequence calibrations; the round-2 batched step required
    identical cameras and silently fell back to the serial path otherwise)."""
    return Intrinsics(
        *[
            jnp.asarray([float(getattr(c, f)) for c in cams], jnp.float32)
            for f in Intrinsics._fields
        ]
    )


@partial(jax.jit, static_argnums=(7, 8, 9))
def batched_track_step(
    T_pred: jnp.ndarray,  # (N, 4, 4)
    map_plucker: jnp.ndarray,  # (N, L, 6)
    map_ep3d: jnp.ndarray,  # (N, L, 2, 3)
    map_bits: jnp.ndarray,  # (N, L, W)
    map_validf: jnp.ndarray,  # (N, L)
    feats: FrameFeatures,  # batched
    cams: Intrinsics,  # (N,)-leaf pytree from cam_batch (traced: per-sequence)
    search: ProjectionSearchParams,
    search_fine: Optional[ProjectionSearchParams] = None,
    opt: PoseOptConfig = PoseOptConfig(),
):
    """Batched project+match+pose-LM over the sequence axis: the full
    coarse+fine tracking stage of Tracker._track_frame_sync as ONE program.

    Returns per-sequence (pose, match_idx, inlier, n_matched, n_inliers,
    packed) with a leading batch axis — `packed` rows have the same 19-scalar
    layout the single-sequence path uses, so MultiTracker feeds them straight
    into Tracker._resolve_pending."""
    from tpuslam.frontend.matcher import _fused_track

    def one(T, lines, ep3d, bits, validf, f, cam):
        out = _fused_track.__wrapped__(
            T, lines, ep3d, bits, validf,
            f.midpoint, f.angle, f.desc_bits, f.valid, f.endpoints,
            f.sigma, f.has_depth, cam, search, opt,
        )
        if search_fine is not None:
            out = _fused_track.__wrapped__(
                out[0], lines, ep3d, bits, validf,
                f.midpoint, f.angle, f.desc_bits, f.valid, f.endpoints,
                f.sigma, f.has_depth, cam, search_fine, opt,
            )
        return out

    return jax.vmap(one)(
        T_pred, map_plucker, map_ep3d, map_bits, map_validf, feats, cams
    )


class MultiTracker:
    """Track N sequences concurrently with batched/sharded device stages."""

    def __init__(
        self,
        cams: Sequence[Intrinsics],
        cfg: TrackerConfig = TrackerConfig(),
        mesh: Optional[Mesh] = None,
    ):
        if len({(c.width, c.height) for c in cams}) != 1:
            raise ValueError("all sequences must share an image shape")
        from tpuslam.slammap.map import SlamMap

        self.cams = list(cams)
        self.cfg = cfg
        self.mesh = mesh
        self.trackers: List[Tracker] = [Tracker(c, SlamMap(), cfg) for c in cams]
        self._fxb = jnp.asarray([c.fx * c.baseline for c in cams], jnp.float32)
        self._cam_b = cam_batch(self.cams)  # per-sequence calibrations
        self._sharding = NamedSharding(mesh, P("seq")) if mesh is not None else None

    def _put(self, x):
        return jax.device_put(x, self._sharding) if self._sharding is not None else x

    def track_stereo(self, lefts: np.ndarray, rights: np.ndarray, timestamps: Sequence[float]):
        """lefts/rights: (N, H, W) f32. Returns list of FrameResult."""
        fl = batched_extract(self._put(jnp.asarray(lefts, jnp.float32)), self.cfg.frontend)
        fr = batched_extract(self._put(jnp.asarray(rights, jnp.float32)), self.cfg.frontend)
        feats = batched_stereo(fl, fr, self._fxb, self.cfg.stereo)
        return self.track_features(feats, timestamps)

    def track_features(self, feats: FrameFeatures, timestamps: Sequence[float]):
        """Track one batched-feature frame per sequence (leading axis N).

        All sequences in steady-state tracking are solved by ONE batched
        coarse+fine dispatch (`batched_track_step`) — per-sequence
        calibrations included (vmapped `Intrinsics` pytree, `cam_batch`).
        Host keyframe policy and map bookkeeping stay per-sequence via
        Tracker._resolve_pending. Sequences that are initializing or LOST
        fall back to their own single-sequence path (they need host-driven
        init/relocalization)."""
        from tpuslam.frontend.matcher import TrackStepResult
        from tpuslam.frontend.tracking import TrackingState

        N = len(self.trackers)
        results: List = [None] * N
        steady = [
            i
            for i, tr in enumerate(self.trackers)
            if tr.state == TrackingState.OK and tr.last_T_cw is not None
        ]
        for tr in self.trackers:
            tr.frame_idx += 1

        if steady:
            # Fixed batch shape: always dispatch all N rows (non-steady rows
            # carry zero-valid local maps) so the program never recompiles as
            # sequences drop in/out of the steady set.
            T_pred = np.stack(
                [
                    (tr.velocity @ tr.last_T_cw).astype(np.float32)
                    if tr.last_T_cw is not None
                    else np.eye(4, np.float32)
                    for tr in self.trackers
                ]
            )
            locs = [tr._local_map_arrays() for tr in self.trackers]
            stackk = lambda k: self._put(jnp.stack([l[k] for l in locs]))
            out = batched_track_step(
                self._put(jnp.asarray(T_pred)),
                stackk("plucker"),
                stackk("ep3d"),
                stackk("bits"),
                stackk("valid"),
                feats,
                self._cam_b,
                self.cfg.search_coarse,
                self.cfg.search_fine,
                self.cfg.pose_opt,
            )
            pose_b, midx_b, inl_b, nm_b, ni_b, packed_b = out
            packed = np.asarray(packed_b)  # one d2h for the whole batch
            for i in steady:
                tr = self.trackers[i]
                fine_i = TrackStepResult(
                    pose=pose_b[i],
                    match_idx=midx_b[i],
                    inlier=inl_b[i],
                    num_matched=nm_b[i],
                    num_inliers=ni_b[i],
                    packed=packed[i],
                )
                fi = jax.tree.map(lambda x: x[i], feats)
                results[i] = tr._resolve_pending(
                    (
                        tr.frame_idx,
                        timestamps[i],
                        fi,
                        fine_i,
                        True,
                        tr._local_ids.copy(),
                        tr._local_valid.copy(),
                    )
                )

        for i, tr in enumerate(self.trackers):
            if results[i] is None:
                fi = jax.tree.map(lambda x: x[i], feats)
                results[i] = tr._track(fi, timestamps[i], stereo=True)
        return results
