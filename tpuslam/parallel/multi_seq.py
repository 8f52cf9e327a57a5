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


@partial(jax.jit, static_argnums=(6, 7, 8))
def batched_track_step(
    T_pred: jnp.ndarray,  # (N, 4, 4)
    map_plucker: jnp.ndarray,  # (N, L, 6)
    map_ep3d: jnp.ndarray,  # (N, L, 2, 3)
    map_bits: jnp.ndarray,  # (N, L, W)
    map_validf: jnp.ndarray,  # (N, L)
    feats: FrameFeatures,  # batched
    cam: Intrinsics,
    search: ProjectionSearchParams,
    opt: PoseOptConfig,
):
    """Batched project+match+pose-LM over the sequence axis."""

    def one(T, lines, ep3d, bits, validf, f):
        pen, vf = _project_penalty.__wrapped__(T, ep3d, validf, f.midpoint, f.angle, cam, search)
        m = _match_body(bits, vf, f.desc_bits, f.valid, pen, search.match)
        res, n_matched = _pose_opt_from_matches.__wrapped__(
            T, lines, f.endpoints, f.sigma, m.idx, m.valid, cam, opt
        )
        return res.pose, m.idx, res.inlier_lines, n_matched, res.num_inliers

    return jax.vmap(one)(T_pred, map_plucker, map_ep3d, map_bits, map_validf, feats)


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
        self._sharding = NamedSharding(mesh, P("seq")) if mesh is not None else None

    def _put(self, x):
        return jax.device_put(x, self._sharding) if self._sharding is not None else x

    def track_stereo(self, lefts: np.ndarray, rights: np.ndarray, timestamps: Sequence[float]):
        """lefts/rights: (N, H, W) f32. Returns list of FrameResult."""
        N = len(self.trackers)
        fl = batched_extract(self._put(jnp.asarray(lefts, jnp.float32)), self.cfg.frontend)
        fr = batched_extract(self._put(jnp.asarray(rights, jnp.float32)), self.cfg.frontend)
        feats = batched_stereo(fl, fr, self._fxb, self.cfg.stereo)
        # per-sequence host tracking on the batched features (slicing the
        # batch is a cheap device gather; control flow stays sequential)
        results = []
        for i, tr in enumerate(self.trackers):
            fi = jax.tree.map(lambda x: x[i], feats)
            tr.frame_idx += 1
            results.append(tr._track(fi, timestamps[i], stereo=True))
        return results
