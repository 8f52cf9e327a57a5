"""Local mapping: the reference's LocalMapping thread as host-scheduled steps
(SURVEY §4.3, §3.3 'no threads — sequential host control flow').

Runs synchronously after each keyframe insertion:

  ProcessNewKeyFrame   -> observation binding happens in the tracker
  MapLineCulling       -> drop weakly-observed recent landmarks
  CreateNewMapLines    -> (mono) two-view triangulation vs covisible KFs
  SearchInNeighbors    -> fuse duplicate landmarks (projection-gated match)
  LocalBundleAdjustment-> backend.local_ba (jitted LM+Schur)
  KeyFrameCulling      -> drop redundant keyframes
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from tpuslam.backend.local_ba import LocalBAConfig, LocalBAStats, local_bundle_adjustment
from tpuslam.frontend.matcher import ProjectionSearchParams, search_by_projection
from tpuslam.geometry.camera import Intrinsics, image_line_through
from tpuslam.geometry.se3 import se3_inverse
from tpuslam.geometry.triangulate import (
    line_ray_endpoints,
    projection_matrix,
    triangulate_plucker_two_view,
)
from tpuslam.kernels.match import MatchParams, angle_penalty, match_descriptors
from tpuslam.slammap.map import KeyFrame, SlamMap


@dataclass
class MapperConfig:
    ba: LocalBAConfig = field(default_factory=LocalBAConfig)
    ba_every: int = 1  # run local BA every N keyframes
    cull_min_obs: int = 2  # landmark must reach this within cull_horizon KFs
    cull_horizon: int = 3
    triangulate_neighbors: int = 3  # covisible KFs searched for new lines
    tri_min_parallax_deg: float = 1.0
    tri_max_reproj_px: float = 4.0
    tri_min_depth: float = 0.1
    tri_max_depth: float = 60.0
    tri_match: MatchParams = field(default_factory=lambda: MatchParams(max_dist=90.0, ratio=0.8))
    fuse_search: ProjectionSearchParams = field(
        default_factory=lambda: ProjectionSearchParams(radius=10.0, angle_tol=0.15)
    )
    kf_cull_redundancy: float = 0.9  # cull KF if this fraction of its
    kf_cull_min_obs: int = 3  # landmarks is seen by >= this many other KFs
    enable_kf_culling: bool = True


class LocalMapper:
    """Synchronous mapping back-end; install via tracker.on_new_keyframe."""

    def __init__(
        self,
        slam_map: SlamMap,
        cam: Intrinsics,
        cfg: MapperConfig = MapperConfig(),
        mono: bool = False,
    ):
        self.map = slam_map
        self.cam = cam
        self.cfg = cfg
        self.mono = mono
        self._recent: Dict[int, int] = {}  # line id -> kf id at creation
        self._recent_pts: Dict[int, int] = {}  # point id -> kf id at creation
        self._kf_count = 0
        self.last_ba: LocalBAStats | None = None
        self.on_map_changed = None  # callback (e.g. tracker.invalidate_local_map)

    def process(self, kf: KeyFrame):
        self._kf_count += 1
        self._register_recent(kf)
        self._cull_recent(kf)
        if self.mono:
            self._create_new_maplines(kf)
        self._fuse_in_neighbors(kf)
        self.map.update_connections(kf)
        if self._kf_count % self.cfg.ba_every == 0 and len(self.map.keyframes) >= 2:
            self.last_ba = local_bundle_adjustment(self.map, kf.kid, self.cam, self.cfg.ba)
        if self.cfg.enable_kf_culling:
            self._cull_keyframes(kf)
        if self.on_map_changed:
            self.on_map_changed()

    # ---- landmark culling ----------------------------------------------
    def _register_recent(self, kf: KeyFrame):
        st = self.map.lines
        for lid in kf.line_ids:
            if lid >= 0 and st.first_kf[lid] == kf.kid:
                self._recent[int(lid)] = kf.kid
        if kf.point_ids is not None:
            pst = self.map.points
            for pid in kf.point_ids:
                if pid >= 0 and pst.first_kf[pid] == kf.kid:
                    self._recent_pts[int(pid)] = kf.kid

    def _cull_recent(self, kf: KeyFrame):
        st = self.map.lines
        for lid, born in list(self._recent.items()):
            if not st.alive[lid]:
                del self._recent[lid]
                continue
            age = kf.kid - born
            if age >= self.cfg.cull_horizon:
                if st.n_obs[lid] < self.cfg.cull_min_obs:
                    st.kill(lid, self.map.keyframes)
                del self._recent[lid]
        pst = self.map.points
        for pid, born in list(self._recent_pts.items()):
            if not pst.alive[pid]:
                del self._recent_pts[pid]
                continue
            if kf.kid - born >= self.cfg.cull_horizon:
                if pst.n_obs[pid] < self.cfg.cull_min_obs:
                    pst.kill(pid, self.map.keyframes)
                del self._recent_pts[pid]

    # ---- new landmark triangulation (mono) ------------------------------
    def _create_new_maplines(self, kf: KeyFrame):
        neighbors = self.map.covisible_keyframes(kf.kid, self.cfg.triangulate_neighbors)
        f = kf.features
        free = (kf.line_ids < 0) & (np.asarray(f.valid) > 0.5)
        if free.sum() == 0:
            return
        T0 = kf.T_cw
        P0 = np.asarray(projection_matrix(self.cam, jnp.asarray(T0)))
        for nkid in neighbors:
            nkf = self.map.keyframes[nkid]
            nfree = (nkf.line_ids < 0) & (np.asarray(nkf.features.valid) > 0.5)
            if nfree.sum() == 0:
                continue
            pen = angle_penalty(
                jnp.asarray(np.asarray(f.angle)),
                jnp.asarray(np.asarray(nkf.features.angle)),
                0.35,
            )
            m = match_descriptors(
                jnp.asarray(np.asarray(f.desc_bits)),
                jnp.asarray(free.astype(np.float32)),
                jnp.asarray(np.asarray(nkf.features.desc_bits)),
                jnp.asarray(nfree.astype(np.float32)),
                self.cfg.tri_match,
                pen,
            )
            mv = np.asarray(m.valid)
            if mv.sum() == 0:
                continue
            slots0 = np.nonzero(mv)[0]
            slots1 = np.asarray(m.idx)[slots0]
            a0 = np.asarray(f.endpoints)[slots0]
            a1 = np.asarray(nkf.features.endpoints)[slots1]
            T1 = nkf.T_cw
            P1 = np.asarray(projection_matrix(self.cam, jnp.asarray(T1)))
            l0 = np.asarray(image_line_through(jnp.asarray(a0[:, 0]), jnp.asarray(a0[:, 1])))
            l1 = np.asarray(image_line_through(jnp.asarray(a1[:, 0]), jnp.asarray(a1[:, 1])))
            Lw = np.asarray(
                triangulate_plucker_two_view(
                    jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(l0), jnp.asarray(l1)
                )
            )
            ok, ep3d = self._validate_triangulations(Lw, a0, a1, T0, T1)
            bits = np.asarray(f.desc_bits)
            st = self.map.lines
            for i in np.nonzero(ok)[0]:
                s0 = int(slots0[i])
                s1 = int(slots1[i])
                if kf.line_ids[s0] >= 0 or nkf.line_ids[s1] >= 0:
                    continue
                lid = st.allocate(Lw[i], ep3d[i], bits[s0], kf.kid)
                st.add_observation(lid, kf, s0)
                st.add_observation(lid, nkf, s1)
                self._recent[lid] = kf.kid
            free = (kf.line_ids < 0) & (np.asarray(f.valid) > 0.5)

    def _validate_triangulations(self, Lw, a0, a1, T0, T1):
        """Cheirality + depth + reprojection + parallax checks; endpoint 3D
        from viewing-ray intersection in view 0."""
        n = Lw.shape[0]
        ok = np.zeros(n, bool)
        ep3d = np.zeros((n, 2, 3), np.float32)
        cam = self.cam
        Kinv = np.linalg.inv(np.asarray(cam.K))
        from tpuslam.geometry.plucker import plucker_transform
        from tpuslam.geometry.camera import line_projection_matrix, point_line_distance

        KL = np.asarray(line_projection_matrix(cam))
        L0 = np.asarray(plucker_transform(jnp.asarray(T0), jnp.asarray(Lw)))
        L1 = np.asarray(plucker_transform(jnp.asarray(T1), jnp.asarray(Lw)))
        # parallax gate is implicit: near-parallel back-projected planes give
        # |v| ~ 0 (skipped below) and inflate the reprojection residual
        vnorm = np.linalg.norm(Lw[:, 3:], axis=-1)
        for i in range(n):
            if vnorm[i] < 1e-7:
                continue
            # reprojection check in both views
            good = True
            for (Lc, a) in ((L0[i], a0[i]), (L1[i], a1[i])):
                l = KL @ Lc[:3]
                den = np.hypot(l[0], l[1])
                if den < 1e-9:
                    good = False
                    break
                for e in range(2):
                    d = abs(l[0] * a[e, 0] + l[1] * a[e, 1] + l[2]) / den
                    if d > self.cfg.tri_max_reproj_px:
                        good = False
                        break
                if not good:
                    break
            if not good:
                continue
            # endpoints from rays in view 0
            rays = Kinv @ np.concatenate([a0[i], np.ones((2, 1))], axis=1).T  # (3, 2)
            rays = (rays / np.linalg.norm(rays, axis=0)).T  # (2, 3)
            pts, s = line_ray_endpoints(jnp.asarray(L0[i]), jnp.asarray(rays))
            pts = np.asarray(pts)
            s = np.asarray(s)
            z = pts[:, 2]
            if np.any(s <= 0) or np.any(z < self.cfg.tri_min_depth) or np.any(
                z > self.cfg.tri_max_depth
            ):
                continue
            # world endpoints
            Twc = np.linalg.inv(T0)
            ep3d[i] = pts @ Twc[:3, :3].T + Twc[:3, 3]
            ok[i] = True
        return ok, ep3d

    # ---- duplicate fusion -----------------------------------------------
    def _fuse_in_neighbors(self, kf: KeyFrame):
        """Match OLD local-map lines into this KF; where they land on a
        feature bound to a landmark born in this KF, merge the two."""
        st = self.map.lines
        neighbors = self.map.covisible_keyframes(kf.kid, 5)
        old_ids = sorted(
            {
                int(l)
                for nk in neighbors
                for l in self.map.keyframes[nk].line_ids
                if l >= 0 and st.alive[l] and st.first_kf[l] != kf.kid
            }
        )
        if not old_ids:
            return
        ids = np.asarray(old_ids, np.int32)
        m = search_by_projection(
            jnp.asarray(kf.T_cw),
            jnp.asarray(st.endpoints[ids]),
            jnp.asarray(st.desc_bits[ids]),
            jnp.ones(len(ids), jnp.float32),
            _features_as_jnp(kf.features),
            self.cam,
            self.cfg.fuse_search,
        )
        mv = np.asarray(m.valid)
        midx = np.asarray(m.idx)
        for i in np.nonzero(mv)[0]:
            slot = int(midx[i])
            old = int(ids[i])
            cur = int(kf.line_ids[slot])
            if cur < 0:
                st.add_observation(old, kf, slot)
            elif cur != old and st.alive[cur] and st.alive[old]:
                # keep the better-observed landmark
                keep, drop = (old, cur) if st.n_obs[old] >= st.n_obs[cur] else (cur, old)
                st.replace(drop, keep, self.map.keyframes)

    # ---- keyframe culling ----------------------------------------------
    def _cull_keyframes(self, kf: KeyFrame):
        st = self.map.lines
        for kid in self.map.covisible_keyframes(kf.kid, 10):
            ckf = self.map.keyframes.get(kid)
            if ckf is None or kid == kf.kid or kid == min(self.map.keyframes):
                continue
            lids = [int(l) for l in ckf.line_ids if l >= 0 and st.alive[l]]
            if len(lids) < 10:
                continue
            redundant = sum(1 for l in lids if st.n_obs[l] >= self.cfg.kf_cull_min_obs + 1)
            if redundant > self.cfg.kf_cull_redundancy * len(lids):
                self.map.erase_keyframe(kid)


def _features_as_jnp(f):
    from tpuslam.frontend.frame import FrameFeatures

    return FrameFeatures(*[jnp.asarray(np.asarray(x)) for x in f])
