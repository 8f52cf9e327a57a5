"""Loop closing: detection, SE(3) correction, essential-graph optimization
(SURVEY §4.4).

The reference detects loops with a DBoW vocabulary. The TPU replacement is
vocabulary-free brute-force descriptor scoring on the MXU (SURVEY §3.2
'DBoW2/3 -> bit-packed matmul scoring'): at SLAM scale (hundreds of
keyframes x 256 descriptors) one batched Hamming matmul against every past
keyframe is cheap, exact, and needs no offline training.

Pipeline per keyframe:
  detect   -> MXU Hamming scoring vs the keyframe database, temporal
              consistency check (2 consecutive hits on the same region)
  compute  -> SE(3) from matched landmark 3D endpoints (RANSAC + Umeyama)
  correct  -> propagate to covisible group, essential-graph LM
              (backend.pose_graph), transform landmarks by their reference
              keyframe's correction
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import logging

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.backend.pose_graph import PoseGraphConfig, PoseGraphProblem, optimize_pose_graph
from tpuslam.eval.ate import align_umeyama
from tpuslam.geometry.plucker import plucker_transform
from tpuslam.geometry.se3 import se3_apply, se3_inverse
from tpuslam.kernels.match import MatchParams, hamming_distance_mxu, match_descriptors
from tpuslam.slammap.map import KeyFrame, SlamMap

_log = logging.getLogger(__name__)


@partial(jax.jit, static_argnums=(4, 5))
def _db_scores(
    cur_bits: jnp.ndarray,  # (K, W)
    cur_valid: jnp.ndarray,  # (K,)
    db_bits: jnp.ndarray,  # (N, K, W) — N is a fixed capacity bucket
    db_valid: jnp.ndarray,  # (N, K) f32 — all-zero rows are empty slots
    tau: float = 60.0,
    chunk: int = 32,
):
    """Per-keyframe similarity: count of current descriptors whose nearest
    neighbor in that keyframe is within Hamming tau. One MXU matmul per
    chunk of keyframes; (N,) int32 scores. Callers pass device-resident
    capacity-padded arrays (capacity is a power of two), so this compiles
    once per capacity bucket — never per keyframe insertion."""
    N, K, W = db_bits.shape
    pad = (-N) % chunk
    db_bits = jnp.concatenate([db_bits, jnp.zeros((pad, K, W), db_bits.dtype)])
    db_valid = jnp.concatenate([db_valid, jnp.zeros((pad, K), db_valid.dtype)])
    n_chunks = (N + pad) // chunk
    curvalf = cur_valid.astype(jnp.float32)

    def body(_, cb):
        bits_c, validf_c = cb  # (chunk, K, W), (chunk, K) f32
        D = hamming_distance_mxu(cur_bits, bits_c.reshape(chunk * K, W), 256)
        # additive penalty, no boolean select (see kernels/match.py docstring)
        D = D + (1.0 - validf_c.reshape(-1))[None, :] * 1e4
        best = jnp.min(D.reshape(K, chunk, K), axis=-1)  # (K, chunk)
        # exact hard count via clip: Hamming distances are integer-valued,
        # so clip(tau - best, 0, 1) is 1 iff best <= tau - 1
        score = jnp.sum(jnp.clip(tau - best, 0.0, 1.0) * curvalf[:, None], axis=0)
        return None, score

    _, scores = jax.lax.scan(
        body,
        None,
        (
            db_bits.reshape(n_chunks, chunk, K, W),
            db_valid.astype(jnp.float32).reshape(n_chunks, chunk, K),
        ),
    )
    return scores.reshape(-1)[:N].astype(jnp.int32)


@partial(jax.jit, static_argnums=(8, 9))
def _refine_pose_jit(T_seed, l_pl, l_ep, l_val, p_xyz, p_uv, p_val, l_sig, cam, cfg):
    """Jitted pose-LM for loop refinement (pose_optimize is designed to be
    inlined into jitted programs; an eager call would dispatch op-by-op —
    forbidden on the axon backend, PERF_NOTES.md)."""
    from tpuslam.backend.pose_opt import pose_optimize

    return pose_optimize(
        T_seed, l_pl, l_ep, l_val, p_xyz, p_uv, p_val, cam, cfg, l_sigma=l_sig
    )


@jax.jit
def _db_set_row(db_bits, db_valid, row_bits, row_valid, idx):
    db_bits = jax.lax.dynamic_update_slice(db_bits, row_bits[None], (idx, 0, 0))
    db_valid = jax.lax.dynamic_update_slice(db_valid, row_valid[None], (idx, 0))
    return db_bits, db_valid


@jax.jit
def _db_clear_row(db_valid, idx):
    K = db_valid.shape[1]
    return jax.lax.dynamic_update_slice(db_valid, jnp.zeros((1, K), db_valid.dtype), (idx, 0))


class KeyFrameDatabase:
    """Inverted-file replacement: device-resident per-KF binary descriptors,
    scored densely on the MXU (SURVEY §2 'KeyFrameDatabase').

    Storage is a fixed-capacity device array that doubles when full, so every
    program here compiles once per capacity bucket (log2 buckets total) — no
    per-keyframe recompiles and no per-query host->device re-upload of the
    whole database.

    With ``point_slots > 0`` (hybrid front-end, SURVEY §3.1 `MapPoint`),
    each row carries the keyframe's LBD line descriptors AND its BRIEF
    corner descriptors (both 256-bit), so place recognition — loop detection
    and relocalization — scores on both landmark families. Line-sparse
    scenes then still produce usable similarity scores, which is the
    low-texture failure mode hybrid systems exist to fix."""

    def __init__(self, capacity_hint: int = 64, point_slots: int = 0):
        self._cap0 = max(8, int(capacity_hint))
        self.point_slots = int(point_slots)
        self.clear()

    def clear(self):
        self.kids: List[Optional[int]] = []  # row -> kid; None = tombstone
        self._bits_dev = None  # (C, K, W) uint32 on device
        self._valid_dev = None  # (C, K) f32 on device

    def __len__(self):
        return sum(1 for k in self.kids if k is not None)

    def _ensure_capacity(self, K: int, W: int, bits_dtype):
        n = len(self.kids)
        if self._bits_dev is None:
            C = self._cap0
            self._bits_dev = jnp.zeros((C, K, W), bits_dtype)
            self._valid_dev = jnp.zeros((C, K), jnp.float32)
        elif n >= self._bits_dev.shape[0]:
            C = self._bits_dev.shape[0]
            self._bits_dev = jnp.concatenate(
                [self._bits_dev, jnp.zeros((C, K, W), self._bits_dev.dtype)]
            )
            self._valid_dev = jnp.concatenate(
                [self._valid_dev, jnp.zeros((C, K), jnp.float32)]
            )

    def _with_points(self, bits, valid, p_bits, p_valid):
        """Append (pad/truncate) point-descriptor rows to the line rows."""
        S = self.point_slots
        if S == 0:
            return bits, valid
        W = bits.shape[1]
        pb = np.zeros((S, W), bits.dtype)
        pv = np.zeros(S, np.float32)
        if p_bits is not None:
            p_bits = np.asarray(p_bits)[:S]
            pb[: p_bits.shape[0]] = p_bits
            pv[: p_bits.shape[0]] = np.asarray(p_valid, np.float32)[:S]
        return np.concatenate([bits, pb]), np.concatenate([valid, pv])

    def add(self, kf: KeyFrame):
        bits = np.asarray(kf.features.desc_bits)
        valid = np.asarray(kf.features.valid, np.float32)
        pf = kf.point_features
        bits, valid = self._with_points(
            bits, valid,
            None if pf is None else pf.desc_bits,
            None if pf is None else pf.valid,
        )
        K, W = bits.shape
        self._ensure_capacity(K, W, bits.dtype)
        idx = len(self.kids)
        self.kids.append(kf.kid)
        self._bits_dev, self._valid_dev = _db_set_row(
            self._bits_dev,
            self._valid_dev,
            jnp.asarray(bits),
            jnp.asarray(valid),
            jnp.int32(idx),
        )

    def remove(self, kid: int):
        if kid in self.kids:
            i = self.kids.index(kid)
            self.kids[i] = None
            self._valid_dev = _db_clear_row(self._valid_dev, jnp.int32(i))
            self._maybe_compact()

    def _maybe_compact(self):
        """Compact tombstoned rows once they outnumber live rows (and the
        dead weight exceeds a bucket's worth): heavy keyframe culling on a
        long sequence otherwise accumulates dead rows that still cost matmul
        columns in every query and inflate the capacity bucket. Compaction
        is a rare O(C) host round-trip; steady state stays device-resident."""
        dead = sum(1 for k in self.kids if k is None)
        live = len(self.kids) - dead
        if dead <= max(live, self._cap0 - 1):
            return
        bits = np.asarray(self._bits_dev)
        valid = np.asarray(self._valid_dev)
        keep = [i for i, k in enumerate(self.kids) if k is not None]
        self.kids = [self.kids[i] for i in keep]
        C = self._cap0
        while C < len(keep) + self._cap0:  # headroom: adds must not regrow at once
            C *= 2
        new_bits = np.zeros((C,) + bits.shape[1:], bits.dtype)
        new_valid = np.zeros((C,) + valid.shape[1:], valid.dtype)
        if keep:
            new_bits[: len(keep)] = bits[keep]
            new_valid[: len(keep)] = valid[keep]
        self._bits_dev = jnp.asarray(new_bits)
        self._valid_dev = jnp.asarray(new_valid)

    def query_bits(
        self,
        bits: np.ndarray,
        valid: np.ndarray,
        p_bits: np.ndarray | None = None,
        p_valid: np.ndarray | None = None,
    ) -> Dict[int, int]:
        if len(self) == 0:
            return {}
        bits, valid = self._with_points(
            np.asarray(bits), np.asarray(valid, np.float32), p_bits, p_valid
        )
        scores = np.asarray(
            _db_scores(
                jnp.asarray(bits),
                jnp.asarray(valid),
                self._bits_dev,
                self._valid_dev,
            )
        )
        return {k: int(scores[i]) for i, k in enumerate(self.kids) if k is not None}

    def query(self, kf: KeyFrame) -> Dict[int, int]:
        pf = kf.point_features
        return self.query_bits(
            np.asarray(kf.features.desc_bits),
            np.asarray(kf.features.valid),
            None if pf is None else pf.desc_bits,
            None if pf is None else pf.valid,
        )


@dataclass
class LoopConfig:
    min_kid_gap: int = 25  # candidate must be this many keyframes old
    min_score: int = 40  # absolute match-count floor
    # candidate must reach score_ratio x the MINIMUM covisible-neighbor
    # score (reference semantics: candidates at least as similar as the
    # least-similar connected KF; false positives are filtered by the
    # consistency gate + geometric RANSAC below, not by a score margin)
    score_ratio: float = 1.0
    covis_exclude_weight: int = 10  # only strongly-covisible KFs are
    # excluded as candidates (weight-1 links span far too wide an arc)
    consistency: int = 2  # supporting detections of the same region required
    # window (in keyframe ids) over which supporting detections accumulate.
    # Round-3 finding: requiring CONSECUTIVE keyframes to detect meant one
    # miss reset the evidence, and KF-paced revisits (the loop arriving in
    # the last frames of a sequence) never fired. Evidence now persists for
    # this many kids; a miss ages it out instead of erasing it.
    consistency_window: int = 8
    match: MatchParams = field(default_factory=lambda: MatchParams(max_dist=80.0, ratio=0.8))
    ransac_iters: int = 200
    ransac_inlier_m: float = 0.3
    min_inliers: int = 8
    # mono scale-correction plausibility gate: a Sim(3) estimate asking for
    # more than this factor of scale change (either direction) is treated
    # as a mis-estimate. r4 set this to 2.5 after an s=0.17 closure on a
    # degraded map took KF-map ATE 1.4 -> 3.7 — but that regression came
    # from defects fixed since (BA divergence write-backs, uncorrected
    # POINT landmarks at closure, point-blind global BA), and r5 measured
    # the tight gate REJECTING the legitimate corrections for ordinary
    # cumulative mono drift (s=0.23-0.39 over a 120-frame circle), leaving
    # the map broken at 3-5x the closed ATE. r5 then MEASURED a widened
    # gate (8.0) on the circle scene and it reliably lost: 1.86-2.00
    # KF-map ATE with 3-4 churning large-scale closures vs 0.24-0.90 at
    # 2.5 with 1-2 in-gate closures — a map that drifted past ~2.5x
    # really is shape-broken beyond a single similarity, exactly as the
    # r4 note said. The tight gate stays.
    max_scale_correction: float = 2.5
    refine: bool = True  # post-RANSAC pose LM over line/point reprojections
    refine_cap: int = 256  # fixed capacity per landmark family (compile-once)
    covis_edge_weight: int = 50
    pg: PoseGraphConfig = field(default_factory=PoseGraphConfig)
    run_global_ba: bool = True  # full-map BA after the essential graph
    gba_cfg: object = None  # GlobalBAConfig override (None = defaults);
    # lets tests/deployments bound the bucket ladder — an overflowing map
    # falls back to the essential-graph-only correction (gba_skipped)


class LoopCloser:
    """Host orchestration of loop detection + correction (SURVEY §4.4)."""

    def __init__(
        self,
        slam_map: SlamMap,
        cam,
        cfg: LoopConfig = LoopConfig(),
        db: KeyFrameDatabase | None = None,
        mono: bool = False,
        solver=None,  # backend.ba_worker.BASolverWorker (global BA off-process)
    ):
        self.map = slam_map
        self.cam = cam
        self.cfg = cfg
        # NOT `db or KeyFrameDatabase()`: KeyFrameDatabase defines __len__,
        # so the (always-empty-at-construction) shared db passed by System
        # was falsy and silently replaced by a PRIVATE db — loop detection
        # then worked against the private copy while relocalization queried
        # the System's forever-empty one (every LC-enabled run since the
        # tombstone-compaction change had no working relocalization).
        self.db = db if db is not None else KeyFrameDatabase()
        self.mono = mono  # mono loops carry scale drift -> Sim(3) correction
        self.solver = solver
        self._consistent: List[Tuple[int, int]] = []  # (kf kid, candidate kid)
        self.closed_loops: List[Tuple[int, int]] = []
        self.gba_skipped: int = 0  # maps too large for the global-BA buckets

    # ---- per-keyframe entry --------------------------------------------
    def process(self, kf: KeyFrame) -> bool:
        """Returns True if a loop was closed (map poses changed)."""
        cand = self._detect(kf)
        self.db.add(kf)
        # age out evidence older than the window (misses no longer erase it
        # — see LoopConfig.consistency_window)
        self._consistent = [
            (k, c)
            for (k, c) in self._consistent
            if kf.kid - k <= self.cfg.consistency_window
        ]
        if cand is None:
            return False
        self._consistent.append((kf.kid, cand))
        support = [c for (_, c) in self._consistent if abs(c - cand) <= 10]
        if len(support) < self.cfg.consistency:
            return False
        ok = self._close(kf, cand)
        self._consistent.clear()
        return ok

    # ---- detection ------------------------------------------------------
    def _detect(self, kf: KeyFrame) -> Optional[int]:
        scores = self.db.query(kf)
        if not scores:
            return None
        covis = set(
            self.map.covisible_keyframes(kf.kid, min_weight=self.cfg.covis_exclude_weight)
        )
        # reference semantics (SURVEY §4.4 DetectLoop): the baseline is the
        # MINIMUM similarity among covisible neighbors — a loop candidate
        # must look at least as similar as the least-similar connected KF.
        # (Round-3 used max(covis), which on structure-repetitive scenes
        # sets an unreachable bar: dwell revisits scoring 85% of the best
        # neighbor never fired.)
        covis_scores = [s for k, s in scores.items() if k in covis]
        baseline = min(covis_scores) if covis_scores else 0
        best_kid, best_score = None, 0
        for k, s in scores.items():
            if k in covis or kf.kid - k < self.cfg.min_kid_gap:
                continue
            if k not in self.map.keyframes:
                continue
            if s > best_score:
                best_kid, best_score = k, s
        if best_kid is None:
            return None
        if best_score < max(self.cfg.min_score, self.cfg.score_ratio * baseline):
            return None
        return best_kid

    # ---- SE(3)/Sim(3) computation ----------------------------------------
    def _compute_se3(self, kf: KeyFrame, cand: KeyFrame) -> Optional[Tuple[float, np.ndarray]]:
        """(s, T_corr): candidate-camera -> current-camera.

        Stage 1 — RANSAC + Umeyama over matched-landmark 3D correspondences:
        line endpoint midpoints AND (hybrid front-end) point landmarks.
        Stereo estimates a rigid transform (s = 1); mono a similarity
        (SURVEY §4.4 'mono: Sim3') because the loop ends disagree in scale.

        Stage 2 — pose LM over line/point REPROJECTIONS (`_refine_loop_T`):
        midpoints of partially observed segments are viewpoint-dependent
        (occlusion/truncation slides them along the line), so the 3-point
        alignment is only a seed; the refinement minimizes the
        endpoint-to-projected-line distance of the CURRENT keyframe's
        detections against the candidate side's landmarks — the
        reference-class guided-matching + optimization step (VERDICT r2
        item 7)."""
        st = self.map.lines
        va = (np.asarray(kf.features.valid) > 0.5) & (kf.line_ids >= 0)
        vb = (np.asarray(cand.features.valid) > 0.5) & (cand.line_ids >= 0)
        m = match_descriptors(
            jnp.asarray(np.asarray(kf.features.desc_bits)),
            jnp.asarray(va.astype(np.float32)),
            jnp.asarray(np.asarray(cand.features.desc_bits)),
            jnp.asarray(vb.astype(np.float32)),
            self.cfg.match,
        )
        mv = np.asarray(m.valid)
        midx = np.asarray(m.idx)
        pts_cur, pts_cand = [], []
        line_pairs = []  # (kf 2D slot, candidate landmark id)
        for s0 in np.nonzero(mv)[0]:
            l0 = int(kf.line_ids[s0])
            l1 = int(cand.line_ids[midx[s0]])
            if l0 < 0 or l1 < 0 or not (st.alive[l0] and st.alive[l1]):
                continue
            # landmark endpoint midpoints in each KF's camera frame
            mid0 = st.endpoints[l0].mean(axis=0)
            mid1 = st.endpoints[l1].mean(axis=0)
            pts_cur.append(kf.T_cw[:3, :3] @ mid0 + kf.T_cw[:3, 3])
            pts_cand.append(cand.T_cw[:3, :3] @ mid1 + cand.T_cw[:3, 3])
            line_pairs.append((int(s0), l1))
        # hybrid: point landmarks are true 3D correspondences — stiffer
        # RANSAC anchors than the viewpoint-dependent line midpoints
        point_pairs = []  # (kf corner slot, candidate landmark id)
        if (
            kf.point_features is not None
            and cand.point_features is not None
            and kf.point_ids is not None
            and cand.point_ids is not None
        ):
            pst = self.map.points
            pva = (np.asarray(kf.point_features.valid) > 0.5) & (kf.point_ids >= 0)
            pvb = (np.asarray(cand.point_features.valid) > 0.5) & (cand.point_ids >= 0)
            pm = match_descriptors(
                jnp.asarray(np.asarray(kf.point_features.desc_bits)),
                jnp.asarray(pva.astype(np.float32)),
                jnp.asarray(np.asarray(cand.point_features.desc_bits)),
                jnp.asarray(pvb.astype(np.float32)),
                self.cfg.match,
            )
            pmv = np.asarray(pm.valid)
            pmidx = np.asarray(pm.idx)
            for s0 in np.nonzero(pmv)[0]:
                p0 = int(kf.point_ids[s0])
                p1 = int(cand.point_ids[pmidx[s0]])
                if p0 < 0 or p1 < 0 or not (pst.alive[p0] and pst.alive[p1]):
                    continue
                pts_cur.append(kf.T_cw[:3, :3] @ pst.xyz[p0] + kf.T_cw[:3, 3])
                pts_cand.append(cand.T_cw[:3, :3] @ pst.xyz[p1] + cand.T_cw[:3, 3])
                point_pairs.append((int(s0), p1))
        if len(pts_cur) < self.cfg.min_inliers:
            return None
        A = np.stack(pts_cand)  # candidate-camera coords
        B = np.stack(pts_cur)  # current-camera coords
        rng = np.random.default_rng(kf.kid)
        best_inl, best_T = 0, None
        n = len(A)
        with_scale = self.mono
        for _ in range(self.cfg.ransac_iters):
            idx = rng.choice(n, size=3, replace=False)
            try:
                s, R, t = align_umeyama(A[idx], B[idx], with_scale=with_scale)
            except np.linalg.LinAlgError:
                continue
            err = np.linalg.norm(s * (R @ A.T).T + t - B, axis=1)
            inl = err < self.cfg.ransac_inlier_m
            if inl.sum() > best_inl:
                best_inl = int(inl.sum())
                best_T = inl
        if best_T is None or best_inl < self.cfg.min_inliers:
            return None
        s, R, t = align_umeyama(A[best_T], B[best_T], with_scale=with_scale)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        if self.cfg.refine:
            refined = self._refine_loop_T(kf, cand, float(s), T, line_pairs, point_pairs)
            if refined is not None:
                T = refined
        return float(s), T

    def _refine_loop_T(
        self,
        kf: KeyFrame,
        cand: KeyFrame,
        s: float,
        T_seed: np.ndarray,
        line_pairs,
        point_pairs,
    ) -> Optional[np.ndarray]:
        """Pose LM of the current KF against the CANDIDATE side's landmarks.

        The scaled candidate-camera frame acts as the world: candidate
        landmarks are brought into candidate-camera coords, scaled by the
        Umeyama s (mono drift), and the rigid T (candcam -> kf cam) is
        optimized over line endpoint-to-projected-line and point
        reprojection residuals of kf's DETECTED 2D features. Fixed
        `refine_cap` shapes -> compiles once (warmup.warm_loop_programs)."""
        from tpuslam.backend.pose_opt import PoseOptConfig

        st = self.map.lines
        pst = self.map.points
        C = int(self.cfg.refine_cap)
        l_pl = np.zeros((C, 6), np.float32)
        l_ep = np.zeros((C, 2, 2), np.float32)
        l_sig = np.ones(C, np.float32)
        l_val = np.zeros(C, np.float32)
        ep2d = np.asarray(kf.features.endpoints)
        sig = np.asarray(kf.features.sigma)
        Tc = cand.T_cw
        for i, (s0, l1) in enumerate(line_pairs[:C]):
            Lw = st.plucker[l1]
            # world -> candidate camera, then scale the frame: (n, v) -> (s n, v)
            Lc = np.asarray(plucker_transform(jnp.asarray(Tc), jnp.asarray(Lw)))
            l_pl[i, :3] = s * Lc[:3]
            l_pl[i, 3:] = Lc[3:]
            l_ep[i] = ep2d[s0]
            l_sig[i] = max(float(sig[s0]), 1e-3)
            l_val[i] = 1.0
        p_xyz = np.zeros((C, 3), np.float32)
        p_uv = np.zeros((C, 2), np.float32)
        p_val = np.zeros(C, np.float32)
        if point_pairs and kf.point_features is not None:
            uv2d = np.asarray(kf.point_features.uv)
            for i, (s0, p1) in enumerate(point_pairs[:C]):
                p_xyz[i] = s * (Tc[:3, :3] @ pst.xyz[p1] + Tc[:3, 3])
                p_uv[i] = uv2d[s0]
                p_val[i] = 1.0
        res = _refine_pose_jit(
            jnp.asarray(T_seed),
            jnp.asarray(l_pl),
            jnp.asarray(l_ep),
            jnp.asarray(l_val),
            jnp.asarray(p_xyz),
            jnp.asarray(p_uv),
            jnp.asarray(p_val),
            jnp.asarray(l_sig),
            self.cam,
            PoseOptConfig(),
        )
        if int(res.num_inliers) < self.cfg.min_inliers:
            return None  # refinement collapsed; keep the RANSAC estimate
        return np.asarray(res.pose).astype(np.float32)

    # ---- correction -----------------------------------------------------
    def _close(self, kf: KeyFrame, cand_kid: int) -> bool:
        cand = self.map.keyframes.get(cand_kid)
        if cand is None:
            return False
        res = self._compute_se3(kf, cand)
        if res is None:
            return False
        s_corr, T_corr = res
        mx = self.cfg.max_scale_correction
        if not (1.0 / mx <= s_corr <= mx):
            import sys

            print(
                f"loop closure rejected: implausible scale correction "
                f"{s_corr:.3f} (gate {1/mx:.2f}..{mx:.2f})",
                file=sys.stderr,
            )
            return False

        kids = self.map.all_keyframe_ids()
        pos = {k: i for i, k in enumerate(kids)}
        old_poses = {k: self.map.keyframes[k].T_cw.copy() for k in kids}

        # corrected current pose: current camera coords = S_corr @ candidate
        # camera coords with X_cand_cam = T_cand_cw X_w, so
        # S_cw_new(kf) = S_corr @ T_cand_cw. For stereo s_corr == 1 and this
        # is rigid; for mono it is a similarity absorbing the scale drift.
        S_corr = np.eye(4, dtype=np.float32)
        S_corr[:3, :3] = np.float32(s_corr) * T_corr[:3, :3]
        S_corr[:3, 3] = T_corr[:3, 3]
        T_kf_new = (S_corr @ cand.T_cw).astype(np.float32)

        # ---- essential graph --------------------------------------------
        E = []
        meas = []
        weights = []
        for kid in kids:
            k = self.map.keyframes[kid]
            if k.parent is not None and k.parent in pos:
                E.append((pos[kid], pos[k.parent]))
                meas.append(old_poses[kid] @ np.linalg.inv(old_poses[k.parent]))
                weights.append(100.0)
            for le in k.loop_edges:
                if le in pos and le < kid:
                    E.append((pos[kid], pos[le]))
                    meas.append(old_poses[kid] @ np.linalg.inv(old_poses[le]))
                    weights.append(100.0)
            for other, w in self.map.covis.get(kid, {}).items():
                if other in pos and other < kid and w >= self.cfg.covis_edge_weight:
                    E.append((pos[kid], pos[other]))
                    meas.append(old_poses[kid] @ np.linalg.inv(old_poses[other]))
                    weights.append(float(w) / 10.0)
        # the loop edge itself: measured relative pose from T_corr
        E.append((pos[kf.kid], pos[cand_kid]))
        meas.append(T_kf_new @ np.linalg.inv(old_poses[cand_kid]))
        weights.append(200.0)

        P = len(kids)
        poses0 = np.stack([old_poses[k] for k in kids])
        # seed the current KF at its corrected pose to pull the graph
        poses0[pos[kf.kid]] = T_kf_new
        pose_free = np.ones(P, np.float32)
        pose_free[pos[cand_kid]] = 0.0  # trust the loop side
        pose_free[pos[kids[0]]] = 0.0  # gauge

        # pad (P, E) to power-of-two buckets: the graph programs then
        # compile once per bucket, not once per closure (the repo's
        # fixed-shape rule; VERDICT r2 item 3 'kill steady-state in-run
        # compiles'). Pad poses are identity with pose_free=0; pad edges
        # carry e_valid=0 — both exactly masked by the solver.
        nE = len(E)
        Pc = 16
        while Pc < P:
            Pc *= 2
        Ec = 64
        while Ec < nE:
            Ec *= 2
        poses_pad = np.tile(np.eye(4, dtype=np.float32), (Pc, 1, 1))
        poses_pad[:P] = poses0
        free_pad = np.zeros(Pc, np.float32)
        free_pad[:P] = pose_free
        e_i = np.zeros(Ec, np.int32)
        e_j = np.zeros(Ec, np.int32)
        e_i[:nE] = [e[0] for e in E]
        e_j[:nE] = [e[1] for e in E]
        e_meas = np.tile(np.eye(4, dtype=np.float32), (Ec, 1, 1))
        e_meas[:nE] = np.stack(meas).astype(np.float32)
        e_valid = np.zeros(Ec, np.float32)
        e_valid[:nE] = 1.0
        e_weight = np.ones(Ec, np.float32)
        e_weight[:nE] = weights

        if self.mono:
            # Sim(3) essential graph: tree/covis edges are scale-1
            # similarities of the old poses; the loop edge carries s_corr.
            from tpuslam.backend.pose_graph import Sim3GraphProblem, optimize_pose_graph_sim3
            from tpuslam.geometry.sim3 import se3_from_sim3

            prob = Sim3GraphProblem(
                sims=jnp.asarray(poses_pad),
                pose_free=jnp.asarray(free_pad),
                e_i=jnp.asarray(e_i),
                e_j=jnp.asarray(e_j),
                e_meas=jnp.asarray(e_meas),
                e_valid=jnp.asarray(e_valid),
                e_weight=jnp.asarray(e_weight),
            )
            new_sims, _ = optimize_pose_graph_sim3(prob, self.cfg.pg)
            new_sims = np.asarray(new_sims)[:P]
            new_se3 = np.asarray(jax.vmap(se3_from_sim3)(jnp.asarray(new_sims)))
        else:
            prob = PoseGraphProblem(
                poses=jnp.asarray(poses_pad),
                pose_free=jnp.asarray(free_pad),
                e_i=jnp.asarray(e_i),
                e_j=jnp.asarray(e_j),
                e_meas=jnp.asarray(e_meas),
                e_valid=jnp.asarray(e_valid),
                e_weight=jnp.asarray(e_weight),
            )
            new_sims, _ = optimize_pose_graph(prob, self.cfg.pg)
            new_sims = np.asarray(new_sims)[:P]
            new_se3 = new_sims

        # ---- write back + landmark correction (host numpy, batched) ------
        # corrections are world_old -> world_new similarities (rigid when
        # stereo): C_k = S_new_k^-1 @ S_old_k.
        corrections = {}
        for kid in kids:
            self.map.keyframes[kid].T_cw = new_se3[pos[kid]].astype(np.float32)
            corrections[kid] = (
                np.linalg.inv(new_sims[pos[kid]]) @ old_poses[kid]
            ).astype(np.float32)

        st = self.map.lines
        lids, refs = [], []
        for lid in st.live_ids():
            ref = int(st.first_kf[lid])
            if ref not in corrections:
                obs_k = next(iter(st.obs.get(int(lid), {})), None)
                if obs_k is None or obs_k not in corrections:
                    continue
                ref = obs_k
            lids.append(int(lid))
            refs.append(ref)
        if lids:
            lids_a = np.asarray(lids)
            C = np.stack([corrections[r] for r in refs])  # (M, 4, 4) similarities
            # endpoints: p' = (sR) p + t — the 4x4 acts directly
            ep = st.endpoints[lids_a]  # (M, 2, 3)
            st.endpoints[lids_a] = np.einsum("mij,mkj->mki", C[:, :3, :3], ep) + C[:, None, :3, 3]
            # Pluecker under a similarity (s, R, t): v' = R v,
            # n' = s R n + t x R v (see geometry/sim3.plucker_transform_sim3)
            sC = np.cbrt(np.maximum(np.linalg.det(C[:, :3, :3]), 1e-12))
            Rc = C[:, :3, :3] / sC[:, None, None]
            L = st.plucker[lids_a]
            Rv = np.einsum("mij,mj->mi", Rc, L[:, 3:])
            Rn = np.einsum("mij,mj->mi", Rc, L[:, :3])
            n_new = sC[:, None] * Rn + np.cross(C[:, :3, 3], Rv)
            st.plucker[lids_a] = np.concatenate([n_new, Rv], axis=-1)

        # POINT landmarks get the same per-ref-KF correction (found r5: they
        # were never corrected — tracking/reloc then matched against
        # pre-closure point geometry, and once global BA started consuming
        # point observations the stale points dragged the corrected poses
        # back toward pre-closure geometry, the r4 'GBA makes it worse' term)
        pst = self.map.points
        qids, qrefs = [], []
        for qid in pst.live_ids():
            ref = int(pst.first_kf[qid])
            if ref not in corrections:
                obs_k = next(iter(pst.obs.get(int(qid), {})), None)
                if obs_k is None or obs_k not in corrections:
                    continue
                ref = obs_k
            qids.append(int(qid))
            qrefs.append(ref)
        if qids:
            qids_a = np.asarray(qids)
            Cq = np.stack([corrections[r] for r in qrefs])  # (M, 4, 4)
            xyz = pst.xyz[qids_a]
            pst.xyz[qids_a] = (
                np.einsum("mij,mj->mi", Cq[:, :3, :3], xyz) + Cq[:, :3, 3]
            ).astype(np.float32)

        kf.loop_edges.add(cand_kid)
        cand.loop_edges.add(kf.kid)
        self.closed_loops.append((kf.kid, cand_kid))
        # invalidate any in-flight async local-BA solve: it was assembled
        # from pre-correction poses and would revert this correction
        self.map.generation += 1

        if self.cfg.run_global_ba:
            # SURVEY §4.4: the reference launches global BA on a thread after
            # the essential graph; here it runs synchronously (host schedule)
            from tpuslam.backend.global_ba import GlobalBAConfig, global_bundle_adjustment

            try:
                global_bundle_adjustment(
                    self.map, self.cam,
                    cfg=self.cfg.gba_cfg or GlobalBAConfig(),
                    solver=self.solver,
                )
            except ValueError as e:
                # Map exceeds the largest BA bucket: the essential graph has
                # already corrected the trajectory; record + log the skip
                # instead of degrading silently.
                self.gba_skipped += 1
                _log.warning("global BA skipped after loop closure: %s", e)
        return True
