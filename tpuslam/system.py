"""System facade: the public API (SURVEY §2 L6, BASELINE north star).

    sys = System(settings, sensor="stereo")
    pose = sys.track_stereo(imL, imR, t)     # per-frame TrackFrame -> pose
    sys.map_lines()                           # map of 3D line landmarks
    sys.keyframe_graph()                      # keyframe covisibility graph
    sys.save_trajectory_tum(path); sys.shutdown()

Replaces the reference's thread spawn/join with synchronous host scheduling
(SURVEY §3.3): local mapping and loop closing run inline after keyframe
insertion. Per-frame observability (SURVEY §7): structured JSONL log with
pose, match/inlier counts, stage timings.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from tpuslam.backend.mapping import LocalMapper, MapperConfig
from tpuslam.frontend.tracking import FrameResult, Tracker, TrackerConfig, TrackingState
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.config import Settings
from tpuslam.io.trajectory import save_trajectory_kitti, save_trajectory_tum
from tpuslam.slammap.map import SlamMap


@dataclass
class StageTimer:
    """Warmup-aware per-stage wall timing (SURVEY §7 tracing/profiling)."""

    warmup: int = 2
    times: Dict[str, List[float]] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    def add(self, stage: str, dt: float):
        c = self.counts.get(stage, 0)
        self.counts[stage] = c + 1
        if c >= self.warmup:
            self.times.setdefault(stage, []).append(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self.times.items():
            arr = np.asarray(v)
            out[k] = dict(
                mean_ms=float(arr.mean() * 1e3),
                median_ms=float(np.median(arr) * 1e3),
                p90_ms=float(np.percentile(arr, 90) * 1e3),
                n=len(arr),
            )
        return out


class System:
    """Top-level SLAM system (the `System` facade of SURVEY §2)."""

    def __init__(
        self,
        settings: Settings | Intrinsics,
        sensor: str = "stereo",
        mapping: bool = True,
        loop_closing: bool = True,
        log_path: Optional[str] = None,
        tracker_cfg: Optional[TrackerConfig] = None,
        mapper_cfg: Optional[MapperConfig] = None,
    ):
        if isinstance(settings, Intrinsics):
            cam = settings
            tcfg = tracker_cfg or TrackerConfig()
        else:
            cam = settings.cam
            tcfg = tracker_cfg or settings.tracker or TrackerConfig()
        if sensor not in ("stereo", "mono"):
            raise ValueError(f"unknown sensor mode {sensor!r}")
        self.sensor = sensor
        self.cam = cam
        self.map = SlamMap()
        self.tracker = Tracker(cam, self.map, tcfg)
        self.mapper: Optional[LocalMapper] = None
        self.loop_closer = None
        self._ba_worker = None
        if mapping:
            # On the real chip, the LM+Schur solve runs in a persistent
            # subprocess (the reference's background-mapping-thread analog):
            # compiling the big BA programs into the tracking process
            # degrades every subsequent dispatch (PERF_NOTES.md). CPU runs
            # (tests) stay in-process and fully deterministic.
            import jax

            use_worker = os.environ.get("TPUSLAM_BA_SUBPROCESS")
            if use_worker is None:
                use_worker = "1" if jax.default_backend() not in ("cpu",) else "0"
            if use_worker == "1":
                from tpuslam.backend.ba_worker import BASolverWorker

                self._ba_worker = BASolverWorker(cam)
            self.mapper = LocalMapper(
                self.map, cam, mapper_cfg or MapperConfig(), mono=(sensor == "mono"),
                solver=self._ba_worker,
            )
            self.tracker.on_new_keyframe = self._on_new_keyframe
            self.mapper.on_map_changed = self.tracker.invalidate_local_map
        from tpuslam.backend.loop_closing import KeyFrameDatabase

        # hybrid front-end: place recognition scores corners too (the DB
        # row then carries line LBD + point BRIEF descriptors)
        self.kf_db = KeyFrameDatabase(
            point_slots=tcfg.points.max_points if tcfg.points is not None else 0
        )
        self.tracker.kf_db = self.kf_db  # relocalization path
        self.map.on_keyframe_erased = self.kf_db.remove  # culled KFs leave the DB
        if loop_closing:
            from tpuslam.backend.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(
                self.map, cam, db=self.kf_db, mono=(sensor == "mono"),
                solver=self._ba_worker
            )
            # compile the loop-event programs (bucketed essential graph +
            # post-RANSAC refine) at startup: the FIRST closure of a run
            # otherwise pays their compiles mid-sequence, exactly when the
            # map correction is time-critical. On by default on the chip
            # (mirrors the BA-worker policy); CPU tests skip it — the XLA-CPU
            # compile cost lands on suite time, and a first-closure compile
            # on CPU is cheap anyway. TPUSLAM_WARM_LOOP=1/0 overrides.
            import jax

            warm = os.environ.get("TPUSLAM_WARM_LOOP")
            if warm is None:
                warm = "1" if jax.default_backend() not in ("cpu",) else "0"
            if warm == "1":
                from tpuslam.warmup import warm_loop_programs

                warm_loop_programs(
                    cam,
                    mono=(sensor == "mono"),
                    refine_cap=self.loop_closer.cfg.refine_cap,
                )
        self.timer = StageTimer()
        if self.mapper is not None:
            self.mapper.timer = self.timer  # KF-event wall split (mp.* stages)
        if hasattr(self.tracker, "timer"):
            self.tracker.timer = self.timer  # kf_begin/kf_finish stages
        self.trajectory: List[FrameResult] = []
        self._log_f = open(log_path, "w") if log_path else None

    # ---- internal -------------------------------------------------------
    def _on_new_keyframe(self, kf):
        if self.mapper is not None:
            t0 = time.perf_counter()
            self.mapper.process(kf)
            self.timer.add("local_mapping", time.perf_counter() - t0)
        if self.loop_closer is not None:
            t0 = time.perf_counter()
            corrected = self.loop_closer.process(kf)
            self.timer.add("loop_closing", time.perf_counter() - t0)
            if corrected:
                self.tracker.invalidate_local_map()
                # tracking must continue from the corrected pose, not the
                # pre-correction motion-model chain
                self.tracker.adopt_pose(kf.T_cw)
        else:
            self.kf_db.add(kf)  # keep relocalization possible without LC

    def _log(self, r: FrameResult, dt: float):
        if self._log_f is None:
            return
        self._log_f.write(
            json.dumps(
                dict(
                    frame=r.frame_idx,
                    t=r.timestamp,
                    state=r.state.name,
                    n_matches=r.n_matches,
                    n_inliers=r.n_inliers,
                    kf=r.made_keyframe,
                    track_ms=dt * 1e3,
                    pose=np.asarray(r.T_cw).reshape(-1).round(6).tolist(),
                )
            )
            + "\n"
        )

    # ---- public API -----------------------------------------------------
    def track_stereo(self, img_left, img_right, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        r = self.tracker.track_stereo(img_left, img_right, timestamp)
        dt = time.perf_counter() - t0
        self.timer.add("track", dt)
        if self.mapper is not None:  # between-KF deferred-work poll
            t1 = time.perf_counter()
            self.mapper.tick()
            self.timer.add("tick", time.perf_counter() - t1)
        if r is not None:  # pipelined mode resolves with a 1-2 frame lag
            self.trajectory.append(r)
            self._log(r, dt)
        for extra in self.tracker.pop_results():  # pipeline transitions
            self.trajectory.append(extra)
            self._log(extra, 0.0)
        return np.asarray(self.tracker.T_cw)

    def track_monocular(self, img, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        r = self.tracker.track_monocular(img, timestamp)
        dt = time.perf_counter() - t0
        self.timer.add("track", dt)
        if self.mapper is not None:  # between-KF deferred-work poll
            self.mapper.tick()
        if r is not None:
            self.trajectory.append(r)
            self._log(r, dt)
        return np.asarray(self.tracker.T_cw)

    def track_frame(self, images, timestamp: float) -> np.ndarray:
        """Generic TrackFrame entry (BASELINE north star API)."""
        if self.sensor == "stereo":
            return self.track_stereo(images[0], images[1], timestamp)
        img = images[0] if isinstance(images, (list, tuple)) else images
        return self.track_monocular(img, timestamp)

    @property
    def state(self) -> TrackingState:
        return self.tracker.state

    def map_lines(self) -> Dict[str, np.ndarray]:
        """Live 3D line landmarks: Pluecker coords + endpoints (world)."""
        ids = self.map.lines.live_ids()
        return dict(
            ids=ids,
            plucker=self.map.lines.plucker[ids].copy(),
            endpoints=self.map.lines.endpoints[ids].copy(),
            n_obs=self.map.lines.n_obs[ids].copy(),
        )

    def map_points(self) -> Dict[str, np.ndarray]:
        """Live 3D point landmarks (hybrid mode; empty dict-of-arrays when
        the point front-end is disabled)."""
        ids = self.map.points.live_ids()
        return dict(
            ids=ids,
            xyz=self.map.points.xyz[ids].copy(),
            n_obs=self.map.points.n_obs[ids].copy(),
        )

    def keyframe_graph(self):
        """Keyframe poses + covisibility edges (kid_a, kid_b, weight)."""
        kfs = {k: kf.T_cw.copy() for k, kf in self.map.keyframes.items()}
        edges = []
        for a, row in self.map.covis.items():
            for b, w in row.items():
                if a < b and a in kfs and b in kfs:
                    edges.append((a, b, int(w)))
        return kfs, edges

    def save_trajectory_tum(self, path: str):
        save_trajectory_tum(
            path, [r.timestamp for r in self.trajectory], [r.T_cw for r in self.trajectory]
        )

    def save_trajectory_kitti(self, path: str):
        save_trajectory_kitti(path, [r.T_cw for r in self.trajectory])

    def save_map(self, path: str):
        from tpuslam.slammap.serialize import save_map

        save_map(self.map, path)

    def load_map(self, path: str):
        from tpuslam.slammap.serialize import load_map

        self.map = load_map(path)
        self.tracker.map = self.map
        if self.mapper is not None:
            self.mapper.map = self.map
        if self.loop_closer is not None:
            self.loop_closer.map = self.map
        # Rebuild the keyframe database so relocalization (and loop detection)
        # work against the loaded map — required for localization-only reuse.
        self.kf_db.clear()
        for kid in sorted(self.map.keyframes):
            self.kf_db.add(self.map.keyframes[kid])
        self.map.on_keyframe_erased = self.kf_db.remove
        self.tracker.invalidate_local_map()

    def timing_summary(self):
        return self.timer.summary()

    def shutdown(self, drain_timeout: float = 1200.0):
        """Flush in-flight frames, drain mapping, release workers/threads.

        `drain_timeout` bounds the wait for an in-flight async BA solve —
        a cold worker-side compile on a degraded service must not hold
        shutdown (and any deadline the caller is under) hostage; an
        unfinished solve is abandoned with a stderr note."""
        if hasattr(self.tracker, "flush_all"):
            for r in self.tracker.flush_all():
                self.trajectory.append(r)
                self._log(r, 0.0)
        elif hasattr(self.tracker, "flush"):
            r = self.tracker.flush()
            if r is not None:
                self.trajectory.append(r)
                self._log(r, 0.0)
        if self.mapper is not None:
            # drain the async BA solve, apply write-back (bounded)
            self.mapper.finish(timeout=drain_timeout)
        if self._log_f is not None:
            self._log_f.write(json.dumps(dict(timing=self.timing_summary())) + "\n")
            self._log_f.close()
            self._log_f = None
        if self._ba_worker is not None:
            self._ba_worker.close()
            self._ba_worker = None
        if hasattr(self.tracker, "close"):
            self.tracker.close()  # stop the upload worker thread
