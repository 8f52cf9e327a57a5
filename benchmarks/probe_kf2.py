"""Probe: per-stage wall cost of a MAPPING-ENABLED keyframe event at the
bench headline config (prescaled half-res direct stereo, BA worker).

probe_kf.py measured the tracking-only KF tail (~130 ms/KF after the batched
d2h fix); the bench shows mapping-enabled wall fps at ~19 vs 42 tracking-only
=> the mapper's inline (tracking-process) stages add ~300 ms/KF. This probe
attributes that: tracker KF stages, mapper stages, BA problem assembly,
device_get time, and h2d uploads, each timed per call.
"""
import time
from collections import defaultdict

import numpy as np

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System

acc = defaultdict(list)


def timed(obj, name, label=None):
    fn = getattr(obj, name)
    key = label or name

    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[key].append((time.perf_counter() - t0) * 1e3)
        return r

    setattr(obj, name, wrap)


def timed_module(mod, name, label):
    fn = getattr(mod, name)

    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[label].append((time.perf_counter() - t0) * 1e3)
        return r

    setattr(mod, name, wrap)


def main():
    import jax
    import os

    os.environ.setdefault("TPUSLAM_BA_WARM_CAPS", "8,128,512;16,256,1024")
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    n = 60
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=n, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    imgs = [
        (render_wireframe_image(scene, f, noise=1.0, rng=rng),
         render_wireframe_image(scene_r, f, noise=1.0, rng=rng))
        for f in range(n)
    ]
    tcfg = TrackerConfig(
        pipelined=True,
        direct_stereo=DirectStereoParams(),
        frontend=FrontendParams(base_scale=0.5, prescaled=True),
    )
    nomap = os.environ.get("TPUSLAM_PROBE_NOMAP", "0") == "1"
    sys_ = System(
        cam, sensor="stereo", loop_closing=False, mapping=not nomap,
        tracker_cfg=tcfg,
    )
    from tpuslam.warmup import warmup_tracking

    tc = sys_.tracker.cfg
    warmup_tracking(
        cam, frontend_params=tc.frontend, stereo_params=tc.stereo,
        search_params=(tc.search_coarse, tc.search_fine),
        pose_opt_cfg=tc.pose_opt, local_capacity=tc.local_capacity,
        direct_stereo=tc.direct_stereo,
        with_mapping=sys_._ba_worker is None,
        fuse_search=sys_.mapper.cfg.fuse_search if sys_.mapper else None,
        log=lambda m: print(m, flush=True),
    )
    if sys_._ba_worker is not None:
        try:
            sys_._ba_worker.wait_warm(timeout=300, n_buckets=99)
            print("BA warm ladder done", flush=True)
        except TimeoutError:
            sys_._ba_worker.stop_warmer()
            print("BA warm TIMEOUT; warmer stopped (uncontended run)", flush=True)

    tr = sys_.tracker
    mp = sys_.mapper
    timed(tr, "_create_keyframe")
    timed(tr, "_local_map_arrays")
    timed(tr.map, "new_keyframe")
    timed(tr.map, "update_connections")
    if mp is not None:
        timed(mp, "process", "mapper.process")
        timed(mp, "_fuse_in_neighbors")
        timed(mp, "_cull_recent")
        timed(mp, "_cull_keyframes")
        timed(mp, "_poll_ba")
        if mp.solver is not None:
            timed(mp.solver, "submit", "ba.submit")
    if sys_.kf_db is not None:
        timed(sys_.kf_db, "add", "kf_db.add")
    if sys_.map is not None and getattr(sys_.map, "lines", None) is not None:
        timed(sys_.map.lines, "add_observation", "lines.add_observation")
        timed(sys_.map.lines, "allocate", "lines.allocate")
    import tpuslam.backend.mapping as mapping_mod
    timed_module(mapping_mod, "assemble_problem", "ba.assemble_problem")
    import tpuslam.frontend.tracking as tracking_mod
    timed_module(tracking_mod, "triangulate_stereo_lines", "kf.triangulate_dispatch")
    # attribute d2h resolve time globally
    timed_module(jax, "device_get", "jax.device_get")

    dts = []
    for f in range(n):
        il, ir = imgs[f]
        t0 = time.perf_counter()
        sys_.track_stereo(il, ir, f * 0.05)
        dts.append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    tr.flush_all()
    flush_ms = (time.perf_counter() - t0) * 1e3
    mp and mp.finish()
    dts = np.array(dts[6:])
    wall = np.sum(dts) + flush_ms
    print(f"\nper-call: median {np.median(dts):.1f} ms  mean {np.mean(dts):.1f} ms  "
          f"max {np.max(dts):.1f}  sum {np.sum(dts):.0f} ms  flush {flush_ms:.0f} ms  "
          f"wall-fps {len(dts)/(wall/1e3):.1f}")
    print("slowest 8 calls:", np.sort(dts)[-8:].round(1))
    if mp is not None:
        print(f"keyframes: {len(sys_.map.keyframes)}  ba sub/skip: "
              f"{mp.ba_submitted}/{mp.ba_skipped}  solve_ms {np.median(mp.solve_ms) if mp.solve_ms else -1:.0f}")
    else:
        print(f"keyframes: {len(sys_.map.keyframes)}  (mapping off)")
    for k, v in sorted(acc.items(), key=lambda kv: -np.sum(kv[1])):
        v = np.array(v)
        print(f"{k:24s} n={len(v):3d} sum={np.sum(v):8.1f} ms median={np.median(v):7.1f} max={np.max(v):7.1f}")


if __name__ == "__main__":
    main()
