"""Probe: where does a KEYFRAME frame's wall time go? (fps_wall ~20 vs
per-call median 86 fps at chunk=1 — the tail is KF frames + the resolves
around them.) Wraps the tracker's KF-path stages with timers on a chip run,
tracking-only (no mapper), fused prescaled-half direct config (the bench
headline config).
"""
import time
from collections import defaultdict

import numpy as np
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.tracking import Tracker, TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System

acc = defaultdict(list)


def timed(obj, name):
    fn = getattr(obj, name)

    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[name].append((time.perf_counter() - t0) * 1e3)
        return r

    setattr(obj, name, wrap)


def main():
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
    sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=False, tracker_cfg=tcfg)
    from tpuslam.warmup import warmup_tracking

    tc = sys_.tracker.cfg
    warmup_tracking(
        cam, frontend_params=tc.frontend, stereo_params=tc.stereo,
        search_params=(tc.search_coarse, tc.search_fine),
        pose_opt_cfg=tc.pose_opt, local_capacity=tc.local_capacity,
        direct_stereo=tc.direct_stereo, with_mapping=False,
        log=lambda m: print(m, flush=True),
    )
    tr = sys_.tracker
    timed(tr, "_create_keyframe")
    timed(tr, "_bind_new_landmarks")
    timed(tr, "_bind_point_landmarks")
    timed(tr, "_local_map_arrays")
    timed(tr, "_resolve_fused_one")
    timed(tr.map, "new_keyframe")
    timed(tr.map, "update_connections")

    dts = []
    for f in range(n):
        il, ir = imgs[f]
        t0 = time.perf_counter()
        sys_.track_stereo(il, ir, f * 0.05)
        dts.append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    tr.flush_all()
    flush_ms = (time.perf_counter() - t0) * 1e3
    dts = np.array(dts[6:])
    print(f"\nper-call: median {np.median(dts):.1f} ms  mean {np.mean(dts):.1f} ms  "
          f"max {np.max(dts):.1f}  sum {np.sum(dts):.0f} ms  flush {flush_ms:.0f} ms")
    print("slowest 8 calls:", np.sort(dts)[-8:].round(1))
    print(f"keyframes: {len(sys_.map.keyframes)}")
    for k, v in sorted(acc.items(), key=lambda kv: -np.sum(kv[1])):
        v = np.array(v)
        print(f"{k:24s} n={len(v):3d} sum={np.sum(v):8.1f} ms median={np.median(v):7.1f} max={np.max(v):7.1f}")


if __name__ == "__main__":
    main()
