"""Probe: where does the chunked-ingest HOST path spend its time?

probe_ablate chunk=4 shows the chunk scan program at 9.7 ms/frame device-side
(vs 14.2 single-frame), yet the chunk=4 bench collapses to 7.4 wall fps.
This times every stage of Tracker._chunk_compute / _resolve_fused_one over a
mapping-OFF run at the bench config."""
import sys
import time
from collections import defaultdict

import numpy as np

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.tracking import Tracker, TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System

acc = defaultdict(list)


def wrap(obj, name):
    fn = getattr(obj, name)

    def f(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[name].append((time.perf_counter() - t0) * 1e3)
        return r

    setattr(obj, name, f)


def main():
    import os

    os.environ.setdefault("TPUSLAM_BA_WORKER_WARMUP", "0")
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    n = 48
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=n, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    imgs = [
        (render_wireframe_image(scene, f, noise=1.0, rng=rng),
         render_wireframe_image(scene_r, f, noise=1.0, rng=rng))
        for f in range(n)
    ]
    tcfg = TrackerConfig(pipelined=True, chunk=4)
    tcfg.direct_stereo = DirectStereoParams()
    tcfg.frontend = FrontendParams(base_scale=0.5, prescaled=True)
    sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=False, tracker_cfg=tcfg)
    from tpuslam.warmup import warmup_tracking

    tc = sys_.tracker.cfg
    warmup_tracking(
        cam, frontend_params=tc.frontend, stereo_params=tc.stereo,
        search_params=(tc.search_coarse, tc.search_fine),
        pose_opt_cfg=tc.pose_opt, local_capacity=tc.local_capacity,
        direct_stereo=tc.direct_stereo, chunk=4, with_mapping=False,
        log=lambda m: print(m, file=sys.stderr, flush=True),
    )
    tr = sys_.tracker
    for name in ("_chunk_compute", "_resolve_fused_one", "_create_keyframe",
                 "_local_map_arrays", "_stereo_features", "_track_frame_sync",
                 "_drain_fused"):
        wrap(tr, name)
    # time the upload handle.get inside _chunk_compute via the uploader
    t_wall0 = None
    times = []
    for f in range(n):
        il, ir = imgs[f]
        t0 = time.perf_counter()
        if f == 6:
            t_wall0 = t0
        sys_.track_stereo(il, ir, f * 0.05)
        times.append(time.perf_counter() - t0)
    tr.flush_all()
    wall = time.perf_counter() - t_wall0
    print(f"wall fps: {(n-6)/wall:.1f}", file=sys.stderr, flush=True)
    for k, v in sorted(acc.items()):
        a = np.asarray(v)
        print(f"{k:22s}: n={len(a):3d} median={np.median(a):8.1f} ms "
              f"mean={a.mean():8.1f} total={a.sum():9.0f}", file=sys.stderr, flush=True)
        print("   " + " ".join(f"{x:.0f}" for x in a), file=sys.stderr, flush=True)
    print("frame walls: " + " ".join(f"{x*1e3:.0f}" for x in times), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
