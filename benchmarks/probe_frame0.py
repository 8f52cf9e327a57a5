"""Probe: where does the FIRST tracked frame block?

Round-3 bench postmortem: with warm program caches, frame 0 of the headline
bench measured 16-304 s wall with only ~4 s of logged compiles — a silent
block somewhere in the init/KF path. This reproduces the bench config for a
handful of frames and dumps the main-thread stack every 20 s via
faulthandler, so the blocking call site is visible in stderr.
"""
import faulthandler
import sys
import time

import numpy as np

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System


def main():
    import os

    os.environ.setdefault("TPUSLAM_BA_WARM_CAPS", "16,256,1024")
    os.environ.setdefault("TPUSLAM_BA_WORKER_WARMUP", "0")
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    n = 8
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=n, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    imgs = [
        (render_wireframe_image(scene, f, noise=1.0, rng=rng),
         render_wireframe_image(scene_r, f, noise=1.0, rng=rng))
        for f in range(n)
    ]
    tcfg = TrackerConfig(pipelined=True)
    tcfg.direct_stereo = DirectStereoParams()
    tcfg.frontend = FrontendParams(base_scale=0.5, prescaled=True)
    mapping = "--nomap" not in sys.argv
    sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=mapping, tracker_cfg=tcfg)
    from tpuslam.warmup import warmup_tracking

    tc = sys_.tracker.cfg
    warmup_tracking(
        cam,
        frontend_params=tc.frontend,
        stereo_params=tc.stereo,
        search_params=(tc.search_coarse, tc.search_fine),
        pose_opt_cfg=tc.pose_opt,
        local_capacity=tc.local_capacity,
        direct_stereo=tc.direct_stereo,
        with_mapping=False,
        fuse_search=sys_.mapper.cfg.fuse_search if sys_.mapper else None,
        log=lambda m: print(m, file=sys.stderr, flush=True),
    )
    if sys_._ba_worker is not None:
        ba_cfg = sys_.mapper.cfg.ba
        t0 = time.perf_counter()
        ms = sys_._ba_worker.pretouch(
            (16, 256, 1024), ba_cfg.lm, ba_cfg.chi2_line, ba_cfg.chi2_point, timeout=600
        )
        print(f"pretouch: {ms} ms (wall {time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)

    faulthandler.dump_traceback_later(20, repeat=True, file=sys.stderr)
    for f in range(n):
        il, ir = imgs[f]
        t0 = time.perf_counter()
        sys_.track_stereo(il, ir, f * 0.05)
        print(f"frame {f}: {(time.perf_counter()-t0)*1e3:.1f} ms", file=sys.stderr, flush=True)
    faulthandler.cancel_dump_traceback_later()
    sys_.shutdown()
    print("done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
