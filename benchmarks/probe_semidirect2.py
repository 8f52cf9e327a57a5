"""Probe: attribute the semi-direct host-path overhead.

probe_semidirect.py: the chunk program runs at 3.6 (C=4) / 2.2 (C=8)
ms/frame device-side and the stack upload is ~3 ms/frame, yet the bench
walls at ~27 ms/frame. This probe runs ONE continuous pass (no sequence
rewind — rewinding poisons the motion model and measures the fallback
storm) with per-method wall accounting on the tracker, mapping off and on.
"""
import os
import sys
import time
from collections import defaultdict

import numpy as np

import tpuslam  # noqa: F401
import jax

from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.tracking import TrackerConfig, Tracker
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.align_direct import DirectAlignParams
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System


def log(m):
    print(m, file=sys.stderr, flush=True)


acc = defaultdict(lambda: [0.0, 0])


def wrap(obj, name):
    fn = getattr(obj, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        e = acc[name]
        e[0] += time.perf_counter() - t0
        e[1] += 1
        return r

    setattr(obj, name, wrapped)


def run(mapping: bool, C: int, imgs, cam, n_warm=24):
    acc.clear()
    tcfg = TrackerConfig(
        pipelined=True,
        chunk=C,
        frontend=FrontendParams(base_scale=0.5, prescaled=True),
        direct_stereo=DirectStereoParams(),
        semidirect=DirectAlignParams(),
    )
    if os.environ.get("PROBE_FUSE_DEFER", "0") == "1" and mapping:
        from tpuslam.backend.mapping import MapperConfig

        mcfg = MapperConfig(fuse_defer=True)
    else:
        mcfg = None
    sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=mapping,
                  tracker_cfg=tcfg, mapper_cfg=mcfg)
    if os.environ.get("PROBE_WARMUP", "1") == "1":
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
            chunk=tc.chunk,
            semidirect=tc.semidirect,
            with_mapping=False,
            fuse_search=sys_.mapper.cfg.fuse_search if sys_.mapper else None,
            log=log,
        )
    tr = sys_.tracker
    for name in ("_semidirect_compute", "_resolve_fused_one", "_kf_begin",
                 "_kf_finish", "_local_map_arrays", "_stereo_features",
                 "_track_reference_keyframe"):
        wrap(tr, name)
    if sys_.mapper is not None:
        for name in dir(type(sys_.mapper)):
            if name.startswith("__"):
                continue
            if callable(getattr(type(sys_.mapper), name, None)):
                wrap(sys_.mapper, name)
        if sys_.mapper.solver is not None:
            for name in ("submit", "poll", "pretouch"):
                if hasattr(sys_.mapper.solver, name):
                    wrap(sys_.mapper.solver, name)
        import tpuslam.backend.mapping as _mapping_mod
        import tpuslam.backend.local_ba as _lba_mod

        fn_asm = _lba_mod.assemble_problem

        def asm_timed(*a, **k):
            t0 = time.perf_counter()
            r = fn_asm(*a, **k)
            e = acc["assemble_problem"]
            e[0] += time.perf_counter() - t0
            e[1] += 1
            return r

        _mapping_mod.assemble_problem = asm_timed
        wrap(sys_.map, "update_connections")
    n = len(imgs)
    t_steady = None
    for f in range(n):
        il, ir = imgs[f]
        if f == n_warm:
            for k in acc:
                acc[k] = [0.0, 0]
            t_steady = time.perf_counter()
        sys_.track_stereo(il, ir, f * 0.05)
    tr.flush_all()
    wall = time.perf_counter() - t_steady
    n_t = n - n_warm
    log(f"C={C} mapping={mapping}: steady wall {wall/n_t*1e3:.1f} ms/frame "
        f"({n_t/wall:.1f} fps), kfs={len(sys_.map.keyframes)}, "
        f"state={tr.state.name}")
    for k, (t, c) in sorted(acc.items(), key=lambda kv: -kv[1][0]):
        if c:
            log(f"  {k}: total {t*1e3:7.1f} ms over {c:3d} calls "
                f"({t/c*1e3:6.1f} ms/call, {t/n_t*1e3:5.1f} ms/frame)")
    sys_.shutdown()


def main():
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    n = int(os.environ.get("PROBE_FRAMES", "144"))
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=n, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    imgs = [
        (render_wireframe_image(scene, f, noise=1.0, rng=rng),
         render_wireframe_image(scene_r, f, noise=1.0, rng=rng))
        for f in range(n)
    ]
    log(f"backend: {jax.default_backend()}")
    for C in (int(x) for x in os.environ.get("PROBE_CHUNKS", "4,8").split(",")):
        run(False, C, imgs, cam)
        if os.environ.get("PROBE_MAPPING", "1") == "1":
            run(True, C, imgs, cam)


if __name__ == "__main__":
    main()
