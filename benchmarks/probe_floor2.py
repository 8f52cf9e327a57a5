"""Probe: bisect the bench-process dispatch floor.

probe_floor.py showed the floor (33-41 ms vs 15 ms fresh) is NOT caused by
the warm ladder, the uploader thread, or steady fused dispatch+resolve churn.
This probe replicates the REAL bench flow — System construction, sync init
frames, keyframe creation, kf_db adds, TrackRefKF etc. — and measures the
raw fused dispatch before and after.

Run: python benchmarks/probe_floor2.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.pipeline import fused_stereo_frame
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams


def measure(tag, pair, local, cfg, cam, sd, n=30):
    T = jnp.eye(4, dtype=jnp.float32)
    args = (float(cam.fx * cam.baseline), cam, cfg.frontend, cfg.stereo,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8)
    out = fused_stereo_frame(pair, T, T, local, *args, sd=sd)
    np.asarray(out.packed)
    chain = (out.T_last, out.T_prevlast)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fused_stereo_frame(pair, chain[0], chain[1], local, *args, sd=sd)
        chain = (out.T_last, out.T_prevlast)
    np.asarray(out.packed)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] fused steady: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)


def main():
    from tpuslam.system import System
    from tpuslam.warmup import warmup_tracking

    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    fe = FrontendParams(base_scale=0.5)
    sd = DirectStereoParams()
    cfg = TrackerConfig(frontend=fe, direct_stereo=sd, pipelined=True)
    rng = np.random.default_rng(0)
    NL = cfg.local_capacity
    local = dict(
        plucker=jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32),
        ep3d=jnp.asarray(rng.standard_normal((NL, 2, 3)) + [0, 0, 6.0], jnp.float32),
        bits=jnp.asarray(rng.integers(0, 2**31, (NL, 8)), jnp.uint32),
        valid=jnp.ones(NL, jnp.float32),
    )
    n_frames = 40
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=n_frames, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    imgs = [
        (render_wireframe_image(scene, f, noise=1.0, rng=rng),
         render_wireframe_image(scene_r, f, noise=1.0, rng=rng))
        for f in range(n_frames)
    ]
    pair = jnp.asarray(np.stack([imgs[0][0], imgs[0][0]]))

    sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=False, tracker_cfg=cfg)
    warmup_tracking(
        cam, frontend_params=fe,
        search_params=(cfg.search_coarse, cfg.search_fine),
        pose_opt_cfg=cfg.pose_opt, local_capacity=NL,
        direct_stereo=sd, with_mapping=False,
        log=lambda m: print(m, flush=True),
    )
    measure("pre: after warmup", pair, local, cfg, cam, sd)

    times = []
    for f, (il, ir) in enumerate(imgs):
        t0 = time.perf_counter()
        sys_.track_stereo(il, ir, f * 0.05)
        times.append(time.perf_counter() - t0)
        if f in (0, 1, 2, 3, 4) or f % 10 == 0:
            print(f"frame {f}: {times[-1]*1e3:.1f} ms", flush=True)
    print(f"track median: {np.median(times[6:])*1e3:.1f} ms", flush=True)
    measure("post: after System run", pair, local, cfg, cam, sd)


if __name__ == "__main__":
    sys.exit(main())
