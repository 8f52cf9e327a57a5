"""Probe: what induces the in-bench dispatch floor?

A fresh process dispatching ONLY the fused frame achieves 17.8 ms steady
(probe_direct.py). The bench process — same program, same shapes — floors
at ~33-41 ms. This probe reproduces the bench's program population step by
step and measures the fused dispatch after each stage:

    stage 0: fused program only              (probe_direct baseline)
    stage 1: + full warmup_tracking ladder   (what the bench compiles)
    stage 2: + 60 tracked frames w/ resolves (uploader thread, d2h churn)

Run: python benchmarks/probe_floor.py [stage]
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


def main(stage: int):
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    fe = FrontendParams(base_scale=0.5)
    sd = DirectStereoParams()
    cfg = TrackerConfig(frontend=fe, direct_stereo=sd)
    rng = np.random.default_rng(0)
    NL = cfg.local_capacity
    local = dict(
        plucker=jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32),
        ep3d=jnp.asarray(rng.standard_normal((NL, 2, 3)) + [0, 0, 6.0], jnp.float32),
        bits=jnp.asarray(rng.integers(0, 2**31, (NL, 8)), jnp.uint32),
        valid=jnp.ones(NL, jnp.float32),
    )
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=2, cam=cam, motion_scale=0.02)
    il = render_wireframe_image(scene, 0, noise=1.0, rng=rng)
    pair = jnp.asarray(np.stack([il, il]))

    measure("stage0: fused only", pair, local, cfg, cam, sd)
    if stage < 1:
        return
    from tpuslam.warmup import warmup_tracking

    t0 = time.perf_counter()
    warmup_tracking(
        cam,
        frontend_params=fe,
        search_params=(cfg.search_coarse, cfg.search_fine),
        pose_opt_cfg=cfg.pose_opt,
        local_capacity=NL,
        direct_stereo=sd,
        with_mapping=False,
        log=lambda m: print(m, flush=True),
    )
    print(f"warmup ladder: {time.perf_counter()-t0:.1f} s", flush=True)
    measure("stage1: + warm ladder", pair, local, cfg, cam, sd)
    if stage < 2:
        return
    # tracked frames with per-frame host resolve + uploader thread
    from tpuslam.frontend.pipeline import AsyncUploader

    up = AsyncUploader()
    chain = (jnp.eye(4), jnp.eye(4))
    args = (float(cam.fx * cam.baseline), cam, cfg.frontend, cfg.stereo,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8)
    pend = None
    for i in range(60):
        (pd,) = up.submit(np.stack([il, il])).get()
        out = fused_stereo_frame(pd, chain[0], chain[1], local, *args, sd=sd)
        chain = (out.T_last, out.T_prevlast)
        if pend is not None:
            np.asarray(pend.packed)
        pend = out
    np.asarray(pend.packed)
    measure("stage2: + tracked frames", pair, local, cfg, cam, sd)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2))
