"""Probe: fused-frame program compile time + steady-state dispatch cost.

The axon compile service degrades EVERY subsequent dispatch in a process
once any single compile exceeds ~30-40 s (PERF_NOTES.md). This probe checks
whether the fused whole-frame program stays under that cliff, and what the
true (sync-drained) per-frame cost is afterwards.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.pipeline import fused_stereo_frame
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics


def main():
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    cfg = TrackerConfig()
    rng = np.random.default_rng(0)
    NL = cfg.local_capacity
    local = dict(
        plucker=jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32),
        ep3d=jnp.asarray(rng.standard_normal((NL, 2, 3)) + [0, 0, 6.0], jnp.float32),
        bits=jnp.asarray(rng.integers(0, 2**31, (NL, 8)), jnp.uint32),
        valid=jnp.ones(NL, jnp.float32),
    )
    pair = jnp.asarray((rng.random((2, cam.height, cam.width)) * 255).astype(np.uint8))
    T = jnp.eye(4, dtype=jnp.float32)
    args = (float(cam.fx * cam.baseline), cam, cfg.frontend, cfg.stereo,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8)

    t0 = time.perf_counter()
    out = fused_stereo_frame(pair, T, T, local, *args)
    np.asarray(out.packed)
    t_compile = time.perf_counter() - t0
    print(f"fused compile+first-run: {t_compile:.1f} s", flush=True)

    # true steady-state: N enqueues, ONE sync
    chain = (out.T_last, out.T_prevlast)
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        out = fused_stereo_frame(pair, chain[0], chain[1], local, *args)
        chain = (out.T_last, out.T_prevlast)
    np.asarray(out.packed)
    dt = (time.perf_counter() - t0) / N
    print(f"fused steady dispatch (amortized, device-resident pair): {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)

    # per-frame WITH a host resolve each frame (the 1-lag pattern)
    pend = None
    t0 = time.perf_counter()
    for i in range(N):
        out = fused_stereo_frame(pair, chain[0], chain[1], local, *args)
        chain = (out.T_last, out.T_prevlast)
        if pend is not None:
            np.asarray(pend.packed)
        pend = out
    np.asarray(pend.packed)
    dt = (time.perf_counter() - t0) / N
    print(f"fused + per-frame lagged resolve: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)

    # small-program dispatch cost after all the above (cliff detector)
    x = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: a @ a)
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(x)
    np.asarray(y)
    dt = (time.perf_counter() - t0) / 20
    print(f"small-program dispatch after fused compile: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
