"""Probe: fused-frame variants — descriptor stereo vs direct epipolar
stereo (kernels/stereo_direct.py) x full-res vs half-res detection
(FrontendParams.base_scale).

One variant per process invocation (compile-lottery hygiene — a slow
compile degrades later dispatches in the same process):

    python benchmarks/probe_direct.py desc|direct|desc-half|direct-half
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


def main(mode: str):
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    pre = mode.endswith("-pre")
    if pre:
        mode = mode[: -len("-pre")]
    fe = FrontendParams(
        base_scale=0.5 if mode.endswith("-half") else 1.0, prescaled=pre
    )
    sd = DirectStereoParams() if mode.startswith("direct") else None
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
    if pre:
        from tpuslam.frontend.frame import host_prescale
        from tpuslam.kernels.stereo_direct import inject_coord_scale

        il = host_prescale(il, fe)
        sd = inject_coord_scale(sd, fe.base_scale, True)
    pair = jnp.asarray(np.stack([il, il]))
    T = jnp.eye(4, dtype=jnp.float32)
    args = (float(cam.fx * cam.baseline), cam, cfg.frontend, cfg.stereo,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8)

    t0 = time.perf_counter()
    out = fused_stereo_frame(pair, T, T, local, *args, sd=sd)
    np.asarray(out.packed)
    print(f"[{mode}] compile+first-run: {time.perf_counter() - t0:.1f} s", flush=True)

    chain = (out.T_last, out.T_prevlast)
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        out = fused_stereo_frame(pair, chain[0], chain[1], local, *args, sd=sd)
        chain = (out.T_last, out.T_prevlast)
    np.asarray(out.packed)
    dt = (time.perf_counter() - t0) / N
    print(f"[{mode}] steady dispatch: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)

    for lag in (1, 2, 3):
        from collections import deque

        pend = deque()
        t0 = time.perf_counter()
        for i in range(N):
            out = fused_stereo_frame(pair, chain[0], chain[1], local, *args, sd=sd)
            chain = (out.T_last, out.T_prevlast)
            pend.append(out)
            if len(pend) > lag:
                np.asarray(pend.popleft().packed)
        while pend:
            np.asarray(pend.popleft().packed)
        dt = (time.perf_counter() - t0) / N
        print(f"[{mode}] + lag-{lag} resolve: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)

    # async d2h: start the copy at enqueue, block on it `lag` frames later
    for lag in (1, 2):
        from collections import deque

        pend = deque()
        t0 = time.perf_counter()
        for i in range(N):
            out = fused_stereo_frame(pair, chain[0], chain[1], local, *args, sd=sd)
            chain = (out.T_last, out.T_prevlast)
            try:
                out.packed.copy_to_host_async()
            except Exception as e:
                print(f"[{mode}] copy_to_host_async unsupported: {e!r}", flush=True)
                return
            pend.append(out)
            if len(pend) > lag:
                np.asarray(pend.popleft().packed)
        while pend:
            np.asarray(pend.popleft().packed)
        dt = (time.perf_counter() - t0) / N
        print(f"[{mode}] + async lag-{lag} resolve: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)

    # batched resolve: device-side ring of packed vectors, ONE d2h per K frames
    import jax as _jax

    @_jax.jit
    def _stack8(*ps):
        return jnp.stack(ps)

    for K in (4, 8):
        ring = []
        t0 = time.perf_counter()
        for i in range(N):
            out = fused_stereo_frame(pair, chain[0], chain[1], local, *args, sd=sd)
            chain = (out.T_last, out.T_prevlast)
            ring.append(out.packed)
            if len(ring) == K:
                np.asarray(jnp.stack(ring))
                ring = []
        if ring:
            np.asarray(jnp.stack(ring))
        dt = (time.perf_counter() - t0) / N
        print(f"[{mode}] + every-{K} batched resolve: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "direct"))
