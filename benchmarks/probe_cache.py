"""Probe: does the persistent XLA compile cache serve the TRACKING process's
fused-frame program across process restarts on the axon backend?

The BA worker already relies on it (/tmp/tpuslam_ba_cache, 24 MB of reused
executables), but round-1 notes claimed cache keys were session-scoped for
the tunnel — this measures the truth for the big fused program.

    JAX_COMPILATION_CACHE_DIR=/tmp/tpuslam_track_cache python benchmarks/probe_cache.py
(run twice; the second run's compile time is the verdict)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams, host_prescale
from tpuslam.frontend.pipeline import fused_stereo_frame
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams, inject_coord_scale


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    fe = FrontendParams(base_scale=0.5, prescaled=True)
    sd = inject_coord_scale(DirectStereoParams(), fe.base_scale, True)
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
    il = host_prescale(render_wireframe_image(scene, 0, noise=1.0, rng=rng), fe)
    pair = jnp.asarray(np.stack([il, il]))
    T = jnp.eye(4, dtype=jnp.float32)
    args = (float(cam.fx * cam.baseline), cam, cfg.frontend, cfg.stereo,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8)
    t0 = time.perf_counter()
    out = fused_stereo_frame(pair, T, T, local, *args, sd=sd)
    np.asarray(out.packed)
    print(f"compile+first-run: {time.perf_counter() - t0:.1f} s", flush=True)
    chain = (out.T_last, out.T_prevlast)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fused_stereo_frame(pair, chain[0], chain[1], local, *args, sd=sd)
        chain = (out.T_last, out.T_prevlast)
    np.asarray(out.packed)
    dt = (time.perf_counter() - t0) / 20
    print(f"steady: {dt*1e3:.2f} ms -> {1.0/dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
