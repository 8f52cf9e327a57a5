"""Probe: steady-state cost structure of the semi-direct chunk path.

bench (chip, chunk=4): 37.4 fps wall — parity with the single-frame path's
39.2 despite the detector amortizing over the chunk. This probe attributes
the per-chunk wall cost: chunk program device time (device-resident feed),
upload time of the (C+1, H, W) stack, resolve RTT, and the host loop around
them, at several chunk sizes.
"""
import os
import sys
import time
from collections import deque

import numpy as np

import tpuslam  # noqa: F401  (matmul precision, compile cache)
import jax
import jax.numpy as jnp

from tpuslam.frontend.frame import FrontendParams, host_prescale
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.align_direct import DirectAlignParams
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    chunks = [int(x) for x in os.environ.get("PROBE_CHUNKS", "4,8").split(",")]
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    n = 40
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

    for C in chunks:
        tcfg = TrackerConfig(
            pipelined=True,
            chunk=C,
            frontend=FrontendParams(base_scale=0.5, prescaled=True),
            direct_stereo=DirectStereoParams(),
            semidirect=DirectAlignParams(),
        )
        sys_ = System(cam, sensor="stereo", loop_closing=False, mapping=False,
                      tracker_cfg=tcfg)
        # warm + populate the map through the real path
        t0 = time.time()
        for f in range(n):
            il, ir = imgs[f]
            sys_.track_stereo(il, ir, f * 0.05)
        sys_.tracker.flush_all()
        log(f"C={C}: warm loop {time.time()-t0:.1f}s state={sys_.tracker.state.name}")

        tr = sys_.tracker
        fe = tr.cfg.frontend
        # ---- steady-state device cost of the chunk program ----------------
        from tpuslam.frontend.pipeline import fused_stereo_semidirect

        def chunk_frames(i):
            il0, ir0 = imgs[i % n]
            stack = [host_prescale(il0, fe), host_prescale(ir0, fe)]
            for j in range(1, C):
                stack.append(host_prescale(imgs[(i + j) % n][0], fe))
            return np.ascontiguousarray(np.stack(stack))

        stacks_h = [chunk_frames(i * C) for i in range(6)]
        stacks = [jnp.asarray(s) for s in stacks_h]
        np.asarray(stacks[-1][0, :1, :1])  # drain uploads
        local = tr._local_map_arrays()
        T = jnp.eye(4, dtype=jnp.float32)
        chain = (T, T)
        args = (
            local, float(cam.fx * cam.baseline), cam, fe,
            tr.cfg.search_coarse, tr.cfg.search_fine, tr.cfg.pose_opt,
            tr.cfg.min_track_inliers,
        )
        out = fused_stereo_semidirect(
            stacks[0], chain[0], chain[1], *args,
            sd=tr._direct_lines(), ap=tr._align_params(),
        )
        np.asarray(out.packed)  # true drain
        N = 16
        pend = deque()
        t0 = time.perf_counter()
        for i in range(N):
            out = fused_stereo_semidirect(
                stacks[i % 6], chain[0], chain[1], *args,
                sd=tr._direct_lines(), ap=tr._align_params(),
            )
            chain = (out.T_last, out.T_prevlast)
            try:
                out.packed.copy_to_host_async()
            except Exception:
                pass
            pend.append(out)
            if len(pend) > 2:
                np.asarray(pend.popleft().packed)
        while pend:
            np.asarray(pend.popleft().packed)
        dt = (time.perf_counter() - t0) / N
        log(f"C={C}: chunk program steady {dt*1e3:.1f} ms/chunk = "
            f"{dt/C*1e3:.2f} ms/frame ({C/dt:.1f} fps device-feed)")

        # ---- upload cost of one chunk stack --------------------------------
        t0 = time.perf_counter()
        for i in range(6):
            d = jax.device_put(stacks_h[i])
        np.asarray(d[0, :1, :1])
        up = (time.perf_counter() - t0) / 6
        log(f"C={C}: h2d {stacks_h[0].nbytes/1024:.0f} KB stack: "
            f"{up*1e3:.1f} ms ({up/C*1e3:.2f} ms/frame)")

        # ---- full host loop, tracking only (wall) --------------------------
        t0 = time.perf_counter()
        for f in range(n):
            il, ir = imgs[f]
            sys_.track_stereo(il, ir, (n + f) * 0.05)
        sys_.tracker.flush_all()
        wall = time.perf_counter() - t0
        log(f"C={C}: host-feed wall {wall/n*1e3:.1f} ms/frame ({n/wall:.1f} fps), "
            f"state={sys_.tracker.state.name}")
        sys_.shutdown()


if __name__ == "__main__":
    main()
