"""Probe: is upload/compute overlap achievable AT ALL on the axon tunnel,
at the production (prescaled half-res) shapes?

Measures, with the real fused tracking program:
  A  upload-only cost of the 2x240x320 u8 pair (drained)
  B  compute-only pipelined (device-resident pair, lag-2 async resolve)
  C  dispatch-then-upload each frame, main thread only
  D  dispatch-then-upload from a worker thread (AsyncUploader)
  E  upload-then-dispatch (the pre-fix order, for reference)

If no ordering gets C/D below B + A, the relay serializes RPCs and the only
levers left are fewer bytes / fewer RPCs.
"""
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams, host_prescale
from tpuslam.frontend.pipeline import AsyncUploader, fused_stereo_frame
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams, inject_coord_scale

N = 40


def main():
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=2, cam=cam, motion_scale=0.02)
    il_full = render_wireframe_image(scene, 0, noise=1.0, rng=rng)

    fe = FrontendParams(base_scale=0.5, prescaled=True)
    sd = inject_coord_scale(DirectStereoParams(), fe.base_scale, True)
    cfg = TrackerConfig(frontend=fe, direct_stereo=sd)
    il = host_prescale(il_full, fe)
    pair_h = np.ascontiguousarray(np.stack([il, il]))
    print(f"pair bytes: {pair_h.nbytes/1024:.0f} KB", flush=True)

    NL = cfg.local_capacity
    local = dict(
        plucker=jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32),
        ep3d=jnp.asarray(rng.standard_normal((NL, 2, 3)) + [0, 0, 6.0], jnp.float32),
        bits=jnp.asarray(rng.integers(0, 2**31, (NL, 8)), jnp.uint32),
        valid=jnp.ones(NL, jnp.float32),
    )
    T = jnp.eye(4, dtype=jnp.float32)
    args = (float(cam.fx * cam.baseline), cam, cfg.frontend, cfg.stereo,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8)
    pair_dev = jax.device_put(pair_h)

    def run_frame(pd, chain):
        out = fused_stereo_frame(pd, chain[0], chain[1], local, *args, sd=sd)
        try:
            out.packed.copy_to_host_async()
        except Exception:
            pass
        return out

    # compile + settle
    chain = (T, T)
    out = run_frame(pair_dev, chain)
    np.asarray(out.packed)

    # A: upload-only, drained
    t0 = time.perf_counter()
    xs = [jax.device_put(pair_h) for _ in range(N)]
    np.asarray(xs[-1][0, :1, :1])
    a = (time.perf_counter() - t0) / N * 1e3
    print(f"A upload-only             {a:7.2f} ms", flush=True)

    def pipeline(feed):
        """feed(i) -> device pair for frame i; lag-2 resolve."""
        chain = (T, T)
        pend = deque()
        t0 = time.perf_counter()
        for i in range(N):
            pd = feed(i)
            out = run_frame(pd, chain)
            chain = (out.T_last, out.T_prevlast)
            pend.append(out)
            if len(pend) > 2:
                np.asarray(pend.popleft().packed)
        while pend:
            np.asarray(pend.popleft().packed)
        return (time.perf_counter() - t0) / N * 1e3

    # B: compute-only (device-resident)
    b = pipeline(lambda i: pair_dev)
    print(f"B compute-only pipelined  {b:7.2f} ms", flush=True)

    # C: dispatch first, then upload next (main thread)
    state = {"next": jax.device_put(pair_h)}

    def feed_c(i):
        pd = state["next"]
        return pd

    chain = (T, T)
    pend = deque()
    t0 = time.perf_counter()
    for i in range(N):
        pd = state["next"]
        out = run_frame(pd, chain)
        chain = (out.T_last, out.T_prevlast)
        state["next"] = jax.device_put(pair_h)  # upload AFTER dispatch
        pend.append(out)
        if len(pend) > 2:
            np.asarray(pend.popleft().packed)
    while pend:
        np.asarray(pend.popleft().packed)
    c = (time.perf_counter() - t0) / N * 1e3
    print(f"C dispatch-then-upload    {c:7.2f} ms", flush=True)

    # D: uploader worker thread, dispatch first then submit
    up = AsyncUploader()
    handle = up.submit(pair_h)
    chain = (T, T)
    pend = deque()
    t0 = time.perf_counter()
    for i in range(N):
        (pd,) = handle.get()
        out = run_frame(pd, chain)
        chain = (out.T_last, out.T_prevlast)
        handle = up.submit(pair_h)
        pend.append(out)
        if len(pend) > 2:
            np.asarray(pend.popleft().packed)
    while pend:
        np.asarray(pend.popleft().packed)
    d = (time.perf_counter() - t0) / N * 1e3
    print(f"D worker-thread uploader  {d:7.2f} ms", flush=True)

    # E: upload-then-dispatch (pre-fix order)
    chain = (T, T)
    pend = deque()
    t0 = time.perf_counter()
    for i in range(N):
        pd = jax.device_put(pair_h)
        out = run_frame(pd, chain)
        chain = (out.T_last, out.T_prevlast)
        pend.append(out)
        if len(pend) > 2:
            np.asarray(pend.popleft().packed)
    while pend:
        np.asarray(pend.popleft().packed)
    e = (time.perf_counter() - t0) / N * 1e3
    print(f"E upload-then-dispatch    {e:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
