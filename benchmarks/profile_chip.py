"""True (sync-drained) per-stage profiling on the real chip.

PERF_NOTES.md measurement rule: block_until_ready returns at ENQUEUE on the
axon backend; real cost = N enqueues + ONE host sync, / N. This script
measures each per-frame stage that way, plus the raw relay round-trip and
the end-to-end frame loop, so perf work targets the true bottleneck.

Run on the chip:  python benchmarks/profile_chip.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timed(name, fn, n=20):
    fn()  # compile + settle
    sync_out = fn()
    sync(sync_out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {dt:8.2f} ms")
    return dt


import jax
import jax.numpy as jnp

from tpuslam.frontend.frame import FrontendParams, StereoParams, extract_features, stereo_line_depths
from tpuslam.frontend.matcher import ProjectionSearchParams, tracked_pose_step
from tpuslam.backend.pose_opt import PoseOptConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image


def main():
    print("device:", jax.devices()[0])
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=4, cam=cam, motion_scale=0.02)
    il = render_wireframe_image(scene, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    ir = render_wireframe_image(scene_r, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0

    fe = FrontendParams()
    sp = StereoParams()
    il_d = jnp.asarray(il)
    ir_d = jnp.asarray(ir)

    # raw relay RTT: trivial program, enqueue+sync each iteration
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    sync(tiny(x))
    t0 = time.perf_counter()
    for _ in range(20):
        sync(tiny(x))
    rtt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{'relay RTT (enqueue+sync each)':36s} {rtt:8.2f} ms")

    timed("h2d image upload", lambda: jnp.asarray(il))
    timed("extract_features (1 image)", lambda: extract_features(il_d, fe))

    fl = extract_features(il_d, fe)
    fr = extract_features(ir_d, fe)
    fxb = jnp.float32(cam.fx * cam.baseline)
    timed("stereo_line_depths", lambda: stereo_line_depths(fl, fr, fxb, sp))

    feats = stereo_line_depths(fl, fr, fxb, sp)
    NL = 1024
    map_plucker = jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32)
    map_ep3d = jnp.asarray(rng.standard_normal((NL, 2, 3)) + np.array([0, 0, 6.0]), jnp.float32)
    map_bits = jnp.asarray(rng.integers(0, 2**31, (NL, 8)).astype(np.uint32))
    map_valid = jnp.ones(NL, jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32)
    sc = ProjectionSearchParams(radius=50.0)
    sf = ProjectionSearchParams(radius=20.0)
    po = PoseOptConfig()

    timed(
        "tracked_pose_step (1 stage)",
        lambda: tracked_pose_step(T0, map_plucker, map_ep3d, map_bits, map_valid, feats, cam, sc, po),
    )

    def full_frame():
        fl = extract_features(il_d, fe)
        fr = extract_features(ir_d, fe)
        f = stereo_line_depths(fl, fr, fxb, sp)
        c = tracked_pose_step(T0, map_plucker, map_ep3d, map_bits, map_valid, f, cam, sc, po)
        t = tracked_pose_step(c.pose, map_plucker, map_ep3d, map_bits, map_valid, f, cam, sf, po)
        return t.packed

    timed("full frame (enqueue-chain, 1 sync/N)", full_frame)

    # per-frame WITH a sync each frame (what sequential tracking pays)
    full_frame()
    sync(full_frame())
    t0 = time.perf_counter()
    for _ in range(10):
        sync(full_frame())
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{'full frame (sync each)':36s} {dt:8.2f} ms")

    # pipelined two-in-flight: sync frame i-1's packed while i is enqueued
    pending = None
    full_frame()
    t0 = time.perf_counter()
    for _ in range(20):
        out = full_frame()
        if pending is not None:
            sync(pending)
        pending = out
    sync(pending)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{'full frame (1-frame pipelined)':36s} {dt:8.2f} ms")

    # LSD sub-stage breakdown at detection level
    from tpuslam.kernels.lsd import LSDParams, detect_lines
    timed("detect_lines L0 640x480", lambda: detect_lines(il_d, 256, LSDParams()))
    lvl1 = jax.image.resize(il_d, (384, 512), "linear")
    timed("detect_lines L1 384x512", lambda: detect_lines(lvl1, 256, LSDParams()))

    from tpuslam.kernels.lbd import LBDParams, lbd_descriptors
    from tpuslam.kernels.image import image_gradients, build_pyramid

    det = detect_lines(il_d, 256, LSDParams())
    gx, gy, _, _ = image_gradients(il_d * 255.0)
    timed("lbd_descriptors", lambda: lbd_descriptors(gx, gy, det.endpoints, LBDParams()))
    timed("build_pyramid", lambda: tuple(build_pyramid(il_d, 2, 0.8, 0.6)))


if __name__ == "__main__":
    main()
