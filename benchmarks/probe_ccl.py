"""Probe: Pallas strip-tiled CCL vs XLA scan CCL on the real chip.

True (sync-drained) timings of detect_lines under both backends at VGA, plus
a result-parity check on a rendered frame.
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.lsd import LSDParams, detect_lines


def bench(img, params, n=30):
    det = detect_lines(img, 256, params)
    np.asarray(det.valid)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(n):
        det = detect_lines(img, 256, params)
    np.asarray(det.valid)
    return (time.perf_counter() - t0) / n * 1e3, det


def main():
    from tpuslam.geometry.camera import Intrinsics

    rng = np.random.default_rng(0)
    # the three production resolutions: half-res tracking ingest, VGA,
    # KITTI odometry width (reach-scaled ccl_jumps kick in above 768)
    resolutions = [
        ("half-VGA 320x240", Intrinsics(fx=229, fy=228.5, cx=160, cy=120, width=320, height=240)),
        ("VGA 640x480", Intrinsics(fx=458, fy=457, cx=320, cy=240, width=640, height=480)),
        ("KITTI 1241x376", Intrinsics(fx=718.9, fy=718.9, cx=607, cy=185, width=1248, height=376)),
    ]
    for name, cam in resolutions:
        scene = make_wireframe_scene(rng, n_segments=120, n_frames=1, cam=cam)
        img = jnp.asarray(
            render_wireframe_image(scene, 0, noise=1.0, rng=rng).astype(np.float32)
            / 255.0
        )
        t0 = time.perf_counter()
        ms_x, det_x = bench(img, LSDParams(ccl="xla"))
        print(f"[{name}] xla    ccl: {ms_x:7.2f} ms/image (compile+first {time.perf_counter()-t0:.1f}s)", flush=True)
        t0 = time.perf_counter()
        ms_p, det_p = bench(img, LSDParams(ccl="pallas"))
        print(f"[{name}] pallas ccl: {ms_p:7.2f} ms/image (compile+first {time.perf_counter()-t0:.1f}s)", flush=True)
        va, vb = np.asarray(det_x.valid), np.asarray(det_p.valid)
        ok = np.array_equal(va, vb) and np.allclose(
            np.asarray(det_x.endpoints), np.asarray(det_p.endpoints), atol=1e-2
        )
        print(
            f"[{name}] parity: {'OK' if ok else 'MISMATCH'} "
            f"({int(va.sum())} vs {int(vb.sum())} lines)  speedup x{ms_x/ms_p:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
