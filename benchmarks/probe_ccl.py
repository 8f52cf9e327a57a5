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
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=120, n_frames=1)
    img = jnp.asarray(
        render_wireframe_image(scene, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0
    )
    t0 = time.perf_counter()
    ms_x, det_x = bench(img, LSDParams(ccl="xla"))
    print(f"xla    ccl: {ms_x:7.2f} ms/image (compile+first {time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    ms_p, det_p = bench(img, LSDParams(ccl="pallas"))
    print(f"pallas ccl: {ms_p:7.2f} ms/image (compile+first {time.perf_counter()-t0:.1f}s)", flush=True)
    va, vb = np.asarray(det_x.valid), np.asarray(det_p.valid)
    ok = np.array_equal(va, vb) and np.allclose(
        np.asarray(det_x.endpoints), np.asarray(det_p.endpoints), atol=1e-2
    )
    print(f"parity: {'OK' if ok else 'MISMATCH'} ({int(va.sum())} vs {int(vb.sum())} lines)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
