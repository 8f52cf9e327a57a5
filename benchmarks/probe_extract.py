"""Probe: per-stage true timings of the extraction pipeline on the chip.

Which of pyramid / detect(level) / LBD / merge actually costs the frame its
milliseconds, and what do ccl_rounds / n_levels buy.
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.lsd import LSDParams, detect_lines


def timed(fn, n=30):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / n * 1e3


import jax  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=120, n_frames=1)
    img = jnp.asarray(
        render_wireframe_image(scene, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0
    )

    from tpuslam.frontend.frame import FrontendParams, extract_features, _pyramid_jit, _lbd_stage

    for rounds, jumps in ((64, 3), (32, 4), (16, 5), (8, 6)):
        p = LSDParams(ccl_rounds=rounds, ccl_jumps=jumps)
        ms = timed(lambda: detect_lines(img, 256, p))
        det = detect_lines(img, 256, p)
        print(f"detect rounds={rounds:3d} jumps={jumps}: {ms:6.2f} ms  lines={int(np.asarray(det.valid).sum())}", flush=True)

    ms = timed(lambda: _pyramid_jit(img, 2, 0.8))
    print(f"pyramid(2 levels): {ms:6.2f} ms", flush=True)

    det = detect_lines(img, 256, LSDParams())
    ms = timed(lambda: _lbd_stage(img, det.endpoints, FrontendParams().lbd))
    print(f"lbd stage: {ms:6.2f} ms", flush=True)

    for nl in (1, 2):
        fe = FrontendParams(n_levels=nl)
        ms = timed(lambda: extract_features(img, fe))
        f = extract_features(img, fe)
        print(f"extract n_levels={nl}: {ms:6.2f} ms  lines={int(np.asarray(f.valid).sum())}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
