"""Probe: true cost of the image front half, compiled FIRST in the process
(programs compiled after many others can be permanently degraded on this
backend — earlier in-process measurements of blur/gradients were artifacts).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.kernels.image import gaussian_blur, image_gradients
from tpuslam.kernels.lsd import LSDParams, detect_lines
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image


def timed(fn, n=30):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=120, n_frames=1)
    img = jnp.asarray(
        render_wireframe_image(scene, 0, noise=1.0, rng=rng).astype(np.float32) / 255.0
    )
    print(f"blur:      {timed(lambda: gaussian_blur(img, 0.75)):7.2f} ms", flush=True)
    print(f"gradients: {timed(lambda: image_gradients(img * 255.0)):7.2f} ms", flush=True)
    print(f"detect j1: {timed(lambda: detect_lines(img, 256, LSDParams())):7.2f} ms", flush=True)
    print(f"detect j3: {timed(lambda: detect_lines(img, 256, LSDParams(ccl_jumps=3))):7.2f} ms", flush=True)

    from tpuslam.frontend.frame import FrontendParams, extract_features

    print(f"extract 2lvl: {timed(lambda: extract_features(img, FrontendParams())):7.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
