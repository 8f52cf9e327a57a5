"""Probe: split detect_lines cost into CCL / jumps / moments / merge parts."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.lsd import LSDParams, detect_lines
from tpuslam.kernels.image import gaussian_blur, image_gradients


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
    for K in (256, 128, 64):
        ms = timed(lambda: detect_lines(img, K, LSDParams()))
        print(f"detect K={K:3d} merge=on : {ms:6.2f} ms", flush=True)
    ms = timed(lambda: detect_lines(img, 256, LSDParams(merge_fragments=False)))
    print(f"detect K=256 merge=off: {ms:6.2f} ms", flush=True)
    ms = timed(lambda: detect_lines(img, 256, LSDParams(ccl_jumps=0, merge_fragments=False)))
    print(f"detect K=256 jumps=0 merge=off: {ms:6.2f} ms", flush=True)
    ms = timed(lambda: detect_lines(img, 256, LSDParams(ccl_rounds=1, ccl_jumps=0, merge_fragments=False)))
    print(f"detect K=256 rounds=1 jumps=0 merge=off: {ms:6.2f} ms", flush=True)
    ms = timed(lambda: gaussian_blur(img, 0.75))
    print(f"gaussian_blur(0.75): {ms:6.2f} ms", flush=True)
    ms = timed(lambda: image_gradients(img * 255.0))
    print(f"image_gradients: {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
