"""Probe the axon h2d transfer path: latency- vs bandwidth-bound, dtype
scaling, batching, and overlap with device compute (PERF_NOTES method: N
enqueues, one true host sync)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x).ravel()[0]


def main():
    print("device:", jax.devices()[0])
    H, W = 480, 640
    rng = np.random.default_rng(0)
    img_f32 = np.asarray(rng.random((H, W)), np.float32)
    img_u8 = (img_f32 * 255).astype(np.uint8)
    both_u8 = np.stack([img_u8, img_u8])
    small = np.zeros((8,), np.float32)

    probes = [
        ("f32 640x480 (1.2 MB)", img_f32),
        ("u8  640x480 (0.3 MB)", img_u8),
        ("u8  2x640x480 (0.6 MB)", both_u8),
        ("f32 8B", small),
    ]
    tiny = jax.jit(lambda x: jnp.float32(x.ravel()[0]) + 1.0)
    for name, arr in probes:
        x = jnp.asarray(arr)
        sync(tiny(x))
        t0 = time.perf_counter()
        for _ in range(10):
            x = jnp.asarray(arr)
        sync(tiny(x))
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"h2d {name:26s} {dt:8.2f} ms")

    # device_put (async?) vs asarray
    t0 = time.perf_counter()
    xs = [jax.device_put(img_u8) for _ in range(10)]
    enq = (time.perf_counter() - t0) / 10 * 1e3
    sync(tiny(xs[-1]))
    tot = (time.perf_counter() - t0) / 10 * 1e3
    print(f"device_put u8 enqueue {enq:.2f} ms, drained {tot:.2f} ms")

    # overlap: upload next frame WHILE a compute chain runs
    from tpuslam.frontend.frame import FrontendParams, extract_features

    fe = FrontendParams()
    xf = jnp.asarray(img_f32)
    f = extract_features(xf, fe)
    sync(f.valid)

    # serial: upload, then extract, sync each iteration
    t0 = time.perf_counter()
    for _ in range(10):
        x = jnp.asarray(both_u8)
        ff = extract_features(x[0].astype(jnp.float32) / 255.0, fe)
        sync(ff.valid)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"serial upload+extract+sync      {dt:8.2f} ms")

    # pipelined: upload i+1 before syncing i (one frame in flight)
    pend = None
    x_next = jnp.asarray(both_u8)
    t0 = time.perf_counter()
    for _ in range(10):
        ff = extract_features(x_next[0].astype(jnp.float32) / 255.0, fe)
        x_next = jnp.asarray(both_u8)  # upload overlaps ff's compute?
        if pend is not None:
            sync(pend.valid)
        pend = ff
    sync(pend.valid)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"pipelined upload-overlap        {dt:8.2f} ms")


if __name__ == "__main__":
    main()
