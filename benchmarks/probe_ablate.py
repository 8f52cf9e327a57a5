"""Probe: cost structure of the fused direct-stereo frame at the production
config (prescaled half-res VGA). Measures steady-dispatch throughput (N
enqueues, one sync — the only reliable methodology on this tunnel,
PERF_NOTES.md) of the full fused program and variants with cheaper detector
params, to see which knob buys frame time.

ONE variant per process (argv[1]): in-process remote compiles degrade every
later dispatch in the process (PERF_NOTES.md), so comparing variants inside
one process is invalid. Run the shell loop twice — the first pass warms the
persistent compile cache, the second measures:

    for v in anchor extract ccl_rounds=32 ...; do python probe_ablate.py $v; done
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams, host_prescale, _fused_extract
from tpuslam.frontend.pipeline import fused_stereo_frame
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.lsd import LSDParams
from tpuslam.kernels.stereo_direct import DirectStereoParams, inject_coord_scale


def steady(fn, n=30):
    """Lag-2 pipelined dispatch (the production cadence, probe_overlap2's
    methodology): resolve each output two frames behind with async d2h.
    fn must return the FULL output pytree — pend keeps every buffer alive
    until its resolve: freeing an in-flight program's outputs early forces
    a sync on this backend (measured 40-60 ms/frame vs 12 when only
    out.packed was kept), and unbounded enqueue-without-resolve throttles
    at depth ~a-few and reads 3-4x high. The first leaf is the resolve key."""
    from collections import deque

    key = lambda out: out.packed if hasattr(out, "packed") else jax.tree_util.tree_leaves(out)[0]
    np.asarray(key(fn()))  # compile + drain first run
    pend = deque()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        try:
            key(out).copy_to_host_async()
        except Exception:
            pass
        pend.append(out)
        if len(pend) > 2:
            np.asarray(key(pend.popleft()))
    while pend:
        np.asarray(key(pend.popleft()))
    return (time.perf_counter() - t0) / n * 1e3


def make(fe_kw=None, lsd_kw=None):
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=2, cam=cam, motion_scale=0.02)
    il_full = render_wireframe_image(scene, 0, noise=1.0, rng=rng)

    lsd = LSDParams(**(lsd_kw or {}))
    fe = FrontendParams(base_scale=0.5, prescaled=True, lsd=lsd, **(fe_kw or {}))
    sd = inject_coord_scale(DirectStereoParams(), fe.base_scale, True)
    cfg = TrackerConfig(frontend=fe, direct_stereo=sd)
    il = host_prescale(il_full, fe)
    pair = jnp.asarray(np.stack([il, il]))
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
    state = {"chain": (T, T)}

    def frame():
        out = fused_stereo_frame(pair, state["chain"][0], state["chain"][1], local, *args, sd=sd)
        state["chain"] = (out.T_last, out.T_prevlast)
        return out

    def extract():
        img = pair[0].astype(jnp.float32) / 255.0
        return _fused_extract(img, fe)

    return frame, extract


VARIANTS = {
    "anchor": (None, None),
    "extract": ("EXTRACT", None),
    "ccl_rounds=32": (None, {"ccl_rounds": 32}),
    "ccl_rounds=48": (None, {"ccl_rounds": 48}),
    "max_lines=128": ({"max_lines": 128}, None),
    "max_lines=192": ({"max_lines": 192}, None),
    "n_levels=1": ({"n_levels": 1}, None),
    "merge_off": (None, {"merge_fragments": False}),
    "rounds32+jump2": (None, {"ccl_rounds": 32, "ccl_jumps": 2}),
    "K128+rounds32": ({"max_lines": 128}, {"ccl_rounds": 32}),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "anchor"
    if name.startswith("chunk="):
        C = int(name.split("=")[1])
        fn = make_chunk(C)
        print(f"{name:16s}: {steady(fn, n=max(8, 32 // C)) / C:.2f} ms/frame", flush=True)
        return
    fe_kw, lsd_kw = VARIANTS[name]
    if fe_kw == "EXTRACT":
        _, fn = make(None, None)
    else:
        fn, _ = make(fe_kw, lsd_kw)
    print(f"{name:16s}: {steady(fn):.2f} ms", flush=True)




def make_chunk(C):
    frame, _ = make()  # builds pair/local/args in module pattern
    # rebuild chunk inputs from the same fixtures
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=2, cam=cam, motion_scale=0.02)
    il_full = render_wireframe_image(scene, 0, noise=1.0, rng=rng)
    fe = FrontendParams(base_scale=0.5, prescaled=True)
    sd = inject_coord_scale(DirectStereoParams(), fe.base_scale, True)
    cfg = TrackerConfig(frontend=fe, direct_stereo=sd)
    il = host_prescale(il_full, fe)
    pairs = jnp.asarray(np.stack([np.stack([il, il])] * C))
    NL = cfg.local_capacity
    local = dict(
        plucker=jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32),
        ep3d=jnp.asarray(rng.standard_normal((NL, 2, 3)) + [0, 0, 6.0], jnp.float32),
        bits=jnp.asarray(rng.integers(0, 2**31, (NL, 8)), jnp.uint32),
        valid=jnp.ones(NL, jnp.float32),
    )
    T = jnp.eye(4, dtype=jnp.float32)
    state = {"chain": (T, T)}
    from tpuslam.frontend.pipeline import fused_stereo_chunk

    def chunkfn():
        out = fused_stereo_chunk(
            pairs, state["chain"][0], state["chain"][1], local,
            float(cam.fx * cam.baseline), cam, cfg.frontend,
            cfg.search_coarse, cfg.search_fine, cfg.pose_opt, 8, sd=sd,
        )
        state["chain"] = (out.T_last, out.T_prevlast)
        return out

    return chunkfn


if __name__ == "__main__":
    sys.exit(main())
