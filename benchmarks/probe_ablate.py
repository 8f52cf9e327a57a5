"""Probe: cost structure of the fused direct-stereo frame at the production
config (prescaled half-res VGA). Measures steady-dispatch throughput (N
enqueues, one sync — the only reliable methodology on this tunnel,
PERF_NOTES.md) of:

- the full fused program (anchor; must reproduce ~10 ms),
- the extract-only program (detector + LBD share),
- full-program variants with cheaper detector params (ccl_rounds,
  max_lines, n_levels) to see which knob buys frame time.

All programs hit the persistent compile cache after the first run.
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
    fn()  # compile + first run
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn()
    out = fn()
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
    )
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=2, cam=cam, motion_scale=0.02)
    il_full = render_wireframe_image(scene, 0, noise=1.0, rng=rng)

    def make(fe_kw=None, lsd_kw=None):
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
            return out.packed

        def extract():
            img = pair[0].astype(jnp.float32) / 255.0
            return _fused_extract(img, fe).valid

        return frame, extract

    frame, extract = make()
    print(f"full fused frame (anchor): {steady(frame):.2f} ms", flush=True)
    print(f"extract only:              {steady(extract):.2f} ms", flush=True)

    for label, fe_kw, lsd_kw in [
        ("ccl_rounds=32", None, {"ccl_rounds": 32}),
        ("ccl_rounds=48", None, {"ccl_rounds": 48}),
        ("max_lines=128", {"max_lines": 128}, None),
        ("max_lines=192", {"max_lines": 192}, None),
        ("n_levels=1", {"n_levels": 1}, None),
    ]:
        frame, _ = make(fe_kw, lsd_kw)
        print(f"variant {label:16s}: {steady(frame):.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
