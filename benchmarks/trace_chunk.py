"""On-chip jax.profiler trace of the production semi-direct chunk program
(VERDICT r2/r3 standing item: attribute device time by op, not by
host-side subtraction).

Captures a trace while the fused chunk program runs on device-resident
frames, then parses the TensorBoard trace.json.gz and prints the top op
groups by device time. Run on the chip, alone on the box:

    python benchmarks/trace_chunk.py [--hybrid] [--chunk 6] [--out /tmp/tpuslam_trace]

The summary (not the raw trace) goes into PERF_NOTES.md.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--hybrid", action="store_true")
    ap.add_argument("--out", default="/tmp/tpuslam_trace")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpuslam  # noqa: F401  (enables the persistent compile cache)
    from tpuslam.frontend.frame import FrontendParams, host_prescale, prescaled_shape
    from tpuslam.geometry.camera import Intrinsics
    from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image

    print("backend:", jax.default_backend(), jax.devices())
    cam = Intrinsics(
        fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11
    )
    fe = FrontendParams(base_scale=0.5, prescaled=True)
    rng = np.random.default_rng(0)
    C = args.chunk
    scene = make_wireframe_scene(
        rng, n_segments=140, n_points=120, n_frames=C + 2, cam=cam, motion_scale=0.02
    )
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    il0 = render_wireframe_image(scene, 0, noise=1.0, rng=rng, draw_points=args.hybrid)
    ir0 = render_wireframe_image(scene_r, 0, noise=1.0, rng=rng, draw_points=args.hybrid)
    stack = [host_prescale(il0, fe), host_prescale(ir0, fe)]
    for j in range(1, C):
        stack.append(
            host_prescale(
                render_wireframe_image(scene, j, noise=1.0, rng=rng,
                                       draw_points=args.hybrid),
                fe,
            )
        )
    frames = jnp.asarray(np.ascontiguousarray(np.stack(stack)))

    from tpuslam.backend.pose_opt import PoseOptConfig
    from tpuslam.frontend.matcher import ProjectionSearchParams
    from tpuslam.kernels.align_direct import DirectAlignParams, inject_coord_scale_align
    from tpuslam.kernels.stereo_direct import (
        DirectPointStereoParams,
        DirectStereoParams,
        inject_coord_scale,
    )

    NL = 1024
    local = dict(
        plucker=jnp.asarray(rng.standard_normal((NL, 6)), jnp.float32),
        ep3d=jnp.asarray(rng.standard_normal((NL, 2, 3)) + [0, 0, 6.0], jnp.float32),
        bits=jnp.asarray(rng.integers(0, 2**31, (NL, 8)), jnp.uint32),
        valid=jnp.ones(NL, jnp.float32),
    )
    T = jnp.eye(4, dtype=jnp.float32)
    sd = inject_coord_scale(DirectStereoParams(), fe.base_scale, fe.prescaled)
    ap_ = inject_coord_scale_align(DirectAlignParams(), fe.base_scale, fe.prescaled)
    sc = ProjectionSearchParams(radius=50.0)
    sf = ProjectionSearchParams(radius=20.0)
    po = PoseOptConfig()
    common = (float(cam.fx * cam.baseline), cam, fe, sc, sf, po, 8)

    if args.hybrid:
        from tpuslam.frontend.pipeline import fused_stereo_semidirect_hybrid
        from tpuslam.frontend.points import PointFrontendParams

        NP = 512
        plocal = dict(
            xyz=jnp.asarray(rng.standard_normal((NP, 3)) + [0, 0, 6.0], jnp.float32),
            bits=jnp.asarray(rng.integers(0, 2**31, (NP, 8)), jnp.uint32),
            valid=jnp.ones(NP, jnp.float32),
        )
        sdp = inject_coord_scale(
            DirectPointStereoParams(), fe.base_scale, fe.prescaled
        )
        pp = PointFrontendParams()

        def run(chain):
            return fused_stereo_semidirect_hybrid(
                frames, chain[0], chain[1], local, plocal, *common,
                sd=sd, sdp=sdp, pp=pp, ap=ap_,
            )
    else:
        from tpuslam.frontend.pipeline import fused_stereo_semidirect

        def run(chain):
            return fused_stereo_semidirect(
                frames, chain[0], chain[1], local, *common, sd=sd, ap=ap_
            )

    # compile + settle OUTSIDE the trace
    chain = (T, T)
    t0 = time.perf_counter()
    out = run(chain)
    np.asarray(out.packed)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(3):
        out = run((out.T_last, out.T_prevlast))
    np.asarray(out.packed)
    print(f"warm 3x: {(time.perf_counter()-t0)/3*1e3:.1f} ms/dispatch")

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = run((out.T_last, out.T_prevlast))
        np.asarray(out.packed)

    summarize(args.out, args.iters, C)


def summarize(out_dir: str, iters: int, C: int):
    """Aggregate device-op durations from the newest trace.json.gz."""
    traces = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace file found under", out_dir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    # device lanes: pid names containing TPU/device; fall back to everything
    # with 'dur' if the naming differs on this backend
    pid_names = {
        m.get("pid"): m.get("args", {}).get("name", "")
        for m in data.get("traceEvents", [])
        if m.get("ph") == "M" and m.get("name") == "process_name"
    }
    dev_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n or "Axon" in n
    }
    agg = defaultdict(float)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        # group fusions by their root op name
        key = name.split(".")[0].split("(")[0][:60]
        agg[key] += ev["dur"] / 1e3  # us -> ms
        total += ev["dur"] / 1e3
    print(f"\ntrace: {traces[-1]}")
    print(f"device total {total:.1f} ms over {iters} dispatches x {C} frames "
          f"= {total/max(iters,1):.2f} ms/dispatch, {total/max(iters*C,1):.2f} ms/frame")
    print(f"{'op group':50s} {'ms':>9s} {'%':>6s}")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{k:50s} {v:9.2f} {100*v/max(total,1e-9):5.1f}%")


if __name__ == "__main__":
    main()
