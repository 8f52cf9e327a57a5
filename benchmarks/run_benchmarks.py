#!/usr/bin/env python
"""Component benchmark harness (SURVEY §6.2 'perf': regression-tracked).

Times each device program of the tracking/mapping path plus the end-to-end
frame loop, prints a JSON report, and compares against
benchmarks/baselines.json when present.

    python benchmarks/run_benchmarks.py [--frames 40] [--update-baseline]

Run on CPU with `--platform cpu` for deterministic regression tracking (the
TPU tunnel's dispatch latency is load-dependent; see PERF_NOTES.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baselines.json")


def time_call(fn, reps=10):
    import jax

    jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--platform", choices=["auto", "cpu"], default="auto")
    ap.add_argument("--update-baseline", action="store_true")
    ap.add_argument("--tolerance", type=float, default=1.5, help="regression factor")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpuslam.backend.lm import LMConfig
    from tpuslam.backend.local_ba import _run_lm_jit
    from tpuslam.frontend.frame import FrontendParams, extract_features, stereo_line_depths
    from tpuslam.geometry.camera import Intrinsics
    from tpuslam.parallel.sharded_ba import _toy_problem
    from tpuslam.bench import run_benchmark

    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((480, 640)), jnp.float32)

    results = {"device": str(jax.devices()[0])}
    results["extract_ms"] = time_call(lambda: extract_features(img, FrontendParams()))
    f1 = extract_features(img, FrontendParams())
    f2 = extract_features(img * 0.5, FrontendParams())
    results["stereo_ms"] = time_call(lambda: stereo_line_depths(f1, f2, jnp.float32(50.0)))
    prob = _toy_problem(rng, P_=8, L=128, OL=512, cam=cam)
    results["local_ba_ms"] = time_call(
        lambda: _run_lm_jit(prob, cam, LMConfig(max_iters=8)), reps=3
    )
    e2e = run_benchmark(frames=args.frames, warmup=3, quiet=True)
    results["tracking_fps"] = e2e["fps_median"]
    results["track_ms_median"] = e2e["track_ms_median"]

    print(json.dumps(results, indent=2, default=float))

    if args.update_baseline:
        with open(BASELINE_PATH, "w") as f:
            json.dump(results, f, indent=2, default=float)
        print(f"baseline updated: {BASELINE_PATH}", file=sys.stderr)
        return 0

    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        bad = []
        for k, v in results.items():
            if k.endswith("_ms") and k in base and v > base[k] * args.tolerance:
                bad.append(f"{k}: {v:.2f}ms vs baseline {base[k]:.2f}ms")
        if bad:
            print("REGRESSIONS:\n  " + "\n  ".join(bad), file=sys.stderr)
            return 1
        print("no regressions vs baseline", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
