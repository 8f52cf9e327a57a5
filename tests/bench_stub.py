"""Stand-in for `python -m tpuslam.bench` in the artifact-discipline tests.

Mimics the sub-bench's output contract — emit a complete JSON result line
early, then (optionally) wedge forever like a degraded-service compile —
without importing jax, so the driver's kill/parse plumbing is testable in
seconds. Selected via TPUSLAM_BENCH_SUB_MODULE (bench.py test hook).
"""

import json
import os
import sys
import time

res = {
    "device": "stub",
    "frames": 4,
    "fps_median": 40.0,
    "fps_mean": 39.0,
    "fps_wall": 42.0,
    "track_ms_median": 25.0,
    "local_ba_ms": 12.0,
    "keyframes": 3,
    "lines": 100,
}
print(json.dumps(res), flush=True)
if os.environ.get("TPUSLAM_STUB_HANG", "1") == "1":
    print("stub: hanging after emit", file=sys.stderr, flush=True)
    time.sleep(1e6)
res["fps_device_feed"] = 300.0
res["ate_rmse"] = 0.02
print(json.dumps(res), flush=True)
