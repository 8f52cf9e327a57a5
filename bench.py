#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): stereo VGA tracking FPS on a single chip, target
>= 200. vs_baseline = measured / 200.
"""

import json
import sys


def main():
    from tpuslam.bench import run_benchmark

    res = run_benchmark(frames=100, warmup=6, quiet=True)
    line = {
        "metric": "stereo_vga_tracking_fps",
        "value": round(res["fps_median"], 2),
        "unit": "fps",
        "vs_baseline": round(res["fps_median"] / 200.0, 4),
        "detail": {
            "track_ms_median": round(res["track_ms_median"], 3),
            "local_ba_ms": round(res["local_ba_ms"], 3),
            "device": res["device"],
            "keyframes": res["keyframes"],
            "lines": res["lines"],
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    sys.exit(main())
