"""Tiny CI runner: executes the lanes defined in ci.yaml (SURVEY §7).

No hosted CI exists in this environment, so the lane definitions live in a
checked-in YAML and this module is the runner:

    python -m tpuslam.ci            # list lanes
    python -m tpuslam.ci sanitize   # run one lane
    python -m tpuslam.ci --all      # run every lane except bench (chip-only)

The YAML subset parsed here is exactly what ci.yaml uses (two-level maps,
scalar values, '>' folded strings) — no external yaml dependency.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_lanes(path: str) -> dict:
    lanes: dict = {}
    cur = None
    key = None
    folding = False
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            stripped = line.strip()
            if not stripped or stripped.startswith("#"):
                continue
            indent = len(line) - len(line.lstrip())
            if folding:
                if indent >= 6:
                    lanes[cur][key] = (lanes[cur][key] + " " + stripped).strip()
                    continue
                folding = False
            if indent == 2 and stripped.endswith(":"):
                cur = stripped[:-1]
                lanes[cur] = {}
            elif indent == 4 and cur is not None and ":" in stripped:
                key, _, val = stripped.partition(":")
                key = key.strip()
                val = val.strip()
                if val == ">":
                    lanes[cur][key] = ""
                    folding = True
                else:
                    lanes[cur][key] = val
    return lanes


def run_lane(name: str, lanes: dict) -> int:
    if name not in lanes:
        print(f"unknown lane {name!r}; have {sorted(lanes)}", file=sys.stderr)
        return 2
    cmd = lanes[name]["cmd"]
    print(f"[ci] lane {name}: {cmd}", flush=True)
    # `&&` chains run each stage in its own subprocess (used by the unit
    # lane to isolate the disable-jit sanitize tests: an XLA-CPU process
    # that has compiled a few hundred programs segfaults inside
    # backend_compile_and_load when the eager per-primitive compiles start
    # — reproduced twice in round 3 and once in round 4 with zero leaked
    # threads, always at the same test, never in isolation)
    for stage in cmd.split(" && "):
        rc = subprocess.call(shlex.split(stage), cwd=_REPO)
        if rc != 0:
            return rc
    return 0


def main(argv) -> int:
    lanes = _parse_lanes(os.path.join(_REPO, "ci.yaml"))
    if not argv:
        for n, spec in lanes.items():
            print(f"{n:10s} {spec.get('desc', '')}")
        return 0
    if argv[0] == "--all":
        rc = 0
        for n in lanes:
            if n == "bench":
                continue
            rc |= run_lane(n, lanes)
        return rc
    return run_lane(argv[0], lanes)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
