"""Global bundle adjustment: full-map LM+Schur (SURVEY §4.4
'GlobalBundleAdjustment', launched after loop closure).

Same jitted solver as local BA (`backend.lm.run_lm`); the assembly gathers
ALL keyframes + landmarks, bucketed to fixed capacities. Maps that exceed
the largest bucket keep the strongest landmarks (most observations) — the
long tail of weakly-observed lines contributes little to the solution and
is re-optimized by subsequent local windows anyway.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from tpuslam.backend.lm import BAProblem, LMConfig
from tpuslam.backend.local_ba import (
    _project_endpoints_to_line,
    _run_lm_jit,
    ladder_bucket,
)
from tpuslam.geometry.camera import Intrinsics
from tpuslam.slammap.map import SlamMap


class GlobalBAConfig(NamedTuple):
    # top bucket sized for KITTI-00-scale maps (~1400 KFs after culling);
    # the Schur-reduced pose system at P=2048 is a 12288^2 dense solve —
    # large but well within MXU budget for a per-loop-closure event
    pose_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048)
    line_buckets: Tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192, 16384)
    obs_buckets: Tuple[int, ...] = (1024, 2048, 4096, 8192, 16384, 32768, 65536)
    lm: LMConfig = LMConfig(max_iters=12)


class GlobalBAStats(NamedTuple):
    n_poses: int
    n_lines: int
    n_obs: int
    cost: float


def global_bundle_adjustment(
    slam_map: SlamMap,
    cam: Intrinsics,
    cfg: GlobalBAConfig = GlobalBAConfig(),
    solver=None,
) -> GlobalBAStats:
    """Full-map BA. ``solver``: optional `backend.ba_worker.BASolverWorker`;
    the solve then runs (blocking — loop-closure correction is a
    synchronous map rewrite) in the persistent subprocess so its large
    compile cannot degrade the tracking process (PERF_NOTES.md)."""
    kids = slam_map.all_keyframe_ids()
    st = slam_map.lines
    live = [int(l) for l in st.live_ids() if st.n_obs[l] >= 2]
    kid_set = set(kids)
    n_obs_est = sum(
        sum(1 for k in st.obs.get(l, {}) if k in kid_set) for l in live
    )
    # diagonal rung (local_ba.bucket_ladder): only ladder rungs ever
    # compile, so the warm ladder / persistent cache can cover every
    # program a loop-closure event can request
    P, L, OL = ladder_bucket(
        (len(kids), len(live), n_obs_est),
        cfg.pose_buckets, cfg.line_buckets, cfg.obs_buckets,
    )
    if len(kids) > P:
        raise ValueError(f"map too large for global BA buckets: {len(kids)} KFs")
    if len(live) > L:
        live = sorted(live, key=lambda l: -int(st.n_obs[l]))[:L]

    kf_pos = {k: i for i, k in enumerate(kids)}
    line_pos = {l: i for i, l in enumerate(live)}

    poses = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    pose_free = np.zeros(P, np.float32)
    for k, i in kf_pos.items():
        poses[i] = slam_map.keyframes[k].T_cw
        pose_free[i] = 0.0 if k == kids[0] else 1.0  # gauge: first KF

    lines = np.zeros((L, 6), np.float32)
    line_valid = np.zeros(L, np.float32)
    for l, i in line_pos.items():
        lines[i] = st.plucker[l]
        line_valid[i] = 1.0

    rows = []
    for l in live:
        for kid, slot in st.obs.get(l, {}).items():
            if kid in kf_pos:
                rows.append((kf_pos[kid], line_pos[l], kid, slot))
    rows = rows[:OL]
    l_pose = np.zeros(OL, np.int32)
    l_line = np.zeros(OL, np.int32)
    l_ep = np.zeros((OL, 2, 2), np.float32)
    l_sigma = np.ones(OL, np.float32)
    l_valid = np.zeros(OL, np.float32)
    for r, (pi, li, kid, slot) in enumerate(rows):
        kf = slam_map.keyframes[kid]
        l_pose[r] = pi
        l_line[r] = li
        l_ep[r] = kf.features.endpoints[slot]
        l_sigma[r] = kf.features.sigma[slot]
        l_valid[r] = 1.0

    wrap = (lambda x: x) if solver is not None else jnp.asarray
    zeros = np.zeros if solver is not None else jnp.zeros
    ones = np.ones if solver is not None else jnp.ones
    prob = BAProblem(
        poses=wrap(poses),
        pose_free=wrap(pose_free),
        lines=wrap(lines),
        line_valid=wrap(line_valid),
        points=zeros((1, 3), np.float32),
        point_valid=zeros(1, np.float32),
        l_pose=wrap(l_pose),
        l_line=wrap(l_line),
        l_endpoints=wrap(l_ep),
        l_valid=wrap(l_valid),
        l_sigma=wrap(l_sigma),
        p_pose=zeros(1, np.int32),
        p_point=zeros(1, np.int32),
        p_uv=zeros((1, 2), np.float32),
        p_valid=zeros(1, np.float32),
        p_sigma=ones(1, np.float32),
    )
    res = None
    if solver is not None:
        res, err = solver.solve(
            {f: np.asarray(getattr(prob, f)) for f in prob._fields},
            cfg.lm, 7.378, 5.991,
        )
        if res is None:
            import sys

            print(f"BA worker failed ({err}); global BA in-process", file=sys.stderr)
            prob = BAProblem(*[jnp.asarray(np.asarray(getattr(prob, f))) for f in prob._fields])
    if res is None:
        state = _run_lm_jit(prob, cam, cfg.lm)
        res = dict(
            poses=np.asarray(state.poses),
            lines=np.asarray(state.lines),
            cost=float(np.asarray(state.cost)),
        )

    new_poses = res["poses"]
    for k, i in kf_pos.items():
        if pose_free[i] > 0.5:
            slam_map.keyframes[k].T_cw = new_poses[i]
    new_lines = res["lines"]
    for l, i in line_pos.items():
        if st.alive[l]:
            st.plucker[l] = new_lines[i]
            st.endpoints[l] = _project_endpoints_to_line(st.endpoints[l], new_lines[i])

    return GlobalBAStats(
        n_poses=len(kids),
        n_lines=len(live),
        n_obs=len(rows),
        cost=res["cost"],
    )
