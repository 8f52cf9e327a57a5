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
    # hybrid maps: GBA must see the POINT observations too — a line-only
    # global solve after a loop closure re-optimizes poses against the
    # weaker constraint family alone (line-direction degeneracy) and was
    # measured WORSENING the essential-graph result by 28% on the stereo
    # loop scene (VERDICT r4 weak #7 / BASELINE.md row 53)
    point_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096)
    p_obs_buckets: Tuple[int, ...] = (512, 1024, 2048, 4096, 8192, 16384)
    lm: LMConfig = LMConfig(max_iters=12)
    # divergence guard, mirroring LocalBAConfig.reject_cost_per_obs: a
    # blown-up full-map solve must not overwrite the essential-graph result
    reject_cost_per_obs: float = 500.0
    # chi2 outlier rounds: re-solve with hard-masked outlier observations
    # (chi2 over the thresholds below at the previous solution). Huber
    # alone leaves outliers with weight ~delta/|r|; at full-map scale the
    # accumulated wrong-match/duplicate observations measurably drag the
    # pose solution off the essential-graph correction (VERDICT r4 weak
    # #7 — GBA worsened the stereo loop row). The reference's optimizer
    # does exactly this edge-level chi2 gating between solve rounds.
    outlier_rounds: int = 1
    chi2_line: float = 7.378
    chi2_point: float = 5.991


class GlobalBAStats(NamedTuple):
    n_poses: int
    n_lines: int
    n_obs: int
    cost: float
    applied: bool = True


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

    # hybrid point blocks (empty 1-stubs on line-only maps), mirroring
    # local_ba.build_problem — see GlobalBAConfig.point_buckets
    pst = slam_map.points
    live_p = [int(q) for q in pst.live_ids() if pst.n_obs[q] >= 2]
    if live_p:
        n_p_obs = sum(
            sum(1 for k in pst.obs.get(q, {}) if k in kid_set) for q in live_p
        )
        M, OP = ladder_bucket(
            (len(live_p), n_p_obs), cfg.point_buckets, cfg.p_obs_buckets
        )
        if len(live_p) > M:
            live_p = sorted(live_p, key=lambda q: -int(pst.n_obs[q]))[:M]
    else:
        M, OP = 1, 1
    point_pos = {q: i for i, q in enumerate(live_p)}
    points = np.zeros((M, 3), np.float32)
    point_valid = np.zeros(M, np.float32)
    for q, i in point_pos.items():
        points[i] = pst.xyz[q]
        point_valid[i] = 1.0
    prows = []
    for q in live_p:
        for kid, slot in pst.obs.get(q, {}).items():
            if kid in kf_pos:
                prows.append((kf_pos[kid], point_pos[q], kid, slot))
    prows = prows[:OP]
    p_pose = np.zeros(OP, np.int32)
    p_point = np.zeros(OP, np.int32)
    p_uv = np.zeros((OP, 2), np.float32)
    p_valid = np.zeros(OP, np.float32)
    for r, (pi, qi, kid, slot) in enumerate(prows):
        kf = slam_map.keyframes[kid]
        p_pose[r] = pi
        p_point[r] = qi
        p_uv[r] = kf.point_features.uv[slot]
        p_valid[r] = 1.0

    prob = BAProblem(
        poses=poses,
        pose_free=pose_free,
        lines=lines,
        line_valid=line_valid,
        points=points,
        point_valid=point_valid,
        l_pose=l_pose,
        l_line=l_line,
        l_endpoints=l_ep,
        l_valid=l_valid,
        l_sigma=l_sigma,
        p_pose=p_pose,
        p_point=p_point,
        p_uv=p_uv,
        p_valid=p_valid,
        p_sigma=np.ones(OP, np.float32),
    )

    def _solve(pb: BAProblem) -> dict:
        if solver is not None:
            res_, err = solver.solve(
                {f: np.asarray(getattr(pb, f)) for f in pb._fields},
                cfg.lm, cfg.chi2_line, cfg.chi2_point,
            )
            if res_ is not None:
                return res_
            import sys

            print(f"BA worker failed ({err}); global BA in-process", file=sys.stderr)
        from tpuslam.backend.local_ba import _chi2_jit

        state = _run_lm_jit(pb, cam, cfg.lm)
        inl_l, inl_p = _chi2_jit(state, pb, cam, cfg.chi2_line, cfg.chi2_point)
        return dict(
            poses=np.asarray(state.poses),
            lines=np.asarray(state.lines),
            points=np.asarray(state.points),
            cost=float(np.asarray(state.cost)),
            inl_l=np.asarray(inl_l),
            inl_p=np.asarray(inl_p),
        )

    res = _solve(prob)
    for _ in range(max(0, int(cfg.outlier_rounds))):
        if "inl_l" not in res:
            break
        # hard-mask the chi2 outliers at the current solution and re-solve
        # warm-started from it (see GlobalBAConfig.outlier_rounds)
        prob = prob._replace(
            poses=np.asarray(res["poses"], np.float32),
            lines=np.asarray(res["lines"], np.float32),
            points=np.asarray(res.get("points", prob.points), np.float32),
            l_valid=(np.asarray(prob.l_valid) * np.asarray(res["inl_l"])).astype(
                np.float32
            ),
            p_valid=(np.asarray(prob.p_valid) * np.asarray(res["inl_p"])).astype(
                np.float32
            ),
        )
        res = _solve(prob)

    # divergence guard (see GlobalBAConfig.reject_cost_per_obs): a diverged
    # full-map solve must not overwrite the essential-graph correction
    n_obs_total = len(rows) + len(prows)
    if (
        cfg.reject_cost_per_obs > 0
        and res["cost"] > cfg.reject_cost_per_obs * max(1, n_obs_total)
    ):
        import sys

        print(
            f"global BA diverged (cost {res['cost']:.3g} over {n_obs_total} "
            "obs) — write-back rejected, essential-graph result kept",
            file=sys.stderr,
        )
        return GlobalBAStats(
            n_poses=len(kids),
            n_lines=len(live),
            n_obs=n_obs_total,
            cost=res["cost"],
            applied=False,
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
    if live_p and "points" in res:
        new_points = res["points"]
        for q, i in point_pos.items():
            if pst.alive[q]:
                pst.xyz[q] = new_points[i]

    return GlobalBAStats(
        n_poses=len(kids),
        n_lines=len(live),
        n_obs=n_obs_total,
        cost=res["cost"],
    )
