"""Local bundle adjustment: window assembly + jitted LM+Schur solve.

SURVEY §4.3 LocalBundleAdjustment: window = current KF + best covisible KFs;
landmarks = their MapLines; fixed poses = other KFs observing those lines
(+ gauge: the oldest window KF). The solve itself is `backend.lm.run_lm` —
one jitted program per capacity bucket; this module does the host-side
gather into padded buffers and the write-back.

Capacity bucketing (SURVEY §9.4 item 2): (P, L, OL) are rounded up to fixed
buckets so the whole sequence compiles a handful of XLA programs total.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.backend.lm import BAProblem, BAState, LMConfig, chi2_outlier_mask, run_lm
from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.plucker import plucker_normalize
from tpuslam.slammap.map import SlamMap


class LocalBAConfig(NamedTuple):
    window_size: int = 10
    max_fixed: int = 10
    pose_buckets: Tuple[int, ...] = (8, 16, 24)
    line_buckets: Tuple[int, ...] = (128, 256, 512, 1024)
    obs_buckets: Tuple[int, ...] = (512, 1024, 2048, 4096)
    point_buckets: Tuple[int, ...] = (128, 256, 512, 1024)
    p_obs_buckets: Tuple[int, ...] = (512, 1024, 2048, 4096)
    lm: LMConfig = LMConfig(max_iters=8)
    chi2_line: float = 7.378
    chi2_point: float = 5.991
    prune_outliers: bool = True
    min_obs_keep: int = 2
    # divergence guard (the reference's mbAbortBA analog): a solve whose
    # final robust cost per observation exceeds this is DIVERGED — writing
    # it back would poison the window poses/landmarks, and chi2-pruning
    # against its garbage state erases the whole map (observed on the mono
    # circle scene: cost 7.5e9, 691/236-row prune, map 74 -> 6 lines in one
    # keyframe). Healthy solves measure ~2-30 per obs (Huber-linear units);
    # a rejected solve keeps the map and prunes ONLY the observations that
    # were already chi2-outliers at the INITIAL state (the bogus entries
    # that blew the solve up — typically low-parallax mono triangulations).
    reject_cost_per_obs: float = 500.0


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def bucket_ladder(*bucket_lists: Tuple[int, ...]):
    """The DIAGONAL of the per-axis bucket lists: rung i takes element i of
    each list (last element repeated for shorter lists).

    Production solves are constrained to these rungs instead of the full
    cross-product of per-axis buckets: with independent bucketing a run can
    hit combinations like (P=8, L=256, OL=512) that no warm ladder ever
    compiled — observed as a 169 s cold LM+Schur compile mid-run while the
    'warm ladder done' buckets sat unused (probe_kf2, round 3). A bounded
    rung set means the warmer and the persistent cache cover EVERY program
    a run can request, at the cost of some padding waste inside a rung."""
    n = max(len(b) for b in bucket_lists)
    return [
        tuple(b[min(i, len(b) - 1)] for b in bucket_lists) for i in range(n)
    ]


def ladder_bucket(ns: Tuple[int, ...], *bucket_lists: Tuple[int, ...]):
    """Smallest diagonal rung covering every requested size (last rung on
    overflow — callers truncate to capacity exactly as with `_bucket`)."""
    rungs = bucket_ladder(*bucket_lists)
    for rung in rungs:
        if all(n <= c for n, c in zip(ns, rung)):
            return rung
    return rungs[-1]


_run_lm_jit = jax.jit(run_lm, static_argnums=(2,))
_chi2_jit = jax.jit(chi2_outlier_mask, static_argnums=(3, 4))


class LocalBAStats(NamedTuple):
    n_poses: int
    n_fixed: int
    n_lines: int
    n_obs: int
    cost: float
    n_pruned: int


def build_problem(
    slam_map: SlamMap,
    window: List[int],
    fixed: List[int],
    line_ids: List[int],
    caps: Tuple[int, int, int],
    point_ids: List[int] | None = None,
    point_caps: Tuple[int, int] = (1, 1),
    as_numpy: bool = False,
) -> Tuple[BAProblem, List[int], List[int], np.ndarray, np.ndarray]:
    """Gather a padded BAProblem. Returns (problem, kf_order, line_order,
    obs_table (n_obs, 3) of [kf_pos, line_pos, feature_slot], p_obs_table
    (n_p_obs, 3) of [kf_pos, point_pos, corner_slot])."""
    P, L, OL = caps
    point_ids = point_ids or []
    M, OP = point_caps
    kf_order = window + fixed
    kf_pos = {k: i for i, k in enumerate(kf_order)}
    line_pos = {l: i for i, l in enumerate(line_ids)}
    st = slam_map.lines

    poses = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    pose_free = np.zeros(P, np.float32)
    for k, i in kf_pos.items():
        poses[i] = slam_map.keyframes[k].T_cw
    # optimize window poses except the gauge anchor (oldest window KF)
    anchor = min(window)
    for k in window:
        if k != anchor:
            pose_free[kf_pos[k]] = 1.0

    lines = np.zeros((L, 6), np.float32)
    line_valid = np.zeros(L, np.float32)
    for l, i in line_pos.items():
        lines[i] = st.plucker[l]
        line_valid[i] = 1.0

    rows = []
    for l in line_ids:
        for kid, slot in st.obs.get(l, {}).items():
            if kid in kf_pos:
                rows.append((kf_pos[kid], line_pos[l], kid, slot))
    rows = rows[:OL]
    n_obs = len(rows)
    # point blocks (hybrid maps; empty stubs otherwise)
    pst = slam_map.points
    point_pos = {q: i for i, q in enumerate(point_ids)}
    points = np.zeros((M, 3), np.float32)
    point_valid = np.zeros(M, np.float32)
    for q, i in point_pos.items():
        points[i] = pst.xyz[q]
        point_valid[i] = 1.0
    prows = []
    for q in point_ids:
        for kid, slot in pst.obs.get(q, {}).items():
            if kid in kf_pos:
                prows.append((kf_pos[kid], point_pos[q], kid, slot))
    prows = prows[:OP]
    p_pose = np.zeros(OP, np.int32)
    p_point = np.zeros(OP, np.int32)
    p_uv = np.zeros((OP, 2), np.float32)
    p_valid = np.zeros(OP, np.float32)
    p_obs_table = np.zeros((len(prows), 3), np.int32)
    for r, (pi, qi, kid, slot) in enumerate(prows):
        kf = slam_map.keyframes[kid]
        p_pose[r] = pi
        p_point[r] = qi
        p_uv[r] = kf.point_features.uv[slot]
        p_valid[r] = 1.0
        p_obs_table[r] = (pi, qi, slot)
    l_pose = np.zeros(OL, np.int32)
    l_line = np.zeros(OL, np.int32)
    l_ep = np.zeros((OL, 2, 2), np.float32)
    l_sigma = np.ones(OL, np.float32)
    l_valid = np.zeros(OL, np.float32)
    obs_table = np.zeros((n_obs, 3), np.int32)
    for r, (pi, li, kid, slot) in enumerate(rows):
        kf = slam_map.keyframes[kid]
        l_pose[r] = pi
        l_line[r] = li
        l_ep[r] = kf.features.endpoints[slot]
        l_sigma[r] = kf.features.sigma[slot]
        l_valid[r] = 1.0
        obs_table[r] = (pi, li, slot)

    # jnp.asarray is identity on numpy inputs when as_numpy (worker RPC
    # path pickles plain numpy; the local path uploads to the device here)
    wrap = (lambda x: x) if as_numpy else jnp.asarray
    prob = BAProblem(
        poses=wrap(poses),
        pose_free=wrap(pose_free),
        lines=wrap(lines),
        line_valid=wrap(line_valid),
        points=wrap(points),
        point_valid=wrap(point_valid),
        l_pose=wrap(l_pose),
        l_line=wrap(l_line),
        l_endpoints=wrap(l_ep),
        l_valid=wrap(l_valid),
        l_sigma=wrap(l_sigma),
        p_pose=wrap(p_pose),
        p_point=wrap(p_point),
        p_uv=wrap(p_uv),
        p_valid=wrap(p_valid),
        p_sigma=np.ones(OP, np.float32) if as_numpy else jnp.ones(OP, jnp.float32),
    )
    return prob, kf_order, line_ids, obs_table, p_obs_table


def _project_endpoints_to_line(ep: np.ndarray, L: np.ndarray) -> np.ndarray:
    """Move stored 3D endpoints onto the optimized Pluecker line (orthogonal
    projection) so visualization/matching stay consistent with BA output."""
    n, v = L[:3], L[3:]
    vn = np.linalg.norm(v)
    if vn < 1e-9:
        return ep
    u = v / vn
    p0 = np.cross(v, n) / (vn * vn)
    t = (ep - p0) @ u
    return p0[None, :] + t[:, None] * u[None, :]


def assemble_problem(
    slam_map: SlamMap,
    center_kid: int,
    cam: Intrinsics,
    cfg: LocalBAConfig = LocalBAConfig(),
    as_numpy: bool = False,
):
    """Gather the padded window problem. Returns (BAProblem, ctx) where ctx
    carries everything `apply_result` needs for write-back (the async worker
    path holds ctx across keyframes)."""
    window, line_ids = slam_map.local_window(center_kid, cfg.window_size)
    window = sorted(window)
    st = slam_map.lines
    # fixed KFs: observe window lines but are not in the window; when over
    # capacity keep the MOST-observing anchors (dropping by id would discard
    # the strongest constraints while the obs estimate still counted them)
    window_set = set(window)
    fixed_counts: dict = {}
    for l in line_ids:
        for kid in st.obs.get(l, {}):
            if kid not in window_set and kid in slam_map.keyframes:
                fixed_counts[kid] = fixed_counts.get(kid, 0) + 1
    fixed = sorted(fixed_counts, key=lambda k: (-fixed_counts[k], k))[: cfg.max_fixed]
    fixed_kept = set(fixed)

    n_obs_est = sum(
        sum(1 for k in st.obs.get(l, {}) if k in window_set or k in fixed_kept)
        for l in line_ids
    )
    # diagonal rung, NOT independent per-axis buckets: only ladder rungs
    # ever compile, so the warm ladder / persistent cache covers every
    # program a run can request (see bucket_ladder)
    P, L, OL = ladder_bucket(
        (len(window) + len(fixed), len(line_ids), n_obs_est),
        cfg.pose_buckets, cfg.line_buckets, cfg.obs_buckets,
    )
    line_ids = line_ids[:L]

    # hybrid point blocks (empty on line-only maps: M=OP=1 stubs)
    pst = slam_map.points
    point_ids = [q for q in slam_map.window_point_ids(window) if pst.alive[q]]
    if point_ids:
        M = _bucket(len(point_ids), cfg.point_buckets)
        point_ids = point_ids[:M]
        n_p_obs = sum(
            sum(1 for k in pst.obs.get(q, {}) if k in window_set or k in fixed_kept)
            for q in point_ids
        )
        M, OP = ladder_bucket(
            (len(point_ids), n_p_obs), cfg.point_buckets, cfg.p_obs_buckets
        )
    else:
        M, OP = 1, 1

    prob, kf_order, line_order, obs_table, p_obs_table = build_problem(
        slam_map, window, fixed, line_ids, (P, L, OL), point_ids, (M, OP),
        as_numpy=as_numpy,
    )
    ctx = dict(
        window=window,
        fixed=fixed,
        kf_order=kf_order,
        line_order=line_order,
        point_ids=point_ids,
        obs_table=obs_table,
        p_obs_table=p_obs_table,
        pose_free=np.asarray(prob.pose_free),
    )
    return prob, ctx


def apply_result(slam_map: SlamMap, cfg: LocalBAConfig, ctx: dict, res: dict) -> LocalBAStats:
    """Write an LM+Schur result back into the map + chi2 pruning.

    Safe against map churn between assemble and apply (the async worker
    path): culled keyframes/landmarks are skipped, stale observation rows
    no-op in erase_observation."""
    st = slam_map.lines
    pst = slam_map.points
    window = ctx["window"]
    fixed = ctx["fixed"]
    kf_order = ctx["kf_order"]
    line_order = ctx["line_order"]
    point_ids = ctx["point_ids"]
    obs_table = ctx["obs_table"]
    p_obs_table = ctx["p_obs_table"]

    # divergence guard (see LocalBAConfig.reject_cost_per_obs): reject the
    # write-back of a blown-up solve; prune only the entries that were
    # already outliers BEFORE the solve (they are what blew it up).
    n_obs_total = int(obs_table.shape[0]) + int(p_obs_table.shape[0])
    if (
        cfg.reject_cost_per_obs > 0
        and res.get("cost", 0.0) > cfg.reject_cost_per_obs * max(1, n_obs_total)
    ):
        import sys

        print(
            f"local BA diverged (cost {res['cost']:.3g} over {n_obs_total} obs)"
            " — write-back rejected; pruning initial-state outliers only",
            file=sys.stderr,
        )
        n_pruned = 0
        if cfg.prune_outliers and "inl_l0" in res:
            # same touched-only floor rule as the normal prune path below:
            # the min-obs kill applies ONLY to landmarks that lost an
            # observation here — an unconditional loop over line_order/
            # point_ids would kill every fresh single-observation landmark
            # in the window (the exact defect the normal path fixed)
            touched_l0: set = set()
            inl_l0 = np.asarray(res["inl_l0"])
            for r in range(obs_table.shape[0]):
                if inl_l0[r] < 0.5:
                    pi, li, slot = obs_table[r]
                    kid = kf_order[pi]
                    if kid not in slam_map.keyframes:
                        continue
                    lid = int(line_order[li])
                    st.erase_observation(lid, slam_map.keyframes[kid])
                    touched_l0.add(lid)
                    n_pruned += 1
            for lid in touched_l0:
                if st.alive[lid] and st.n_obs[lid] < cfg.min_obs_keep:
                    st.kill(lid, slam_map.keyframes)
            if point_ids and "inl_p0" in res:
                touched_p0: set = set()
                inl_p0 = np.asarray(res["inl_p0"])
                for r in range(p_obs_table.shape[0]):
                    if inl_p0[r] < 0.5:
                        pi, qi, slot = p_obs_table[r]
                        kid = kf_order[pi]
                        if kid not in slam_map.keyframes:
                            continue
                        qid = int(point_ids[qi])
                        pst.erase_observation(qid, slam_map.keyframes[kid])
                        touched_p0.add(qid)
                        n_pruned += 1
                for qid in touched_p0:
                    if pst.alive[qid] and pst.n_obs[qid] < cfg.min_obs_keep:
                        pst.kill(qid, slam_map.keyframes)
        return LocalBAStats(
            n_poses=len(window),
            n_fixed=len(fixed),
            n_lines=len(line_order),
            n_obs=n_obs_total,
            cost=res["cost"],
            n_pruned=n_pruned,
        )

    new_poses = res["poses"]
    for i, kid in enumerate(kf_order):
        if (
            i < len(window) + len(fixed)
            and float(ctx["pose_free"][i]) > 0.5
            and kid in slam_map.keyframes
        ):
            slam_map.keyframes[kid].T_cw = new_poses[i]
    new_lines = res["lines"]
    for i, lid in enumerate(line_order):
        if st.alive[lid]:
            st.plucker[lid] = new_lines[i]
            st.endpoints[lid] = _project_endpoints_to_line(st.endpoints[lid], new_lines[i])
    if point_ids:
        new_points = res["points"]
        for i, qid in enumerate(point_ids):
            if pst.alive[qid]:
                pst.xyz[qid] = new_points[i]

    n_pruned = 0
    if cfg.prune_outliers and "inl_l" in res:
        # Kill below the observation floor ONLY for landmarks that actually
        # LOST an observation in this prune. The old unconditional floor
        # killed every fresh single-observation landmark the window
        # contained — with synchronous per-KF BA (CPU runs) the solve
        # applies at the very KF that created them, so the map could never
        # grow past its initial lines (observed: frozen at 13 lines while
        # ~35/KF were allocated and instantly killed). A fresh 1-obs INLIER
        # line now survives to be re-observed; the recent-landmark cull
        # (mapping._cull_recent, 3-KF horizon) remains the authority on
        # never-confirmed landmarks.
        touched_l: set = set()
        inl_l = np.asarray(res["inl_l"])
        for r in range(obs_table.shape[0]):
            if inl_l[r] < 0.5:
                pi, li, slot = obs_table[r]
                kid = kf_order[pi]
                if kid not in slam_map.keyframes:
                    continue
                lid = int(line_order[li])
                st.erase_observation(lid, slam_map.keyframes[kid])
                touched_l.add(lid)
                n_pruned += 1
        for lid in touched_l:
            if st.alive[lid] and st.n_obs[lid] < cfg.min_obs_keep:
                st.kill(lid, slam_map.keyframes)
        if point_ids:
            touched_p: set = set()
            inl_p = np.asarray(res["inl_p"])
            for r in range(p_obs_table.shape[0]):
                if inl_p[r] < 0.5:
                    pi, qi, slot = p_obs_table[r]
                    kid = kf_order[pi]
                    if kid not in slam_map.keyframes:
                        continue
                    qid = int(point_ids[qi])
                    pst.erase_observation(qid, slam_map.keyframes[kid])
                    touched_p.add(qid)
                    n_pruned += 1
            for qid in touched_p:
                if pst.alive[qid] and pst.n_obs[qid] < cfg.min_obs_keep:
                    pst.kill(qid, slam_map.keyframes)

    return LocalBAStats(
        n_poses=len(window),
        n_fixed=len(fixed),
        n_lines=len(line_order),
        n_obs=int(obs_table.shape[0]),
        cost=res["cost"],
        n_pruned=n_pruned,
    )


def initial_chi2_masks(prob: BAProblem, cam: Intrinsics, chi2_line, chi2_point):
    """Chi2 inlier masks at the LINEARIZATION POINT (pre-solve state): the
    divergence guard prunes against these, so a blown-up solve can still
    shed the garbage entries that blew it up without touching the rest of
    the map. Same shapes as the post-solve call -> hits the same compiled
    _chi2_jit executable."""
    state0 = BAState(
        poses=prob.poses,
        lines=plucker_normalize(prob.lines),
        points=prob.points,
        lam=jnp.asarray(1.0, prob.poses.dtype),
        cost=jnp.asarray(0.0, prob.poses.dtype),
    )
    return _chi2_jit(state0, prob, cam, chi2_line, chi2_point)


def solve_in_process(prob: BAProblem, cam: Intrinsics, cfg: LocalBAConfig) -> dict:
    """The jitted LM+Schur solve + chi2 masks, in this process."""
    state: BAState = _run_lm_jit(prob, cam, cfg.lm)
    res = dict(
        poses=np.asarray(state.poses),
        lines=np.asarray(state.lines),
        points=np.asarray(state.points),
        cost=float(np.asarray(state.cost)),
    )
    if cfg.prune_outliers:
        inl_l, inl_p = _chi2_jit(state, prob, cam, cfg.chi2_line, cfg.chi2_point)
        res["inl_l"], res["inl_p"] = np.asarray(inl_l), np.asarray(inl_p)
        inl_l0, inl_p0 = initial_chi2_masks(prob, cam, cfg.chi2_line, cfg.chi2_point)
        res["inl_l0"], res["inl_p0"] = np.asarray(inl_l0), np.asarray(inl_p0)
    return res


def local_bundle_adjustment(
    slam_map: SlamMap,
    center_kid: int,
    cam: Intrinsics,
    cfg: LocalBAConfig = LocalBAConfig(),
    solver=None,
) -> LocalBAStats:
    """Synchronous windowed BA around `center_kid` (assemble + solve + apply).

    ``solver``: optional `backend.ba_worker.BASolverWorker`; the solve then
    runs in the persistent subprocess (blocking here — the ASYNC per-KF
    pipelining lives in `backend.mapping.LocalMapper`)."""
    prob, ctx = assemble_problem(slam_map, center_kid, cam, cfg, as_numpy=solver is not None)
    res = None
    if solver is not None:
        res, err = solver.solve(
            {f: np.asarray(getattr(prob, f)) for f in prob._fields},
            cfg.lm, cfg.chi2_line, cfg.chi2_point,
        )
        if res is None:
            import sys

            print(f"BA worker failed ({err}); solving in-process", file=sys.stderr)
            prob = BAProblem(*[jnp.asarray(np.asarray(getattr(prob, f))) for f in prob._fields])
    if res is None:
        res = solve_in_process(prob, cam, cfg)
    return apply_result(slam_map, cfg, ctx, res)
