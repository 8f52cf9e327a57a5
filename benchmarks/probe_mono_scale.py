"""Mono scale-leak diagnosis (VERDICT r4 item 6).

SESSION_NOTES r4: est/gt translation ratio fluctuates 0.04-0.17 over a
60-frame mono run (~4x scale wander) — Sim(3) loop closure then has to fix
drift the front-end/BA should not produce. This probe localizes WHERE the
scale moves by logging, stage by stage:

  - per-frame: |dt_est| / |dt_gt| frame-to-frame translation ratio
    (tracking-induced scale drift shows up here between KF events)
  - per local-BA apply: the window's inter-KF baseline sum BEFORE vs AFTER
    the solve (a ratio != 1 means BA itself rescales the window = gauge
    leak; mono BA's gauge anchor fixes pose but not scale unless enough
    out-of-window observers constrain it)
  - per triangulation batch: median depth of the new landmarks relative to
    the current KF, vs the same for already-mapped landmarks (a systematic
    depth bias at creation shows up as a ratio != 1)

CPU run: python benchmarks/probe_mono_scale.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from tpuslam import host_cache_tag

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_tpuslam_{host_cache_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tpuslam.frontend.points import PointFrontendParams
from tpuslam.frontend.tracking import TrackerConfig, TrackingState
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.system import System

CAM = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, baseline=0.1)


def main(n=60):
    rng = np.random.default_rng(11)
    scene = make_wireframe_scene(
        rng, n_segments=60, n_points=120, n_frames=n, cam=CAM, motion_scale=0.06,
        # forward+lateral walk like ladder._mono_scene
    )
    frames = [
        render_wireframe_image(scene, f, noise=1.0, rng=rng, draw_points=True)
        for f in range(n)
    ]
    cfg = TrackerConfig(
        min_init_lines=8, min_track_matches=6, min_track_inliers=6,
        max_frames_between_kf=4, points=PointFrontendParams(),
    )
    sys_ = System(CAM, sensor="mono", loop_closing=False, mapping=True, tracker_cfg=cfg)

    # ---- instrument local-BA apply: window scale before/after -----------
    from tpuslam.backend import local_ba as lba

    orig_apply = lba.apply_result
    ba_events = []

    def _win_scale(slam_map, ctx):
        kids = [k for k in ctx["window"] if k in slam_map.keyframes]
        if len(kids) < 2:
            return None
        ts = [np.linalg.inv(slam_map.keyframes[k].T_cw)[:3, 3] for k in sorted(kids)]
        return float(sum(np.linalg.norm(b - a) for a, b in zip(ts, ts[1:])))

    def wrapped_apply(slam_map, cfg_, ctx, res):
        pre = _win_scale(slam_map, ctx)
        out = orig_apply(slam_map, cfg_, ctx, res)
        post = _win_scale(slam_map, ctx)
        if pre and post and pre > 1e-9:
            ba_events.append((len(slam_map.keyframes), post / pre, res.get("cost", -1)))
        return out

    lba.apply_result = wrapped_apply
    # the mapper binds apply_result at import; patch its reference too
    import tpuslam.backend.mapping as mapping_mod

    mapping_mod.apply_result = wrapped_apply

    # ---- instrument mono triangulation depth ----------------------------
    mapper = sys_.mapper
    tri_events = []
    orig_tri = mapper._create_new_maplines

    def wrapped_tri(kf):
        st = sys_.map.lines
        pre_ids = set(st.live_ids())
        orig_tri(kf)
        new_ids = [l for l in st.live_ids() if l not in pre_ids]
        if new_ids:
            T = kf.T_cw
            def depth(lid):
                ep = st.endpoints[lid]  # (2, 3) world
                pc = (T[:3, :3] @ ep.T + T[:3, 3:4]).T
                return float(np.median(pc[:, 2]))
            new_d = np.median([depth(l) for l in new_ids])
            old = [l for l in pre_ids if st.alive[l]]
            old_d = np.median([depth(l) for l in old[:50]]) if old else float("nan")
            tri_events.append((kf.kid, len(new_ids), new_d, old_d))
        return None

    mapper._create_new_maplines = wrapped_tri

    t0 = time.time()
    prev_est = prev_gt = None
    ratios = []
    for f, img in enumerate(frames):
        sys_.track_monocular(img, f * 0.05)
        est_t = np.linalg.inv(sys_.tracker.T_cw)[:3, 3]
        gt_t = np.linalg.inv(scene.poses[f])[:3, 3]
        if prev_est is not None:
            de = np.linalg.norm(est_t - prev_est)
            dg = np.linalg.norm(gt_t - prev_gt)
            if dg > 1e-9:
                ratios.append((f, de / dg))
        prev_est, prev_gt = est_t, gt_t
    sys_.shutdown()

    print(f"run {time.time()-t0:.0f}s; state={sys_.tracker.state.name}")
    print("\nper-frame |dt_est|/|dt_gt| (scale of the tracked motion):")
    for f, r in ratios:
        kf_mark = " KF" if any(
            k.frame_idx == f for k in sys_.map.keyframes.values()
        ) else ""
        print(f"  f{f:3d} ratio={r:8.4f}{kf_mark}")
    rs = np.array([r for _, r in ratios])
    print(f"  ratio min/med/max = {rs.min():.4f}/{np.median(rs):.4f}/{rs.max():.4f}")

    print("\nlocal-BA window rescale (post/pre inter-KF baseline sum):")
    for nkf, s, cost in ba_events:
        print(f"  @{nkf:3d} KFs  s_ba={s:8.4f}  cost={cost:.3g}")
    if ba_events:
        sb = np.array([s for _, s, _ in ba_events])
        print(f"  s_ba min/med/max = {sb.min():.4f}/{np.median(sb):.4f}/{sb.max():.4f}")
        print(f"  cumulative BA rescale = {np.prod(sb):.4f}")

    print("\ntriangulation depth (new-landmark median vs existing, same KF):")
    for kid, n_new, nd, od in tri_events:
        print(f"  kf{kid:3d} new={n_new:3d} depth_new={nd:7.3f} depth_old={od:7.3f}"
              f"  ratio={nd/od if od and not np.isnan(od) else float('nan'):.4f}")


if __name__ == "__main__":
    main()
