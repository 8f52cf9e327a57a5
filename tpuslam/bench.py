"""Benchmark harness (SURVEY §8, BASELINE metric: stereo VGA tracking FPS).

Measures steady-state per-frame tracking time of the full stereo pipeline
(pyramid+LSD+LBD on both cameras, stereo association, two fused
track-and-optimize dispatches) on 640x480 synthetic wireframe frames —
the same shape class as EuRoC VGA. Warmup frames (jit compiles) excluded
(SURVEY §7 'tracing/profiling').
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


def _maybe_hang(stage: str):
    """Test hook (artifact-discipline test): TPUSLAM_BENCH_FAKE_HANG=<stage>
    simulates a wedged stage (degraded compile service / tunnel stall) so a
    CPU test can assert the bench still produces a parseable artifact."""
    if os.environ.get("TPUSLAM_BENCH_FAKE_HANG") == stage:
        import sys

        print(f"bench: FAKE HANG at stage {stage!r}", file=sys.stderr, flush=True)
        time.sleep(1e6)


def run_benchmark(frames: int = 100, warmup: int = 5, quiet: bool = False) -> Dict:
    import os
    import sys

    import jax

    frames = int(os.environ.get("TPUSLAM_BENCH_FRAMES", frames))
    log = lambda m: print(m, file=sys.stderr, flush=True)

    # Deadline awareness: the parent (bench.py driver) exports the seconds
    # this subprocess may use; stages that do not fit the remainder are
    # SKIPPED (never started) so the headline JSON always lands on stdout
    # before any kill. No parent → effectively unbounded.
    budget = float(os.environ.get("TPUSLAM_BENCH_SUB_BUDGET", "1e9"))
    t_start = time.monotonic()
    remaining = lambda: budget - (time.monotonic() - t_start)

    from tpuslam.backend.mapping import MapperConfig
    from tpuslam.geometry.camera import Intrinsics
    from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
    from tpuslam.system import System

    if os.environ.get("TPUSLAM_BENCH_CAM", "vga") == "qvga":
        # artifact-discipline CPU test: quarter-size frames keep the XLA-CPU
        # compiles (and the test) fast; the chip headline is always VGA
        cam = Intrinsics(
            fx=229.0, fy=228.5, cx=160.0, cy=120.0, width=320, height=240, baseline=0.11
        )
    else:
        cam = Intrinsics(
            fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11
        )
    rng = np.random.default_rng(0)
    n_scene_frames = max(frames + warmup, 8)
    scene = make_wireframe_scene(
        rng, n_segments=140, n_frames=n_scene_frames, cam=cam, motion_scale=0.02
    )
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))

    # pre-render all frames (image synthesis is not part of the benchmark);
    # frames stay uint8 — that is what a camera delivers, and the tunnel's
    # h2d path is bandwidth-bound (PERF_NOTES.md)
    imgs = []
    for f in range(n_scene_frames):
        il = render_wireframe_image(scene, f, noise=1.0, rng=rng)
        ir = render_wireframe_image(scene_r, f, noise=1.0, rng=rng)
        imgs.append((il, ir))

    log(f"bench: {n_scene_frames} frames pre-rendered; warming up programs...")
    from tpuslam.frontend.tracking import TrackerConfig

    # FORCE_NOMAP: test-only ambient override (the parent driver hard-sets
    # NOMAP per stage, so a test wrapping the driver needs its own knob)
    mapping = (
        os.environ.get("TPUSLAM_BENCH_NOMAP", "0") != "1"
        and os.environ.get("TPUSLAM_BENCH_FORCE_NOMAP", "0") != "1"
    )
    pipelined = os.environ.get("TPUSLAM_BENCH_PIPELINED", "1") == "1"
    tcfg = TrackerConfig(pipelined=pipelined)
    if os.environ.get("TPUSLAM_BENCH_DIRECT", "1") == "1":
        # direct epipolar stereo: left-only detection (the detector is the
        # largest term in the frame budget — kernels/stereo_direct.py)
        from tpuslam.kernels.stereo_direct import DirectStereoParams

        tcfg.direct_stereo = DirectStereoParams()
    if os.environ.get("TPUSLAM_BENCH_HALFRES", "1") == "1":
        # detect/describe at half resolution (geometry reported full-res;
        # probe_direct.py: 23.6 -> 17.8 ms/frame device-side at VGA), and
        # downscale ON THE HOST (prescaled): the u8 pair upload drops from
        # ~600 KB to ~150 KB/frame — the h2d transfer was the largest
        # host-path term (~30 ms at the tunnel's ~20 MB/s, PERF_NOTES.md)
        from tpuslam.frontend.frame import FrontendParams

        prescaled = os.environ.get("TPUSLAM_BENCH_HOSTSCALE", "1") == "1"
        tcfg.frontend = FrontendParams(base_scale=0.5, prescaled=prescaled)
    # chunked ingest: C frames per upload+dispatch (TrackerConfig.chunk).
    # Default 6 = the measured sweet spot of the semi-direct sweep (chip,
    # 2026-08-19): C=4 37.4 fps / ATE 0.017, C=6 72.5 fps / ATE 0.021,
    # C=8 56.2 fps / ATE 0.043 (longer aligned stretches + staler map
    # snapshots cost accuracy faster than the amortization pays).
    tcfg.chunk = int(os.environ.get("TPUSLAM_BENCH_CHUNK", "6"))
    if (
        tcfg.chunk > 1
        and tcfg.direct_stereo is not None
        and os.environ.get("TPUSLAM_BENCH_SEMIDIRECT", "1") == "1"
    ):
        # semi-direct chunks: full detection on the chunk's first frame
        # only; followers are aligned photometrically against the line map
        # (kernels/align_direct.py) — the detector amortizes over the chunk
        from tpuslam.kernels.align_direct import DirectAlignParams

        tcfg.semidirect = DirectAlignParams()
    if os.environ.get("TPUSLAM_BENCH_POINTS", "0") == "1":
        # hybrid points in the headline mode (SURVEY §3.1 MapPoint): the
        # anchor tracks corners+lines jointly; semi-direct followers align
        # against both families (pipeline._fused_chunk_semidirect_hybrid)
        from tpuslam.frontend.points import PointFrontendParams

        tcfg.points = PointFrontendParams()
    # bound the BA bucket ladder to TWO rungs: the small rung most
    # bench-scale windows fit (restoring the judged local-BA ms/KF metric
    # that round 3's single big rung traded away — 165-198 ms at
    # (16,256,1024) vs 31-40 ms at (8,128,512)), plus the big rung as the
    # overflow. `ladder_bucket` picks the smallest fitting rung per solve;
    # the pretouch below compiles both, and with the persistent BA cache
    # (TPUSLAM_BA_CACHE_DIR) each rung's compile is paid once per machine.
    os.environ.setdefault("TPUSLAM_BA_WARM_CAPS", "8,128,512;16,256,1024")
    # no background warmer: with a single rung the solver PRETOUCH below
    # fills both the persistent cache and the solver's own jit cache — a
    # parallel warmer process would just re-pay the same trace+load on this
    # 1-core box and contend on the tunnel
    os.environ.setdefault("TPUSLAM_BA_WORKER_WARMUP", "0")
    mcfg = None
    if mapping:
        from tpuslam.backend.local_ba import LocalBAConfig
        from tpuslam.backend.mapping import MapperConfig

        rungs = [
            tuple(int(x) for x in part.split(","))
            for part in os.environ["TPUSLAM_BA_WARM_CAPS"].split(";")
            if part.strip()
        ]
        mcfg = MapperConfig(
            ba=LocalBAConfig(
                pose_buckets=tuple(r[0] for r in rungs),
                line_buckets=tuple(r[1] for r in rungs),
                obs_buckets=tuple(r[2] for r in rungs),
            ),
            # deferred duplicate-fusion apply: the fusion d2h (~24-34 ms
            # tunnel RTT) rides while frames keep tracking; System's
            # per-frame mapper.tick() applies it a few FRAMES later, so the
            # staleness that kept this default-off shrank to ~2-3 frames
            fuse_defer=os.environ.get("TPUSLAM_BENCH_FUSEDEFER", "1") == "1",
        )
    sys_ = System(
        cam,
        sensor="stereo",
        loop_closing=False,
        mapping=mapping,
        tracker_cfg=tcfg,
        mapper_cfg=mcfg,
    )
    _maybe_hang("warmup")
    warmup_s = 0.0
    pretouch_s: Dict[str, float] = {}
    # overlap the solver's bucket pretouch with the tracking warmup
    # (VERDICT r4 item 9): the toy solves trace/load in the WORKER process
    # while this process compiles the tracking programs — serial cost was
    # warmup + pretouch (~200 s of the 240 s r4 attempt); overlapped ~max.
    # TPUSLAM_BENCH_PRETOUCH_OVERLAP=0 restores the serial order (to
    # isolate tunnel-contention effects if they reappear).
    pt_reqs = []
    overlap_pt = (
        mapping
        and sys_._ba_worker is not None
        and os.environ.get("TPUSLAM_BENCH_PRETOUCH_OVERLAP", "1") == "1"
    )
    if overlap_pt:
        ba_cfg_pt = sys_.mapper.cfg.ba
        for bucket in sys_._ba_worker.warm_caps:
            pt_reqs.append(
                (bucket,
                 sys_._ba_worker.pretouch_async(
                     bucket, ba_cfg_pt.lm, ba_cfg_pt.chi2_line, ba_cfg_pt.chi2_point
                 ))
            )
        log(f"bench: {len(pt_reqs)} BA pretouches enqueued (overlap warmup)")
    t_wu = time.perf_counter()
    if os.environ.get("TPUSLAM_BENCH_WARMUP", "1") == "1":
        from tpuslam.warmup import warmup_tracking

        tc = sys_.tracker.cfg
        warmup_tracking(
            cam,
            frontend_params=tc.frontend,
            stereo_params=tc.stereo,
            search_params=(tc.search_coarse, tc.search_fine),
            pose_opt_cfg=tc.pose_opt,
            local_capacity=tc.local_capacity,
            direct_stereo=tc.direct_stereo,
            chunk=tc.chunk,
            semidirect=tc.semidirect,
            points=tc.points,
            direct_points=tc.direct_points,
            point_local_capacity=tc.point_local_capacity,
            # the BA worker owns (and lazily warms) the LM programs in its
            # own process; compiling them here too would re-poison this one
            with_mapping=mapping and sys_._ba_worker is None,
            # the mapper's duplicate-fusion search runs in THIS process on
            # every keyframe regardless of where the BA solve runs
            fuse_search=sys_.mapper.cfg.fuse_search if sys_.mapper else None,
            # bounded: one degraded-service compile must not eat the whole
            # bench attempt (observed: 397 s for the FIRST tiny warm step);
            # also clipped to the parent's exported budget, reserving room
            # for the timed loop + emit (the artifact beats a perfect warm)
            budget_s=min(
                float(os.environ.get("TPUSLAM_BENCH_WARMUP_S", "400")),
                max(30.0, remaining() - 150.0),
            ),
            log=log,
        )
    warmup_s = time.perf_counter() - t_wu
    if mapping and sys_._ba_worker is not None:
        # hold timing until the worker's FIRST solver bucket is compiled —
        # the first real solve otherwise pays a ~10 s bucket compile and
        # most BA windows get skipped while it runs (BENCH_r02 postmortem).
        # Only the first bucket: the full ladder takes minutes on a bad
        # compile-lottery day and keeps warming in the background anyway.
        # wait for the FULL warm ladder (n_buckets=99 returns at the
        # warmer's "warm_done"): the warmer runs in its own process, and its
        # remote compiles CONTEND on the serialized tunnel with everything
        # else — measured: a 4.4 s uncontended cache-load solve took 35.5 s
        # while the warmer compiled the big buckets mid-run. With the
        # persistent cache warm this wait is ~30-60 s; a cold machine hits
        # the timeout and proceeds (warmup keeps going in the background).
        log("bench: collecting BA solver pretouches...")
        worker = sys_._ba_worker
        budget_ba = min(
            float(os.environ.get("TPUSLAM_BENCH_BA_WARM_S", "280")),
            max(0.0, remaining() - 90.0),
        )
        t0 = time.perf_counter()
        ba_cfg = sys_.mapper.cfg.ba
        # pretouch = a toy solve of each rung INSIDE the solver process: the
        # first real solve otherwise pays a multi-second trace + cache load
        # (or remote compile, cold machine) mid-run, skipping the BA windows
        # that land during it (round-3 bench: ba_skipped=5/6). Requests were
        # enqueued before warmup (overlap) unless OVERLAP=0.
        if not pt_reqs:
            pt_reqs = [(b, None) for b in worker.warm_caps]
        for bucket, rid in pt_reqs:
            remain = budget_ba - (time.perf_counter() - t0)
            if remain <= 10.0:
                log("bench: pretouch budget spent; remaining buckets compile on demand")
                break
            if rid is None:
                rid = worker.pretouch_async(
                    bucket, ba_cfg.lm, ba_cfg.chi2_line, ba_cfg.chi2_point,
                    timeout=remain,
                )
            out_pt = worker.pretouch_wait(rid, timeout=remain)
            key = "x".join(map(str, bucket))
            if out_pt is None:
                pretouch_s[key] = -1.0
                log(f"bench: solver pretouch {bucket}: FAILED/TIMED OUT")
            else:
                first_ms, steady_ms = out_pt
                pretouch_s[key] = round(first_ms / 1e3, 1)
                # first - steady = the trace+compile/cache-load share (the
                # item-9 truth probe: ~4-6 s = per-process load on a warm
                # cache; 30+ s = remote compile / cache miss)
                log(
                    f"bench: solver pretouch {bucket}: {first_ms/1e3:.1f}s "
                    f"(steady solve {steady_ms:.0f} ms, "
                    f"trace+load {max(0.0, first_ms-steady_ms)/1e3:.1f}s)"
                )
        log(f"bench: BA pretouch collect done in {time.perf_counter() - t0:.1f}s")
    # wire-bandwidth probe: the System wall is h2d-BOUND on this dev tunnel
    # (r5 stage split: the chunk-resolve track calls sum to ~85% of wall =
    # the ~7 MB of frame uploads; device-feed with pre-uploaded frames runs
    # 8x faster). One number makes window health quantitative.
    wire_mbps = 0.0
    try:
        import jax.numpy as _jnp

        _probe = np.zeros((1 << 20,), np.uint8)
        for _ in range(3):
            _t0 = time.perf_counter()
            _x = _jnp.asarray(_probe)
            np.asarray(_x[:1])  # TRUE drain incl. RTT
            wire_mbps = max(wire_mbps, 1.0 / max(time.perf_counter() - _t0, 1e-6))
        log(f"bench: h2d wire ~{wire_mbps:.1f} MB/s")
    except Exception as e:
        log(f"bench: wire probe failed: {e}")
    log("bench: warmup done; tracking...")
    _maybe_hang("track")
    profiler = None
    if os.environ.get("TPUSLAM_BENCH_PROFILE"):  # host-time attribution of
        import cProfile  # ONLY the timed loop (profiling warmup is 10x)

        profiler = cProfile.Profile()
        profiler.enable()
    times = []
    t_wall0 = None
    for f in range(n_scene_frames):
        il, ir = imgs[f % n_scene_frames]
        t0 = time.perf_counter()
        if f == warmup:
            t_wall0 = t0
        sys_.track_stereo(il, ir, f * 0.05)
        dt = time.perf_counter() - t0
        if f >= warmup:
            times.append(dt)
        if f < warmup or f % 25 == 0:
            log(f"bench: frame {f} {dt*1e3:.1f} ms")
    # drain the in-flight pipeline INSIDE the timed region: with chunked or
    # pipelined ingest up to 2*chunk frames are still unresolved at loop end,
    # and fps_wall = frames / wall (BASELINE.md measurement rule) must count
    # their completion
    t_flush0 = time.perf_counter()
    sys_.trajectory.extend(sys_.tracker.flush_all())
    flush_ms = (time.perf_counter() - t_flush0) * 1e3
    wall = time.perf_counter() - t_wall0
    if profiler is not None:
        profiler.disable()
        profiler.dump_stats(os.environ["TPUSLAM_BENCH_PROFILE"])
        log(f"bench: host profile -> {os.environ['TPUSLAM_BENCH_PROFILE']}")
    track = sys_.timer.summary().get("track", {})
    lm = sys_.timer.summary().get("local_mapping", {})
    med = float(np.median(times))
    fps = 1.0 / med
    out = dict(
        device=str(jax.devices()[0]),
        frames=len(times),
        fps_median=fps,
        fps_mean=float(1.0 / np.mean(times)),
        # frames / wall over the timed region incl. pipeline drain — the
        # BASELINE.md-rule number and the only meaningful one for chunked
        # ingest (per-call medians hit buffering calls, not frame cost)
        fps_wall=float(len(times) / wall),
        track_ms_median=med * 1e3,
        local_ba_ms=lm.get("median_ms", 0.0),
        keyframes=len(sys_.map.keyframes),
        lines=len(sys_.map.lines.live_ids()),
        # window-health signals (VERDICT r4 weak #1): the driver's retry
        # gate reads these — per-call medians are blind in chunked mode
        warmup_s=round(warmup_s, 1),
        pretouch_s=pretouch_s,
        pretouch_total_s=round(sum(v for v in pretouch_s.values() if v > 0), 1),
        # full per-stage wall split (kf_begin/kf_resolve/kf_insert +
        # mapper mp.* stages): where the wall-fps gap actually goes.
        # (median, SUM, n) — sums are what reconcile against the wall
        stage_ms={
            k: (round(v["median_ms"], 1), round(v["mean_ms"] * v["n"], 1), v["n"])
            for k, v in sys_.timer.summary().items()
        },
        # wall reconciliation: sum of the timed track_stereo calls + the
        # end-of-loop pipeline drain; wall - track_sum - flush = untimed
        track_sum_ms=round(float(np.sum(times)) * 1e3, 1),
        flush_ms=round(flush_ms, 1),
        wire_mbps=round(wire_mbps, 1),
    )
    def emit():
        # EVERY emitted line is a complete, parseable result; the parent
        # takes the LAST one. Emitting before device-feed/ATE/shutdown
        # means a wedged later stage (or the parent's kill) can no longer
        # erase the measurement (the round-2/round-3 failure mode).
        if not quiet:
            print(json.dumps(out, default=float), flush=True)

    emit()  # the artifact exists from this moment on

    _maybe_hang("devfeed")
    if os.environ.get("TPUSLAM_BENCH_DEVFEED", "1") == "1":
        if remaining() > 45.0:
            try:
                out["fps_device_feed"] = _device_feed_fps(sys_, imgs, log)
                emit()
            except Exception as e:  # enrichment must not kill the artifact
                log(f"bench: device-feed failed: {e}")
        else:
            log("bench: skipping device-feed stage (budget spent)")

    # trajectory accuracy of the benchmarked run itself (vs the synthetic
    # scene's ground truth) — speed numbers mean nothing if tracking drifted
    _maybe_hang("shutdown")
    try:
        # bounded drain: an in-flight cold BA solve is abandoned (with a
        # stderr note + flag below) instead of eating the parent's deadline
        sys_.shutdown(drain_timeout=max(5.0, min(120.0, remaining() - 20.0)))
        from tpuslam.eval.ate import absolute_trajectory_error

        traj = sys_.trajectory
        if traj:
            est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj])
            gt = np.stack(
                [np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj]
            )
            out["ate_rmse"] = float(absolute_trajectory_error(est, gt).rmse)
            # accuracy guardrail (VERDICT r4 item 5): the speed ladder must
            # not silently buy fps with accuracy. The bench scene is seeded,
            # so the sync/full-detection reference ATE is a constant of the
            # scene (0.019-0.024 across the recorded BASELINE.md rows);
            # flag any chunked/semi-direct run drifting past 1.5x it.
            ref = float(os.environ.get("TPUSLAM_BENCH_ATE_REF", "0.024"))
            out["ate_ok"] = bool(out["ate_rmse"] <= 1.5 * ref)
            if not out["ate_ok"]:
                log(
                    f"bench: ACCURACY REGRESSION: ate {out['ate_rmse']:.4f} "
                    f"> 1.5 x ref {ref:.4f}"
                )
    except Exception as e:  # accuracy reporting must not kill the bench
        log(f"bench: shutdown/ate failed: {e}")

    # local-BA solve cost from the persistent worker's own timings (median
    # over the run's solves; shutdown() above drained the in-flight one) —
    # the honest per-solve number, measured warm, no cold-compile subprocess
    if sys_.mapper is not None:
        mp_ = sys_.mapper
        if mp_.solve_ms:
            out["local_ba_ms"] = float(np.median(mp_.solve_ms))
            out["local_ba_ms_by_rung"] = {
                "x".join(map(str, k)): round(float(np.median(v)), 1)
                for k, v in mp_.solve_ms_by_rung.items()
            }
        elif mp_.cold_solve_ms:
            # every solve this run paid a first-touch bucket compile; report
            # the least-polluted one rather than 0/absent, and say so
            out["local_ba_ms"] = float(np.min(mp_.cold_solve_ms))
            out["local_ba_cold"] = True
        out["ba_submitted"] = mp_.ba_submitted
        out["ba_skipped"] = mp_.ba_skipped
        out["ba_resubmitted"] = mp_.ba_resubmitted
        out["ba_stale"] = mp_.ba_stale
        if getattr(mp_, "last_stage_ms", None):
            out["local_ba_stage_ms"] = {
                k: round(v, 1) for k, v in mp_.last_stage_ms.items()
            }

    emit()
    return out


def _device_feed_fps(sys_, imgs, log, n=40):
    """Compute-side FPS with frames already device-resident.

    The axon tunnel moves host images at ~20 MB/s (PERF_NOTES.md), which is
    an artifact of this development link, not of TPU deployments (PCIe/DMA
    camera feeds are GB/s). This measures the same full per-frame tracking
    program on device-resident u8 frames: the number a production feed
    would see. Host control flow (resolve, state machine, KF checks) is
    still included.
    """
    import time

    import jax.numpy as jnp

    from tpuslam.frontend.pipeline import fused_stereo_frame

    from tpuslam.frontend.frame import host_prescale

    tr = sys_.tracker
    if tr.state.name != "OK":
        return 0.0
    chain = tr._dev_chain
    if chain is None:  # flushed/sync tracker: rebuild from the host pose
        T_last = np.asarray(tr.T_cw, np.float32)
        vel_inv = np.linalg.inv(tr.velocity).astype(np.float32)
        chain = (jnp.asarray(T_last), jnp.asarray(vel_inv @ T_last))
    local = tr._local_map_arrays()
    from collections import deque

    pend = deque()
    if tr._use_semidirect():
        # measure the production chunk program: anchor pair + follower
        # left images, C frames per dispatch (fps counts frames, not calls)
        from tpuslam.frontend.pipeline import fused_stereo_semidirect

        C = tr._chunk_size()
        fe = tr.cfg.frontend

        def stack(i):
            il0, ir0 = imgs[i % len(imgs)]
            fr = [host_prescale(il0, fe), host_prescale(ir0, fe)]
            fr += [host_prescale(imgs[(i + j) % len(imgs)][0], fe) for j in range(1, C)]
            return jnp.asarray(np.ascontiguousarray(np.stack(fr)))

        stacks = [stack(i * C) for i in range(6)]
        np.asarray(stacks[-1][0, :1, :1])  # drain uploads
        if tr.cfg.points is not None:
            from tpuslam.frontend.pipeline import fused_stereo_semidirect_hybrid

            plocal = tr._point_local_arrays()
            args = (
                local, plocal, float(tr.cam.fx * tr.cam.baseline), tr.cam, fe,
                tr.cfg.search_coarse, tr.cfg.search_fine, tr.cfg.pose_opt,
                tr.cfg.min_track_inliers,
            )
            kw = dict(
                sd=tr._direct_lines(), sdp=tr._direct_points(),
                pp=tr.cfg.points, ap=tr._align_params(),
            )
            fused_stereo_semidirect = fused_stereo_semidirect_hybrid
        else:
            args = (
                local, float(tr.cam.fx * tr.cam.baseline), tr.cam, fe,
                tr.cfg.search_coarse, tr.cfg.search_fine, tr.cfg.pose_opt,
                tr.cfg.min_track_inliers,
            )
            kw = dict(sd=tr._direct_lines(), ap=tr._align_params())
        out = fused_stereo_semidirect(stacks[0], chain[0], chain[1], *args, **kw)
        np.asarray(out.packed)
        n_chunks = max(4, n // C)
        t0 = time.perf_counter()
        for i in range(n_chunks):
            out = fused_stereo_semidirect(
                stacks[i % 6], chain[0], chain[1], *args, **kw
            )
            chain = (out.T_last, out.T_prevlast)
            try:
                out.packed.copy_to_host_async()
            except Exception:
                pass
            pend.append(out)
            if len(pend) > 2:
                np.asarray(pend.popleft().packed)
        while pend:
            np.asarray(pend.popleft().packed)
        dt = (time.perf_counter() - t0) / (n_chunks * C)
        log(f"bench: device-feed {1.0/dt:.1f} fps ({dt*1e3:.2f} ms/frame, chunked x{C})")
        return 1.0 / dt
    pairs = [
        jnp.asarray(
            np.stack([host_prescale(im, tr.cfg.frontend) for im in imgs[i % len(imgs)]])
        )
        for i in range(8)
    ]
    np.asarray(pairs[-1][0, :1, :1])  # drain uploads
    args = (
        float(tr.cam.fx * tr.cam.baseline), tr.cam, tr.cfg.frontend, tr.cfg.stereo,
        tr.cfg.search_coarse, tr.cfg.search_fine, tr.cfg.pose_opt,
        tr.cfg.min_track_inliers,
    )
    out = fused_stereo_frame(
        pairs[0], chain[0], chain[1], local, *args, sd=tr._direct_lines()
    )
    np.asarray(out.packed)
    t0 = time.perf_counter()
    for i in range(n):
        out = fused_stereo_frame(
            pairs[i % 8], chain[0], chain[1], local, *args, sd=tr._direct_lines()
        )
        chain = (out.T_last, out.T_prevlast)
        try:  # start the d2h at enqueue (tracking.py does the same)
            out.packed.copy_to_host_async()
        except Exception:
            pass
        pend.append(out)
        if len(pend) > 2:
            np.asarray(pend.popleft().packed)  # host resolve, two frames lagged
    while pend:
        np.asarray(pend.popleft().packed)
    dt = (time.perf_counter() - t0) / n
    log(f"bench: device-feed {1.0/dt:.1f} fps ({dt*1e3:.1f} ms/frame)")
    return 1.0 / dt


def run_ba_benchmark(quiet: bool = False) -> Dict:
    """Local-BA solve timing (ms/solve) on realistic window shapes.

    Run in its OWN process: the LM+Schur compile is the longest program in
    the framework and degrades whatever process compiles it on the axon
    backend (PERF_NOTES.md) — keeping it away from the tracking loop mirrors
    the reference's background-thread split.
    """
    import sys

    import jax
    import jax.numpy as jnp

    from tpuslam.backend.lm import LMConfig
    from tpuslam.backend.local_ba import _run_lm_jit
    from tpuslam.geometry.camera import Intrinsics
    from tpuslam.parallel.sharded_ba import _toy_problem

    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}
    for caps in ((8, 128, 512), (16, 256, 1024)):
        P_, L_, OL_ = caps
        prob = _toy_problem(rng, P_=P_, L=L_, OL=OL_, cam=cam)
        t0 = time.perf_counter()
        # np.asarray = TRUE host sync (axon block_until_ready returns at
        # enqueue — PERF_NOTES.md), so the timings below are real
        np.asarray(_run_lm_jit(prob, cam, LMConfig(max_iters=8)).cost)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(_run_lm_jit(prob, cam, LMConfig(max_iters=8)).cost)
        ms = (time.perf_counter() - t0) / 5 * 1e3
        out[f"ba_ms_P{P_}_L{L_}"] = ms
        print(f"ba bench {caps}: compile {compile_s:.1f}s solve {ms:.1f}ms", file=sys.stderr, flush=True)
    out["local_ba_ms"] = out["ba_ms_P8_L128"]
    if not quiet:
        print(json.dumps(out, default=float))
    return out


if __name__ == "__main__":
    import sys as _sys

    if "--ba" in _sys.argv:
        print(json.dumps(run_ba_benchmark(quiet=True), default=float))
    else:
        # quiet=False: run_benchmark emits progressively (first complete
        # line right after the timed loop, enriched re-prints after each
        # later stage) — the parent parses the LAST line it got
        run_benchmark(
            frames=int(os.environ.get("TPUSLAM_BENCH_FRAMES", "100")),
            warmup=6,
            quiet=False,
        )
