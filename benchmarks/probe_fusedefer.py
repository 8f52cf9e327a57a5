"""Probe: ATE cost of the deferred duplicate-fusion apply, with tick().

Round-3 session 5 measured fuse_defer costing ATE 0.030 -> 0.037 on short
CPU sequences when the apply waited a WHOLE keyframe interval. System now
calls mapper.tick() per tracked frame, which applies the fusion once its
d2h has had ~40 ms to land (2-3 frames at bench rate, next frame on CPU).
This probe drives the same short synthetic sequence both ways and reports
ATE, so the bench default (TPUSLAM_BENCH_FUSEDEFER) is a measured choice.

CPU-pinned: jax_platforms set in-process (env vars do not stick under
sitecustomize — SESSION_NOTES gotcha).
"""
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from tpuslam.backend.mapping import MapperConfig
from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.frame import FrontendParams
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.align_direct import DirectAlignParams
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(fuse_defer: bool, imgs, scene, cam, C: int, seed_tag=""):
    tcfg = TrackerConfig(
        pipelined=True,
        chunk=C,
        frontend=FrontendParams(base_scale=0.5, prescaled=True),
        direct_stereo=DirectStereoParams(),
        semidirect=DirectAlignParams() if C >= 2 else None,
    )
    sys_ = System(
        cam, sensor="stereo", loop_closing=False, mapping=True,
        tracker_cfg=tcfg, mapper_cfg=MapperConfig(fuse_defer=fuse_defer),
    )
    for f, (il, ir) in enumerate(imgs):
        sys_.track_stereo(il, ir, f * 0.05)
    sys_.trajectory.extend(sys_.tracker.flush_all())
    sys_.shutdown()
    traj = sys_.trajectory
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj])
    ate = float(absolute_trajectory_error(est, gt).rmse)
    log(f"{seed_tag} C={C} fuse_defer={int(fuse_defer)}: ATE {ate:.4f} "
        f"({len(traj)}/{len(imgs)} frames, kfs={len(sys_.map.keyframes)})")
    return ate


def main():
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0,
                     width=640, height=480, baseline=0.11)
    n = int(os.environ.get("PROBE_FRAMES", "40"))
    C = int(os.environ.get("PROBE_CHUNK", "4"))
    offs, ons = [], []
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        scene = make_wireframe_scene(rng, n_segments=140, n_frames=n, cam=cam,
                                     motion_scale=0.02)
        Tb = np.eye(4, dtype=np.float32)
        Tb[0, 3] = -cam.baseline
        scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
        imgs = [
            (render_wireframe_image(scene, f, noise=1.0, rng=rng),
             render_wireframe_image(scene_r, f, noise=1.0, rng=rng))
            for f in range(n)
        ]
        offs.append(run(False, imgs, scene, cam, C, f"seed={seed}"))
        ons.append(run(True, imgs, scene, cam, C, f"seed={seed}"))
    log(f"median ATE: fuse_defer=0 {np.median(offs):.4f}  "
        f"fuse_defer=1 {np.median(ons):.4f}")


if __name__ == "__main__":
    main()
