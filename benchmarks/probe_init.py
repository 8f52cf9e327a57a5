"""Probe: decompose the init-frame (frame 0) stall, stage by stage, with a
hard drain (np.asarray of an output) after each device call. Mirrors
Tracker._initialize's exact call sequence at the bench config."""
import sys
import time

import numpy as np
import jax.numpy as jnp

import tpuslam  # noqa: F401
from tpuslam.frontend.frame import FrontendParams, extract_features, host_prescale
from tpuslam.frontend.tracking import _img_f32
from tpuslam.frontend.matcher import triangulate_stereo_lines
from tpuslam.frontend.tracking import TrackerConfig
from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.stereo_direct import DirectStereoParams, inject_coord_scale


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:28s}: {(time.perf_counter()-t0)*1e3:9.1f} ms", file=sys.stderr, flush=True)
    return out


def main():
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480, baseline=0.11)
    rng = np.random.default_rng(0)
    scene = make_wireframe_scene(rng, n_segments=140, n_frames=2, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    il_f = render_wireframe_image(scene, 0, noise=1.0, rng=rng)
    ir_f = render_wireframe_image(scene_r, 0, noise=1.0, rng=rng)

    fe = FrontendParams(base_scale=0.5, prescaled=True)
    sd = inject_coord_scale(DirectStereoParams(), fe.base_scale, True)
    cfg = TrackerConfig(frontend=fe, direct_stereo=sd)
    fxb = jnp.float32(cam.fx * cam.baseline)

    from tpuslam.warmup import warmup_tracking

    warmup_tracking(
        cam, frontend_params=fe, stereo_params=cfg.stereo,
        search_params=(cfg.search_coarse, cfg.search_fine),
        pose_opt_cfg=cfg.pose_opt, local_capacity=cfg.local_capacity,
        direct_stereo=sd, with_mapping=False,
        log=lambda m: print(m, file=sys.stderr, flush=True),
    )

    il = host_prescale(il_f, fe)
    ir = host_prescale(ir_f, fe)
    ild = t("upload L", lambda: jnp.asarray(_img_f32(il)))
    ird = t("upload R", lambda: jnp.asarray(_img_f32(ir)))
    t("drain uploads", lambda: np.asarray(ild[:1, :1]))

    fl = t("extract dispatch", lambda: extract_features(ild, fe))
    t("extract drain", lambda: np.asarray(fl.valid))

    from tpuslam.kernels.stereo_direct import direct_stereo_depths

    fl2 = t("direct dispatch", lambda: direct_stereo_depths(ild, ird, fl, fxb, sd))
    t("direct drain", lambda: np.asarray(fl2.has_depth))

    T_wc = t("T_wc upload", lambda: jnp.asarray(np.linalg.inv(np.eye(4, dtype=np.float32))))
    out = t("triangulate dispatch", lambda: triangulate_stereo_lines(T_wc, fl2, cam))
    t("triangulate drain", lambda: np.asarray(out[2]))
    # second pass: steady-state comparison
    for i in range(2):
        fl = t(f"extract dispatch #{i+2}", lambda: extract_features(ild, fe))
        t(f"extract drain #{i+2}", lambda: np.asarray(fl.valid))
        fl2 = t(f"direct dispatch #{i+2}", lambda: direct_stereo_depths(ild, ird, fl, fxb, sd))
        t(f"direct drain #{i+2}", lambda: np.asarray(fl2.has_depth))
        out = t(f"triangulate #{i+2}", lambda: triangulate_stereo_lines(T_wc, fl2, cam))
        t(f"triangulate drain #{i+2}", lambda: np.asarray(out[2]))
    print("done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
