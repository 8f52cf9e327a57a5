"""Sanitizer-equivalent lanes (SURVEY §7 'race/sanitizer equivalents').

The reference ships TSan/ASan CI jobs; a single-host-thread jax rebuild's
equivalents are:

1. `jax.disable_jit()` — runs traced programs op-by-op (eager), catching
   tracer leaks, Python-side shape bugs, and out-of-bounds indexing that
   compiled gathers silently clamp.
2. `jax.debug_nans` — raises at the first NaN-producing primitive instead
   of letting it propagate into the trajectory.

These run a miniature end-to-end slice (small frames, tiny capacities) so
the lane stays fast enough for every CI run; `ci.yaml` wires the file as a
dedicated job.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.geometry.camera import Intrinsics
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image


def _mini_setup(rng, n_frames=4):
    cam = Intrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120, baseline=0.1)
    scene = make_wireframe_scene(rng, n_segments=40, n_frames=n_frames, cam=cam, motion_scale=0.02)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    return cam, scene, scene_r


def _mini_configs():
    from tpuslam.frontend.frame import FrontendParams, StereoParams
    from tpuslam.frontend.tracking import TrackerConfig
    from tpuslam.kernels.lbd import LBDParams
    from tpuslam.kernels.lsd import LSDParams

    fe = FrontendParams(
        max_lines=64,
        n_levels=1,
        lsd=LSDParams(ccl_rounds=24, ccl_jumps=2, min_length=10.0, min_support=12),
        lbd=LBDParams(patch=32),
    )
    return TrackerConfig(
        frontend=fe,
        stereo=StereoParams(),
        local_capacity=128,
        min_init_lines=6,
        min_track_matches=4,
        min_track_inliers=4,
    )


def test_disable_jit_tracking_slice(rng):
    """A stereo init + 2 tracked frames runs eagerly without tracer/shape
    errors (the disable-jit lane promised in SURVEY §7)."""
    from tpuslam.frontend.tracking import Tracker, TrackingState
    from tpuslam.slammap.map import SlamMap

    cam, scene, scene_r = _mini_setup(rng)
    cfg = _mini_configs()
    with jax.disable_jit():
        tracker = Tracker(cam, SlamMap(), cfg)
        for f in range(3):
            il = render_wireframe_image(scene, f, noise=0.5, rng=rng).astype(np.float32) / 255.0
            ir = render_wireframe_image(scene_r, f, noise=0.5, rng=rng).astype(np.float32) / 255.0
            res = tracker.track_stereo(il, ir, f * 0.1)
        assert res.state == TrackingState.OK
        assert np.isfinite(res.T_cw).all()


def test_debug_nans_core_math(rng):
    """Geometry + LM core under jax_debug_nans: any NaN-producing primitive
    raises immediately (the nan-check lane promised in SURVEY §7)."""
    from tpuslam.backend.lm import LMConfig
    from tpuslam.backend.local_ba import _run_lm_jit
    from tpuslam.geometry.se3 import se3_exp, se3_log
    from tpuslam.parallel.sharded_ba import _toy_problem

    cam = Intrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120, baseline=0.1)
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        xi = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
        T = se3_exp(xi)
        np.testing.assert_allclose(np.asarray(se3_log(T)), np.asarray(xi), atol=1e-4)

        prob = _toy_problem(rng, P_=4, L=32, OL=128, cam=cam)
        state = _run_lm_jit(prob, cam, LMConfig(max_iters=4))
        assert np.isfinite(float(state.cost))
        assert np.isfinite(np.asarray(state.poses)).all()
    finally:
        jax.config.update("jax_debug_nans", prev)


def test_debug_nans_extract(rng):
    """Feature extraction is NaN-free on a real rendered frame AND on a
    degenerate all-black frame (division guards in moments/extents)."""
    from tpuslam.frontend.frame import extract_features

    cam, scene, _ = _mini_setup(rng)
    cfg = _mini_configs()
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        img = render_wireframe_image(scene, 0, noise=0.5, rng=rng).astype(np.float32) / 255.0
        feats = extract_features(jnp.asarray(img), cfg.frontend)
        assert np.isfinite(np.asarray(feats.endpoints)).all()
        feats0 = extract_features(jnp.zeros((120, 160), jnp.float32), cfg.frontend)
        assert float(np.asarray(feats0.valid).sum()) == 0.0
        assert np.isfinite(np.asarray(feats0.endpoints)).all()
    finally:
        jax.config.update("jax_debug_nans", prev)
