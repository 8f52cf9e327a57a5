"""Semi-direct chunk tracking (kernels/align_direct.py + the
pipeline._fused_chunk_semidirect program).

Full detection runs only on each chunk's anchor frame; the followers are
tracked by photometric template alignment against the local 3D line map.
The trajectory must stay close to the full-detection path's, keyframes must
only come from anchor frames, and the LOST path must recover through the
lazily re-extracted host features."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.eval.ate import absolute_trajectory_error
from tpuslam.frontend.tracking import TrackerConfig, TrackingState
from tpuslam.geometry.camera import Intrinsics
from tpuslam.geometry.plucker import plucker_from_points
from tpuslam.geometry.se3 import se3_log
from tpuslam.io.synthetic import make_wireframe_scene, render_wireframe_image
from tpuslam.kernels.align_direct import (
    DirectAlignParams,
    align_frame,
    anchor_templates,
)
from tpuslam.kernels.stereo_direct import DirectStereoParams
from tpuslam.system import System

CAM = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, baseline=0.1)


def _render_seq(rng, n_frames, cam=CAM, motion_scale=0.015, n_segments=110):
    scene = make_wireframe_scene(
        rng, n_segments=n_segments, n_frames=n_frames, cam=cam, motion_scale=motion_scale
    )
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -cam.baseline
    scene_r = scene._replace(poses=np.stack([Tb @ T for T in scene.poses]))
    frames = []
    for f in range(n_frames):
        il = render_wireframe_image(scene, f, noise=1.0, rng=rng)
        ir = render_wireframe_image(scene_r, f, noise=1.0, rng=rng)
        frames.append((il, ir))
    return scene, frames


def test_align_kernel_recovers_pose(rng):
    """Templates from frame 0 at its true pose; aligning frame k seeded with
    frame k-1's pose (a motion-model-grade error) must recover the true pose
    to well under the seed error."""
    scene = make_wireframe_scene(rng, n_frames=6, cam=CAM, motion_scale=0.03)
    cam = scene.cam
    p = DirectAlignParams(align_cap=256)
    A = p.align_cap
    segs = scene.segments[:A]
    ep3d = np.zeros((A, 2, 3), np.float32)
    ep3d[: segs.shape[0]] = segs
    validf = np.zeros((A,), np.float32)
    validf[: segs.shape[0]] = 1.0
    plucker = np.asarray(
        jax.vmap(lambda e: plucker_from_points(e[0], e[1]))(jnp.asarray(ep3d))
    )
    img0 = render_wireframe_image(scene, 0).astype(np.float32) / 255.0
    tm = anchor_templates(
        jnp.asarray(img0), jnp.asarray(scene.poses[0]), jnp.asarray(ep3d),
        jnp.asarray(validf), cam, p,
    )
    assert float(np.asarray(tm.tvalid).sum()) > 50  # enough templates exist
    for k in (1, 2, 3):
        imgk = render_wireframe_image(scene, k).astype(np.float32) / 255.0
        T_true = scene.poses[k]
        T_pred = scene.poses[k - 1]  # seed error = one frame of motion
        T_new, n_samp, n_lines = align_frame(
            jnp.asarray(imgk), jnp.asarray(T_pred), jnp.asarray(plucker), tm, cam, p
        )
        err_pred = np.linalg.norm(
            se3_log(jnp.asarray(T_pred @ np.linalg.inv(T_true)))
        )
        err_new = np.linalg.norm(
            se3_log(jnp.asarray(np.asarray(T_new) @ np.linalg.inv(T_true)))
        )
        assert float(n_lines) >= 10, (k, float(n_lines))
        assert err_new < 0.35 * err_pred + 1e-3, (k, err_pred, err_new)


def _run_system(frames, tcfg):
    sys_ = System(
        CAM, sensor="stereo", loop_closing=False, mapping=True, tracker_cfg=tcfg
    )
    for f, (il, ir) in enumerate(frames):
        sys_.track_stereo(il, ir, f * 0.05)
    sys_.shutdown()
    return sys_


def test_semidirect_system_tracks(rng):
    """End-to-end System run with semi-direct chunks: ATE comparable to the
    full-detection chunked path, keyframes only from anchor frames."""
    n = 18
    scene, frames = _render_seq(rng, n)
    tcfg = TrackerConfig(
        pipelined=True,
        chunk=4,
        direct_stereo=DirectStereoParams(max_disp=64.0),
        semidirect=DirectAlignParams(align_cap=256),
    )
    sys_ = _run_system(frames, tcfg)
    traj = sorted(sys_.trajectory, key=lambda r: r.frame_idx)
    assert sorted(r.frame_idx for r in traj) == list(range(n))
    assert all(r.state == TrackingState.OK for r in traj[2:])
    est = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj])
    gt = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj])
    ate = absolute_trajectory_error(est, gt)
    assert ate.rmse < 0.04, ate

    # reference: the same frames through the full-detection chunked path
    tcfg_full = TrackerConfig(
        pipelined=True, chunk=4, direct_stereo=DirectStereoParams(max_disp=64.0)
    )
    sys_full = _run_system(frames, tcfg_full)
    traj_f = sorted(sys_full.trajectory, key=lambda r: r.frame_idx)
    est_f = np.stack([np.linalg.inv(r.T_cw)[:3, 3] for r in traj_f])
    gt_f = np.stack([np.linalg.inv(scene.poses[r.frame_idx])[:3, 3] for r in traj_f])
    ate_f = absolute_trajectory_error(est_f, gt_f)
    assert ate.rmse < ate_f.rmse + 0.025, (ate, ate_f)

    # keyframes only from frames the chunking made anchors (frame 0 = init;
    # fused chunks start at frame 1 with anchors every `chunk` frames) or
    # from the sync-path flush tail of a partial final chunk
    kf_frames = {r.frame_idx for r in traj if r.made_keyframe}
    assert 0 in kf_frames
    inter_frames = set()
    for start in range(1, n - (n - 1) % 4, 4):
        inter_frames.update(range(start + 1, min(start + 4, n)))
    flush_tail = set(range(n - (n - 1) % 4, n))
    assert not (kf_frames & inter_frames - flush_tail), (kf_frames, inter_frames)


def test_semidirect_recovers_from_blank_frames(rng):
    """Blanking two frames mid-sequence must not wedge the semi-direct
    pipeline: the LOST path re-extracts follower features from the kept host
    images and relocalizes."""
    n = 20
    scene, frames = _render_seq(rng, n)
    blank = np.zeros_like(frames[0][0])
    frames = list(frames)
    frames[9] = (blank, blank)
    frames[10] = (blank, blank)
    tcfg = TrackerConfig(
        pipelined=True,
        chunk=4,
        direct_stereo=DirectStereoParams(max_disp=64.0),
        semidirect=DirectAlignParams(align_cap=256),
    )
    sys_ = _run_system(frames, tcfg)
    traj = sorted(sys_.trajectory, key=lambda r: r.frame_idx)
    assert sorted(r.frame_idx for r in traj) == list(range(n))
    # the tail of the sequence must be tracking again
    assert all(r.state == TrackingState.OK for r in traj[-4:]), [
        (r.frame_idx, r.state) for r in traj
    ]
