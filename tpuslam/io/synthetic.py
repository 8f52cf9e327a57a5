"""Procedural synthetic SLAM scenes (SURVEY §6.2 'integration: synthetic').

Generates a 3D wireframe scene (line segments + points), a smooth camera
trajectory, and per-frame observations:

- geometric observations (projected 2D segments/pixels, bypassing the
  detector) for back-end and tracking tests with exact ground truth;
- rendered grayscale images (anti-aliased line drawing) for detector (LSD)
  and descriptor (LBD) tests, where cv2 is the LSD oracle.

Datasets are not present on disk in this environment (SURVEY §6.2), so this
module doubles as the test-time stand-in for TUM/EuRoC/KITTI sequences.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from tpuslam.geometry.camera import Intrinsics


def _se3_exp_np(xi: np.ndarray) -> np.ndarray:
    """Numpy SE(3) exponential (rho, phi) -> 4x4 (host-only; no device ops)."""
    rho, phi = xi[:3], xi[3:]
    t = np.linalg.norm(phi)
    W = np.array(
        [[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]], np.float64
    )
    if t < 1e-8:
        R = np.eye(3) + W
        V = np.eye(3) + 0.5 * W
    else:
        W2 = W @ W
        R = np.eye(3) + np.sin(t) / t * W + (1 - np.cos(t)) / t**2 * W2
        V = np.eye(3) + (1 - np.cos(t)) / t**2 * W + (t - np.sin(t)) / t**3 * W2
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = V @ rho
    return T


class SyntheticScene(NamedTuple):
    segments: np.ndarray  # (S, 2, 3) 3D segment endpoints (world)
    points: np.ndarray  # (Q, 3) 3D points (world)
    poses: np.ndarray  # (F, 4, 4) ground-truth T_cw per frame
    cam: Intrinsics


def make_wireframe_scene(
    rng: np.random.Generator,
    n_segments: int = 120,
    n_points: int = 200,
    n_frames: int = 60,
    cam: Intrinsics | None = None,
    motion_scale: float = 0.04,
) -> SyntheticScene:
    """Box-room wireframe: axis-aligned-ish segments on walls of a room the
    camera moves through, plus scattered points. Camera follows a smooth
    random walk looking roughly at the room center."""
    if cam is None:
        cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480)

    # Room: segments distributed in a shell in front of the camera start.
    centers = np.stack(
        [
            rng.uniform(-4, 4, n_segments),
            rng.uniform(-3, 3, n_segments),
            rng.uniform(4, 12, n_segments),
        ],
        axis=-1,
    )
    # Mix of axis-aligned and random directions (structured scenes favor
    # axis-aligned lines; keeps LSD detection realistic later).
    dirs = rng.normal(size=(n_segments, 3))
    axis_mask = rng.random(n_segments) < 0.6
    axes = np.eye(3)[rng.integers(0, 3, n_segments)]
    dirs = np.where(axis_mask[:, None], axes, dirs)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12
    half = rng.uniform(0.4, 1.6, (n_segments, 1))
    segments = np.stack([centers - dirs * half, centers + dirs * half], axis=1)

    points = np.stack(
        [
            rng.uniform(-4, 4, n_points),
            rng.uniform(-3, 3, n_points),
            rng.uniform(4, 12, n_points),
        ],
        axis=-1,
    )

    # Smooth trajectory: integrate a low-pass-filtered random velocity.
    # Pure numpy (no jax): scene generation must not issue eager device ops —
    # they poison the process on the axon backend (PERF_NOTES.md).
    vels = rng.normal(size=(n_frames, 6)) * motion_scale
    for i in range(1, n_frames):
        vels[i] = 0.9 * vels[i - 1] + 0.1 * vels[i]
    vels[:, 3:] *= 0.3  # gentler rotation
    T = np.eye(4, dtype=np.float32)
    poses = []
    for i in range(n_frames):
        dT = _se3_exp_np(vels[i])
        T = (dT @ T).astype(np.float32)
        poses.append(T.copy())
    return SyntheticScene(
        segments=segments.astype(np.float32),
        points=points.astype(np.float32),
        poses=np.stack(poses),
        cam=cam,
    )


def make_loop_scene(
    rng: np.random.Generator,
    n_segments: int = 240,
    n_frames: int = 80,
    radius: float = 6.0,
    room: float = 16.0,
    cam: Intrinsics | None = None,
) -> SyntheticScene:
    """Camera circles inside a wireframe 'room' and returns to its start —
    the loop-closure fixture (SURVEY §6.2 config #4 analog). Segments are
    scattered on a cylinder of walls around the circular path; the camera
    looks forward along the path, so the start region is revisited with the
    same viewpoint at the end."""
    if cam is None:
        cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0, width=640, height=480)
    ang = rng.uniform(0, 2 * np.pi, n_segments)
    h = rng.uniform(-2.5, 2.5, n_segments)
    centers = np.stack(
        [room * np.cos(ang), h, room * np.sin(ang)], axis=-1
    )
    dirs = rng.normal(size=(n_segments, 3))
    axis_mask = rng.random(n_segments) < 0.6
    axes = np.eye(3)[rng.integers(0, 3, n_segments)]
    dirs = np.where(axis_mask[:, None], axes, dirs)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12
    half = rng.uniform(0.5, 2.0, (n_segments, 1))
    segments = np.stack([centers - dirs * half, centers + dirs * half], axis=1)

    poses = []
    for f in range(n_frames):
        a = 2 * np.pi * f / n_frames
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        # look along the (tangential) direction of motion
        z = np.array([-np.sin(a), 0.0, np.cos(a)])
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = np.stack([x, y, z], axis=1)
        T_wc[:3, 3] = c
        poses.append(np.linalg.inv(T_wc).astype(np.float32))
    return SyntheticScene(
        segments=segments.astype(np.float32),
        points=np.zeros((0, 3), np.float32),
        poses=np.stack(poses),
        cam=cam,
    )


class FrameObservations(NamedTuple):
    """Geometric (detector-bypassing) observations of one frame."""

    seg_uv: np.ndarray  # (S, 2, 2) projected segment endpoints (px)
    seg_visible: np.ndarray  # (S,) bool — both endpoints in front & in image
    pt_uv: np.ndarray  # (Q, 2)
    pt_visible: np.ndarray  # (Q,) bool


def observe_frame(
    scene: SyntheticScene,
    frame: int,
    noise_px: float = 0.0,
    rng: np.random.Generator | None = None,
    min_z: float = 0.2,
    margin: float = 0.0,
) -> FrameObservations:
    cam = scene.cam
    T = scene.poses[frame]
    R, t = T[:3, :3], T[:3, 3]

    def project(X):  # (N, 3) world -> (N, 2) px, (N,) z
        Xc = X @ R.T + t
        z = Xc[:, 2]
        uv = np.stack(
            [
                cam.fx * Xc[:, 0] / np.maximum(z, 1e-9) + cam.cx,
                cam.fy * Xc[:, 1] / np.maximum(z, 1e-9) + cam.cy,
            ],
            axis=-1,
        )
        return uv, z

    p_uv, p_z = project(scene.segments[:, 0])
    q_uv, q_z = project(scene.segments[:, 1])
    seg_uv = np.stack([p_uv, q_uv], axis=1)

    def in_image(uv):
        return (
            (uv[:, 0] >= margin)
            & (uv[:, 0] < cam.width - margin)
            & (uv[:, 1] >= margin)
            & (uv[:, 1] < cam.height - margin)
        )

    seg_visible = (p_z > min_z) & (q_z > min_z) & in_image(p_uv) & in_image(q_uv)

    pt_uv, pt_z = project(scene.points)
    pt_visible = (pt_z > min_z) & in_image(pt_uv)

    if noise_px > 0:
        assert rng is not None
        seg_uv = seg_uv + rng.normal(size=seg_uv.shape) * noise_px
        pt_uv = pt_uv + rng.normal(size=pt_uv.shape) * noise_px

    return FrameObservations(
        seg_uv=seg_uv.astype(np.float32),
        seg_visible=seg_visible,
        pt_uv=pt_uv.astype(np.float32),
        pt_visible=pt_visible,
    )


def synthetic_frame_features(
    scene: SyntheticScene,
    frame: int,
    capacity: int = 256,
    noise_px: float = 0.0,
    rng: np.random.Generator | None = None,
    with_depth: bool = False,
    desc_seed: int = 1234,
    drop_prob: float = 0.0,
):
    """Detector-bypassing FrameFeatures: projected ground-truth segments with
    identity-stable binary descriptors (segment s always hashes to the same
    256 bits), so matching is exact and tracking/BA can be tested in
    isolation (SURVEY §6.2 'integration: synthetic SLAM')."""
    from tpuslam.frontend.frame import FrameFeatures

    obs = observe_frame(scene, frame, noise_px=noise_px, rng=rng)
    S = scene.segments.shape[0]
    drs = np.random.RandomState(desc_seed)
    all_bits = drs.randint(0, 2**32, size=(S, 8), dtype=np.uint64).astype(np.uint32)
    all_desc = drs.standard_normal((S, 72)).astype(np.float32)

    vis = np.nonzero(obs.seg_visible)[0]
    if drop_prob > 0 and rng is not None:
        vis = vis[rng.random(len(vis)) > drop_prob]
    vis = vis[:capacity]
    n = len(vis)

    K = capacity
    ep = np.zeros((K, 2, 2), np.float32)
    valid = np.zeros(K, np.float32)  # f32 mask (see FrameFeatures docstring)
    angle = np.zeros(K, np.float32)
    length = np.zeros(K, np.float32)
    mid = np.zeros((K, 2), np.float32)
    resp = np.zeros(K, np.float32)
    sigma = np.ones(K, np.float32)
    desc = np.zeros((K, 72), np.float32)
    bits = np.zeros((K, 8), np.uint32)
    depth = np.zeros((K, 2), np.float32)
    has_depth = np.zeros(K, np.float32)

    ep[:n] = obs.seg_uv[vis]
    valid[:n] = 1.0
    d = ep[:n, 1] - ep[:n, 0]
    angle[:n] = np.arctan2(d[:, 1], d[:, 0])
    length[:n] = np.linalg.norm(d, axis=-1)
    mid[:n] = ep[:n].mean(axis=1)
    resp[:n] = length[:n]
    desc[:n] = all_desc[vis]
    bits[:n] = all_bits[vis]

    if with_depth:
        T = scene.poses[frame]
        seg_c = scene.segments @ T[:3, :3].T + T[:3, 3]
        depth[:n] = seg_c[vis][:, :, 2]
        has_depth[:n] = np.all(depth[:n] > 0.1, axis=-1).astype(np.float32)

    return (
        FrameFeatures(
            endpoints=ep,
            valid=valid,
            angle=angle,
            length=length,
            midpoint=mid,
            response=resp,
            level=np.zeros(K, np.int32),
            sigma=sigma,
            desc=desc,
            desc_bits=bits,
            depth=depth,
            has_depth=has_depth,
        ),
        vis,
    )


def render_wireframe_image(
    scene: SyntheticScene,
    frame: int,
    bg: float = 200.0,
    fg: float = 40.0,
    thickness: int = 2,
    noise: float = 2.0,
    rng: np.random.Generator | None = None,
    draw_points: bool = False,
    dot_radius: int = 2,
) -> np.ndarray:
    """Render a grayscale uint8 image of the wireframe via cv2 line drawing
    (test fixture for the LSD/LBD kernels; cv2 is a test-only dependency).

    With ``draw_points`` the scene's 3D points render as filled dots of
    ``dot_radius`` px: a dot smaller than FAST's radius-3 test circle makes
    its CENTER pixel a maximal FAST corner, so the detected corner uv is the
    projection of the 3D point (the fixture for the hybrid point front-end).
    """
    import cv2

    cam = scene.cam
    obs = observe_frame(scene, frame)
    img = np.full((cam.height, cam.width), bg, np.float32)
    for s in range(scene.segments.shape[0]):
        if not obs.seg_visible[s]:
            continue
        p = tuple(np.round(obs.seg_uv[s, 0]).astype(int))
        q = tuple(np.round(obs.seg_uv[s, 1]).astype(int))
        cv2.line(img, p, q, float(fg), thickness, lineType=cv2.LINE_AA)
    if draw_points:
        # Gaussian splats, NOT cv2.circle: small filled circles rasterize
        # without anti-aliasing, which erases the very subpixel disparity
        # fraction the detector's refinement is tested against. The splat is
        # evaluated at the exact projected center.
        H, W = img.shape

        def splat(cx, cy, sigma, amp):
            r = int(3 * sigma) + 2
            x0, x1 = int(np.floor(cx)) - r, int(np.floor(cx)) + r + 1
            y0, y1 = int(np.floor(cy)) - r, int(np.floor(cy)) + r + 1
            x0c, x1c = max(x0, 0), min(x1, W)
            y0c, y1c = max(y0, 0), min(y1, H)
            if x0c >= x1c or y0c >= y1c:
                return
            xs = np.arange(x0c, x1c, dtype=np.float32) - cx
            ys = np.arange(y0c, y1c, dtype=np.float32) - cy
            g = np.exp(-(ys[:, None] ** 2 + xs[None, :] ** 2) / (2.0 * sigma * sigma))
            img[y0c:y1c, x0c:x1c] -= amp * g

        amp = float(bg - fg)
        for q_ in np.nonzero(obs.pt_visible)[0]:
            cx, cy = float(obs.pt_uv[q_, 0]), float(obs.pt_uv[q_, 1])
            splat(cx, cy, 0.5 * dot_radius + 0.5, amp)
            # per-point satellite dots at FIXED image offsets: give BRIEF a
            # distinctive, view-stable pattern inside its 13 px reach while
            # the center dot stays the exact projection of the 3D point
            # (identical plain dots would all tie under the Lowe ratio test)
            rsq = np.random.RandomState(1000 + int(q_))
            for o in rsq.randint(-9, 10, (3, 2)):
                if np.max(np.abs(o)) >= 4:  # keep satellites off the center
                    splat(cx + float(o[0]), cy + float(o[1]), 0.8, amp)
        np.clip(img, 0, 255, out=img)
    if noise > 0 and rng is not None:
        img = img + rng.normal(size=img.shape) * noise
    return np.clip(img, 0, 255).astype(np.uint8)
