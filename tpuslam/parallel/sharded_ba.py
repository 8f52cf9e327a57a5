"""Sharded batched mapping (BASELINE config #5; SURVEY §3.3 item 3).

N sequences tracked concurrently -> N independent local-BA problems per
round. The batch axis is sharded over a 1-D `jax.sharding.Mesh` ('seq'):
each chip solves its sequences' LM+Schur programs locally; no cross-chip
collectives are needed because BA problems are independent — the mesh gives
linear scaling of mapping throughput over ICI-connected chips. Degrades to a
1-chip mesh transparently (SURVEY §3.3 caveat).

The reference has no distributed mode at all (single-process C++); this
module is the rebuild's scale-out axis.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence as Seq

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.backend.lm import BAProblem, BAState, LMConfig, run_lm
from tpuslam.geometry.camera import Intrinsics


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


@partial(jax.jit, static_argnums=(2,))
def _batched_ba_jit(probs: BAProblem, cam: Intrinsics, cfg: LMConfig):
    return jax.vmap(lambda p: run_lm(p, cam, cfg))(probs)


def batched_ba(
    probs: BAProblem, cam: Intrinsics, cfg: LMConfig = LMConfig(), mesh: Mesh | None = None
) -> BAState:
    """Solve a leading-axis batch of BA problems, sharded over `mesh`.

    `probs` leaves have shape (B, ...); B must divide by the mesh size.
    With no mesh, runs as a plain vmapped single-device program.
    """
    if mesh is not None:
        sharding = NamedSharding(mesh, P("seq"))
        probs = jax.tree.map(lambda x: jax.device_put(x, sharding), probs)
    return _batched_ba_jit(probs, cam, cfg)


def _toy_problem(rng: np.random.Generator, P_: int, L: int, OL: int, cam: Intrinsics) -> BAProblem:
    """A consistent tiny synthetic BA problem (noiseless observations).

    ALL geometry is batched into a handful of device calls: this fixture is
    built inside the BA worker's warm/pretouch paths on the chip, where each
    eager jnp op pays a ~0.35 s op-compile — the former per-observation
    Python loop (OL eager plucker_transforms) made every bucket warm cost
    ~90 s before the LM program even compiled."""
    from tpuslam.geometry.plucker import plucker_from_points, plucker_transform
    from tpuslam.geometry.camera import line_projection_matrix
    from tpuslam.geometry.se3 import se3_exp

    xi = (rng.normal(size=(P_, 6)) * 0.05).astype(np.float32)
    poses = np.asarray(se3_exp(jnp.asarray(xi)))
    p = rng.normal(size=(L, 3)) * 2 + [0, 0, 8.0]
    q = p + rng.normal(size=(L, 3))
    Lw = np.asarray(plucker_from_points(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32)))
    KL = np.asarray(line_projection_matrix(cam))
    l_pose = rng.integers(0, P_, OL).astype(np.int32)
    l_line = rng.integers(0, L, OL).astype(np.int32)
    Lc = np.asarray(
        plucker_transform(jnp.asarray(poses[l_pose]), jnp.asarray(Lw[l_line]))
    )  # (OL, 6)
    l = Lc[:, :3] @ KL.T  # (OL, 3) projected image lines
    # two pixel points on each projected line
    d = np.stack([-l[:, 1], l[:, 0]], axis=1)
    d = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-9)
    x0 = np.array([320.0, 240.0])
    # project x0 onto the line: x = x0 - (l.[x0,1])/(a^2+b^2) * [a,b]
    off = (l[:, 0] * x0[0] + l[:, 1] * x0[1] + l[:, 2]) / (
        l[:, 0] ** 2 + l[:, 1] ** 2 + 1e-9
    )
    base = x0[None, :] - off[:, None] * l[:, :2]
    eps = np.stack([base + 30 * d, base - 25 * d], axis=1).astype(np.float32)
    dxi = np.zeros((P_, 6), np.float32)
    dxi[1:] = (rng.normal(size=(P_ - 1, 6)) * 0.01).astype(np.float32)
    dT = np.asarray(se3_exp(jnp.asarray(dxi)))  # dT[0] = I: anchor unperturbed
    perturbed = np.einsum("pij,pjk->pik", dT, poses).astype(np.float32)
    return BAProblem(
        poses=jnp.asarray(perturbed),
        pose_free=jnp.asarray((np.arange(P_) > 0).astype(np.float32)),
        lines=jnp.asarray(Lw),
        line_valid=jnp.ones(L, jnp.float32),
        points=jnp.zeros((1, 3), jnp.float32),
        point_valid=jnp.zeros(1, jnp.float32),
        l_pose=jnp.asarray(l_pose),
        l_line=jnp.asarray(l_line),
        l_endpoints=jnp.asarray(eps),
        l_valid=jnp.ones(OL, jnp.float32),
        l_sigma=jnp.ones(OL, jnp.float32),
        p_pose=jnp.zeros(1, jnp.int32),
        p_point=jnp.zeros(1, jnp.int32),
        p_uv=jnp.zeros((1, 2), jnp.float32),
        p_valid=jnp.zeros(1, jnp.float32),
        p_sigma=jnp.ones(1, jnp.float32),
    )


def dryrun(n_devices: int) -> None:
    """Driver hook: build an n_devices mesh and run the FULL config-#5 step
    on tiny shapes — (1) batched multi-sequence tracking (one coarse+fine
    projection-search + pose-LM dispatch for all sequences, sharded on the
    'seq' axis) and (2) the sharded batched local-BA LM+Schur solve."""
    cam = Intrinsics(fx=458.0, fy=457.0, cx=320.0, cy=240.0)
    rng = np.random.default_rng(0)
    mesh = make_mesh(n_devices)
    B = n_devices

    # (1) batched tracking over the mesh (detector-bypassed tiny features)
    from tpuslam.frontend.tracking import TrackerConfig, TrackingState
    from tpuslam.io.synthetic import make_wireframe_scene, synthetic_frame_features
    from tpuslam.parallel.multi_seq import MultiTracker

    scenes = [
        make_wireframe_scene(
            np.random.default_rng(100 + s), n_segments=80, n_frames=3, cam=cam, motion_scale=0.01
        )
        for s in range(B)
    ]
    mt = MultiTracker([cam] * B, TrackerConfig(local_capacity=256), mesh=mesh)
    for f in range(3):
        per = [synthetic_frame_features(scenes[s], f, with_depth=True)[0] for s in range(B)]
        feats = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
        rs = mt.track_features(feats, [f * 0.05] * B)
    assert all(r.state == TrackingState.OK for r in rs), [r.state for r in rs]

    # (2) sharded batched BA
    probs = [_toy_problem(rng, P_=3, L=8, OL=32, cam=cam) for _ in range(B)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    state = batched_ba(batch, cam, LMConfig(max_iters=3), mesh=mesh)
    jax.block_until_ready(state.poses)
    assert state.poses.shape == (B, 3, 4, 4)
    assert bool(jnp.all(jnp.isfinite(state.cost)))
