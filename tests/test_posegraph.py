"""Pose-graph optimization tests (SURVEY §6.2; backend/pose_graph.py)."""

import numpy as np
import jax.numpy as jnp

from tpuslam.backend.pose_graph import PoseGraphConfig, PoseGraphProblem, optimize_pose_graph
from tpuslam.geometry import se3_exp, se3_inverse, se3_log


def _circle_poses(n, radius=3.0):
    """Ground-truth T_cw for cameras on a circle looking inward."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        # camera center
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        # look at origin: z-axis toward -c
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = c
        poses.append(np.linalg.inv(T_wc).astype(np.float32))
    return np.stack(poses)


class TestPoseGraph:
    def test_loop_drift_correction(self, rng):
        n = 12
        gt = _circle_poses(n)
        # odometry with accumulated drift
        drift = np.asarray(se3_exp(jnp.asarray([0.01, 0.004, -0.008, 0.002, 0.004, -0.002], jnp.float32)))
        est = [gt[0]]
        for i in range(1, n):
            rel_true = gt[i] @ np.linalg.inv(gt[i - 1])
            est.append((drift @ rel_true @ est[-1]).astype(np.float32))
        est = np.stack(est)
        # edges: consecutive odometry (measured = drifted relative, i.e.
        # consistent with est) + loop edge n-1 -> 0 with the TRUE relative
        e_i, e_j, meas, w = [], [], [], []
        for i in range(1, n):
            e_i.append(i)
            e_j.append(i - 1)
            meas.append(est[i] @ np.linalg.inv(est[i - 1]))
            w.append(1.0)
        e_i.append(n - 1)
        e_j.append(0)
        meas.append(gt[n - 1] @ np.linalg.inv(gt[0]))
        w.append(5.0)

        pose_free = np.ones(n, np.float32)
        pose_free[0] = 0.0
        prob = PoseGraphProblem(
            poses=jnp.asarray(est),
            pose_free=jnp.asarray(pose_free),
            e_i=jnp.asarray(e_i, jnp.int32),
            e_j=jnp.asarray(e_j, jnp.int32),
            e_meas=jnp.asarray(np.stack(meas).astype(np.float32)),
            e_valid=jnp.ones(len(e_i), jnp.float32),
            e_weight=jnp.asarray(w, jnp.float32),
        )
        out, cost = optimize_pose_graph(prob, PoseGraphConfig(max_iters=20))
        out = np.asarray(out)
        # the loop edge must pull the end of the chain back toward gt
        err_before = np.linalg.norm(
            np.asarray(se3_log(jnp.asarray(est[n - 1] @ np.linalg.inv(gt[n - 1])))))
        err_after = np.linalg.norm(
            np.asarray(se3_log(jnp.asarray(out[n - 1] @ np.linalg.inv(gt[n - 1])))))
        assert err_after < 0.5 * err_before
        # loop-edge residual nearly satisfied
        rel = out[n - 1] @ np.linalg.inv(out[0])
        r = np.asarray(se3_log(jnp.asarray(np.linalg.inv(meas[-1]) @ rel)))
        assert np.linalg.norm(r) < 0.02

    def test_fixed_poses_stay_fixed(self, rng):
        n = 5
        gt = _circle_poses(n)
        prob = PoseGraphProblem(
            poses=jnp.asarray(gt),
            pose_free=jnp.asarray(np.array([0, 1, 1, 1, 0], np.float32)),
            e_i=jnp.asarray([1, 2, 3, 4], jnp.int32),
            e_j=jnp.asarray([0, 1, 2, 3], jnp.int32),
            e_meas=jnp.asarray(
                np.stack([gt[i] @ np.linalg.inv(gt[i - 1]) for i in range(1, 5)]).astype(np.float32)
            ),
            e_valid=jnp.ones(4, jnp.float32),
            e_weight=jnp.ones(4, jnp.float32),
        )
        out, _ = optimize_pose_graph(prob)
        out = np.asarray(out)
        assert np.allclose(out[0], gt[0], atol=1e-6)
        assert np.allclose(out[4], gt[4], atol=1e-6)
