"""Persistent local-BA solver subprocess.

Why a subprocess (SURVEY §3.3; PERF_NOTES.md): the reference runs
LocalMapping on a background thread whose g2o solves never touch the
tracking thread. On the axon backend the in-process equivalent is
pathological — once a process has compiled the tracking pipeline PLUS the
big LM+Schur programs, every dispatch degrades (measured: BA solves 40 ms in
a dedicated process vs 290 ms in-process, whole frames >1 s). Shipping ONLY
the jitted solve to a persistent worker keeps the tracking process's
compile/executable set small and healthy:

- parent does ALL map bookkeeping (window assembly, write-back, pruning) —
  mapping semantics stay synchronous and deterministic, tests unchanged;
- the worker owns the LM+Schur + chi2 programs, compiled once at spawn
  (warmup happens in the background while the parent warms tracking);
- the RPC moves ~1-2 MB of padded problem arrays per keyframe over a pipe
  (host<->host, no chip round trip) — noise next to the solve itself.

The worker runs on the same chip; the device interleaves its solves with
tracking dispatches (two attached processes share the tunnel).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import threading
from typing import Optional, Tuple

import numpy as np


def _worker_main(conn, warm_caps, cam_tuple, platform):
    # child process: own jax runtime, own compiled programs
    import jax

    if platform:  # tests run on CPU; the env var alone does not stick
        jax.config.update("jax_platforms", platform)

    import tpuslam  # noqa: F401  (matmul precision)
    from tpuslam.backend.lm import BAProblem, LMConfig
    from tpuslam.backend.local_ba import LocalBAConfig, _chi2_jit, _run_lm_jit
    from tpuslam.geometry.camera import Intrinsics

    cam = Intrinsics(*cam_tuple)
    ba_cfg = LocalBAConfig()

    # ready IMMEDIATELY: warmup happens lazily between requests, so the
    # parent's first solve never waits for the full bucket ladder — a solve
    # against an unwarmed bucket simply compiles here, in THIS process,
    # where the compile cannot degrade the tracking process's dispatches
    conn.send(("ready", None))
    warm_queue = (
        list(warm_caps)
        if os.environ.get("TPUSLAM_BA_WORKER_WARMUP", "1") == "1"
        else []
    )

    def warm_one():
        from tpuslam.parallel.sharded_ba import _toy_problem

        P_, L_, OL_ = warm_queue.pop(0)
        rng = np.random.default_rng(0)
        prob = _toy_problem(rng, P_=P_, L=L_, OL=OL_, cam=cam)
        state = _run_lm_jit(prob, cam, LMConfig(max_iters=8))
        _chi2_jit(state, prob, cam, ba_cfg.chi2_line, ba_cfg.chi2_point)
        np.asarray(state.cost)  # drain

    while True:
        try:
            if warm_queue and not conn.poll(0):
                warm_one()
                continue
            msg = conn.recv()
        except EOFError:
            return
        if msg is None:
            return
        kind, payload = msg
        if kind != "solve":
            continue
        prob_arrays, lm_cfg, chi2_line, chi2_point = payload
        try:
            prob = BAProblem(**prob_arrays)
            state = _run_lm_jit(prob, cam, lm_cfg)
            inl_l, inl_p = _chi2_jit(state, prob, cam, float(chi2_line), float(chi2_point))
            conn.send(
                (
                    "ok",
                    dict(
                        poses=np.asarray(state.poses),
                        lines=np.asarray(state.lines),
                        points=np.asarray(state.points),
                        cost=float(np.asarray(state.cost)),
                        inl_l=np.asarray(inl_l),
                        inl_p=np.asarray(inl_p),
                    ),
                )
            )
        except Exception as e:  # surface to the parent
            conn.send(("err", repr(e)))


class BASolverWorker:
    """Client handle for the persistent solver subprocess."""

    def __init__(
        self,
        cam,
        warm_caps=((8, 128, 512), (16, 256, 1024), (16, 512, 2048), (24, 512, 2048)),
        platform: Optional[str] = None,
    ):
        if platform is None:
            import jax

            platform = "cpu" if jax.default_backend() == "cpu" else None
        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        cam_tuple = tuple(cam)
        self._proc = ctx.Process(
            target=_worker_main,
            args=(child, tuple(warm_caps), cam_tuple, platform),
            daemon=True,
        )
        self._proc.start()
        child.close()
        self._ready = False

    def wait_ready(self, timeout: float = 1800.0):
        if self._ready:
            return
        if not self._conn.poll(timeout):
            raise TimeoutError("BA worker did not come up")
        kind, _ = self._conn.recv()
        assert kind == "ready"
        self._ready = True

    # ---- async API (the LocalMapper per-keyframe pipeline) ---------------
    def submit(self, prob_arrays: dict, lm_cfg, chi2_line: float, chi2_point: float):
        """Non-blocking: enqueue a solve. Exactly one solve should be in
        flight (LocalMapper enforces this). The send runs on a writer thread:
        a ~2 MB problem exceeds the pipe buffer, and a blocking send would
        stall the tracking process for as long as the worker is busy
        (measured 3.5 s per keyframe while the worker warmed its buckets)."""
        self.wait_ready()
        msg = ("solve", (prob_arrays, lm_cfg, chi2_line, chi2_point))
        self._send_thread = threading.Thread(
            target=self._conn.send, args=(msg,), daemon=True
        )
        self._send_thread.start()

    def poll(self, timeout: float = 0.0):
        """Result of the in-flight solve, or None if still running.
        Returns (res dict, None) | (None, err) | None."""
        if not self._conn.poll(timeout):
            return None
        kind, payload = self._conn.recv()
        if kind == "ok":
            return payload, None
        return None, str(payload)

    def solve(
        self,
        prob_arrays: dict,
        lm_cfg,
        chi2_line: float,
        chi2_point: float,
        timeout: float = 1800.0,
    ) -> Tuple[dict, Optional[str]]:
        """Blocking solve RPC. Returns (result dict, None) or (None, error)."""
        self.wait_ready(timeout)
        self._conn.send(("solve", (prob_arrays, lm_cfg, chi2_line, chi2_point)))
        if not self._conn.poll(timeout):
            return None, "BA worker solve timed out"
        kind, payload = self._conn.recv()
        if kind == "ok":
            return payload, None
        return None, str(payload)

    def close(self):
        try:
            if self._proc.is_alive():
                self._conn.send(None)
                self._proc.join(timeout=10.0)
                if self._proc.is_alive():
                    self._proc.terminate()
        except Exception:
            pass

    def __del__(self):  # best effort
        self.close()
