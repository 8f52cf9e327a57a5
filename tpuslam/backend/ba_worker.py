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
- the worker owns the LM+Schur + chi2 programs, compiled on demand against
  a persistent on-disk executable cache; a separate THROWAWAY warmer
  process pre-compiles the bucket ladder into that cache in parallel, so a
  warm compile never queues a real solve behind it;
- the RPC moves ~1-2 MB of padded problem arrays per keyframe over a pipe
  (host<->host, no chip round trip) — noise next to the solve itself.

Protocol: every request carries a client-assigned sequence id and every
response echoes it. The client matches responses to ids and stashes
out-of-order arrivals, so a blocking `solve()` (global BA during loop
closure) can never consume the result of an in-flight async `submit()`
(local BA) — the two would otherwise write bucket-sized arrays across the
wrong parts of the map. All pipe sends go through one writer lock: a ~2 MB
problem exceeds the 64 KB pipe buffer, so an unlocked send from two threads
would interleave the pickle stream.

The worker runs on the same chip; the device interleaves its solves with
tracking dispatches (two attached processes share the tunnel).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import threading
import time
from typing import Optional, Tuple

import numpy as np


def _enable_persistent_cache(jax):
    cache_dir = os.environ.get("TPUSLAM_BA_CACHE_DIR", "/tmp/tpuslam_ba_cache")
    if cache_dir:  # persistent executable cache: bucket compiles are paid
        try:  # once per MACHINE, not once per worker incarnation —
            # machine-keyed because a cache written by a different host CPU
            # segfaults on read (tpuslam.host_cache_tag)
            from tpuslam import host_cache_tag

            jax.config.update(
                "jax_compilation_cache_dir", f"{cache_dir}_{host_cache_tag()}"
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax without the knob: compile as before


def _warmer_main(conn, warm_caps, cam_tuple, platform):
    """Throwaway bucket-warming process: compiles the LM+Schur ladder into
    the PERSISTENT cache and exits. Runs beside the solver process so a
    minutes-long warm compile can never queue a real local-BA solve behind
    it (round-3 bench: 4/5 BA windows skipped while the solver warmed
    buckets the run never used). The solver sees the warmth through the
    shared on-disk cache: its own on-demand compile becomes a ~2 s cache
    load instead of a remote compile."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    _enable_persistent_cache(jax)

    import tpuslam  # noqa: F401  (matmul precision)
    from tpuslam.backend.lm import LMConfig
    from tpuslam.backend.local_ba import LocalBAConfig, _chi2_jit, _run_lm_jit
    from tpuslam.geometry.camera import Intrinsics
    from tpuslam.parallel.sharded_ba import _toy_problem

    cam = Intrinsics(*cam_tuple)
    ba_cfg = LocalBAConfig()
    rng = np.random.default_rng(0)
    for P_, L_, OL_ in warm_caps:
        try:
            prob = _toy_problem(rng, P_=P_, L=L_, OL=OL_, cam=cam)
            state = _run_lm_jit(prob, cam, LMConfig(max_iters=8))
            inl = _chi2_jit(state, prob, cam, ba_cfg.chi2_line, ba_cfg.chi2_point)
            np.asarray(state.cost)  # TRUE drains (block_until_ready returns
            np.asarray(inl[0])  # at enqueue on axon — PERF_NOTES.md)
            # one "warmed" per bucket: clients can wait for just the first
            # (smallest, most-used) bucket instead of the full ladder
            conn.send(("warmed", -1, (P_, L_, OL_)))
        except Exception:
            break
    try:
        conn.send(("warm_done", -1, None))
    except Exception:
        pass


def _worker_main(conn, cam_tuple, platform):
    # child process: own jax runtime, own compiled programs
    import jax

    if platform:  # tests run on CPU; the env var alone does not stick
        jax.config.update("jax_platforms", platform)
    _enable_persistent_cache(jax)

    import tpuslam  # noqa: F401  (matmul precision)
    from tpuslam.backend.lm import BAProblem, LMConfig
    from tpuslam.backend.local_ba import LocalBAConfig, _chi2_jit, _run_lm_jit
    from tpuslam.geometry.camera import Intrinsics

    cam = Intrinsics(*cam_tuple)
    ba_cfg = LocalBAConfig()
    seen = set()  # bucket shapes this incarnation has compiled

    def _bucket_key(prob_arrays, lm_cfg):
        return (
            tuple((f, np.shape(v)) for f, v in sorted(prob_arrays.items())),
            repr(lm_cfg),
        )

    # ready IMMEDIATELY: a solve against an unwarmed bucket simply compiles
    # here, in THIS process, where the compile cannot degrade the tracking
    # process's dispatches (and hits the persistent cache when the warmer
    # process got to that bucket first)
    conn.send(("ready", -1, None))

    while True:
        try:
            msg = conn.recv()
        except EOFError:
            return
        if msg is None:
            return
        kind, req_id, payload = msg
        if kind == "pretouch":
            # load/compile a bucket's programs into THIS process's jit cache
            # before timing-sensitive sections: the warmer process fills the
            # persistent on-disk cache, but the solver's own first touch of a
            # bucket still pays a multi-second trace + cache load — observed
            # mid-run as a 5.5 s "cold" solve that skipped 5/6 BA windows
            # (round-3 bench postmortem).
            P_, L_, OL_, lm_cfg, chi2_line, chi2_point = payload
            try:
                from tpuslam.parallel.sharded_ba import _toy_problem

                t0 = time.perf_counter()
                prob = _toy_problem(
                    np.random.default_rng(0), P_=P_, L=L_, OL=OL_, cam=cam
                )
                # mirror the REAL solve path exactly — numpy inputs (the
                # submit path ships numpy through the pipe; device-array toy
                # inputs warmed a different jit entry and the first real
                # solve still paid ~3.6 s, measured r5) + the SAME sequence
                # of programs incl. initial_chi2_masks
                prob = BAProblem(
                    **{f: np.asarray(getattr(prob, f)) for f in prob._fields}
                )
                state = _run_lm_jit(prob, cam, lm_cfg)
                inl = _chi2_jit(state, prob, cam, float(chi2_line), float(chi2_point))
                from tpuslam.backend.local_ba import initial_chi2_masks

                inl0 = initial_chi2_masks(
                    prob, cam, float(chi2_line), float(chi2_point)
                )
                np.asarray(state.cost)  # TRUE drains (axon block_until_ready
                np.asarray(inl[0])  # returns at enqueue — PERF_NOTES.md)
                np.asarray(inl0[0])
                first_ms = (time.perf_counter() - t0) * 1e3
                # second run = steady dispatch+solve only; first - steady
                # isolates the trace+compile/cache-load share so the bench
                # log can say WHERE pretouch seconds went (VERDICT r4 item 9:
                # ~4-6 s cache-warm vs 30+ s = remote compile / cache miss)
                t1 = time.perf_counter()
                state = _run_lm_jit(prob, cam, lm_cfg)
                np.asarray(state.cost)
                steady_ms = (time.perf_counter() - t1) * 1e3
                prob_arrays = {f: np.asarray(getattr(prob, f)) for f in prob._fields}
                seen.add(_bucket_key(prob_arrays, lm_cfg))
                conn.send(
                    ("ok", req_id,
                     {"pretouch_ms": first_ms, "steady_ms": steady_ms})
                )
            except Exception as e:
                conn.send(("err", req_id, repr(e)))
            continue
        if kind != "solve":
            continue
        prob_arrays, lm_cfg, chi2_line, chi2_point = payload
        try:
            key = _bucket_key(prob_arrays, lm_cfg)
            was_warm = key in seen
            t0 = time.perf_counter()
            prob = BAProblem(**prob_arrays)
            state = _run_lm_jit(prob, cam, lm_cfg)
            t_lm = time.perf_counter()
            inl_l, inl_p = _chi2_jit(state, prob, cam, float(chi2_line), float(chi2_point))
            # initial-state masks for the divergence guard (same compiled
            # executable as the call above — identical shapes)
            from tpuslam.backend.local_ba import initial_chi2_masks

            inl_l0, inl_p0 = initial_chi2_masks(
                prob, cam, float(chi2_line), float(chi2_point)
            )
            t_chi2 = time.perf_counter()
            res = dict(
                poses=np.asarray(state.poses),
                lines=np.asarray(state.lines),
                points=np.asarray(state.points),
                cost=float(np.asarray(state.cost)),
                inl_l=np.asarray(inl_l),
                inl_p=np.asarray(inl_p),
                inl_l0=np.asarray(inl_l0),
                inl_p0=np.asarray(inl_p0),
            )
            t_d2h = time.perf_counter()
            seen.add(key)
            # wall time incl. host sync; `warm` tells callers whether this
            # solve paid a bucket compile — timing stats use warm-only rows.
            # Stage split (enqueue-time semantics: the d2h stage absorbs the
            # actual device execution — axon block_until_ready returns at
            # enqueue): lm = dispatch enqueue, chi2 = mask enqueues,
            # d2h = results resolve + device time.
            res["solve_ms"] = (time.perf_counter() - t0) * 1e3
            res["stage_ms"] = {
                "lm_enqueue": (t_lm - t0) * 1e3,
                "chi2_enqueue": (t_chi2 - t_lm) * 1e3,
                "exec_d2h": (t_d2h - t_chi2) * 1e3,
            }
            res["warm"] = was_warm
            conn.send(("ok", req_id, res))
        except Exception as e:  # surface to the parent
            conn.send(("err", req_id, repr(e)))


class BASolverWorker:
    """Client handle for the persistent solver subprocess."""

    # the DIAGONAL rungs of LocalBAConfig's bucket lists — production
    # solves are constrained to exactly these shapes (local_ba.bucket_ladder),
    # so this ladder covers every local-BA program a run can request
    _DEFAULT_WARM = ((8, 128, 512), (16, 256, 1024), (24, 512, 2048), (24, 1024, 4096))

    def __init__(
        self,
        cam,
        warm_caps=_DEFAULT_WARM,
        platform: Optional[str] = None,
    ):
        if platform is None:
            import jax

            platform = "cpu" if jax.default_backend() == "cpu" else None
        env_caps = os.environ.get("TPUSLAM_BA_WARM_CAPS")
        if env_caps is not None:
            # "P,L,OL;P,L,OL;..." — lets a deployment (or the bench) bound
            # the warm ladder to the buckets its run actually hits; the big
            # buckets take minutes of remote compile and contend on the
            # serialized tunnel with timed dispatches
            warm_caps = tuple(
                tuple(int(x) for x in part.split(","))
                for part in env_caps.split(";")
                if part.strip()
            )
        self._ctor = (cam, tuple(warm_caps), platform)  # for restart()
        self._spawn()

    def _spawn(self):
        cam, warm_caps, platform = self._ctor
        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(
            target=_worker_main,
            args=(child, tuple(cam), platform),
            daemon=True,
        )
        self._proc.start()
        child.close()
        # bucket warms run in their own THROWAWAY process (shared persistent
        # cache): a minutes-long warm compile in the solver would queue real
        # local-BA solves behind it (observed ba_skipped=4/5 mid-bench)
        self._warm_conn = None
        self._warm_proc = None
        if warm_caps and os.environ.get("TPUSLAM_BA_WORKER_WARMUP", "1") == "1":
            self._warm_conn, wchild = ctx.Pipe()
            self._warm_proc = ctx.Process(
                target=_warmer_main,
                args=(wchild, tuple(warm_caps), tuple(cam), platform),
                daemon=True,
            )
            self._warm_proc.start()
            wchild.close()
        self._ready = False
        self._warm_count = 0
        self._send_lock = threading.Lock()
        self._next_id = 0
        self._stash: dict = {}  # req_id -> (kind, payload) received out of order

    def restart(self):
        """Kill and respawn the worker (drain-timeout recovery: a late result
        from the dead incarnation can never be mispaired with a new request
        because the old pipe dies with it)."""
        self.close()
        self._spawn()

    def stop_warmer(self):
        """Terminate the throwaway warmer process. A warm compile in flight
        contends on the serialized tunnel with every timed dispatch
        (PERF_NOTES: a 4.4 s solve took 35.5 s under warmer contention) —
        callers that are about to time should stop it once their wait-for-
        warmth budget is spent."""
        p, self._warm_proc = self._warm_proc, None
        conn, self._warm_conn = self._warm_conn, None
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass
        if p is not None and p.is_alive():
            p.terminate()
            p.join(timeout=5)

    def wait_ready(self, timeout: float = 1800.0):
        if self._ready:
            return
        if not self._conn.poll(timeout):
            raise TimeoutError("BA worker did not come up")
        try:
            kind, _, _ = self._conn.recv()
        except EOFError:
            # the child died before sending "ready" — by far the most common
            # cause is a caller script without a __main__ guard: the spawn
            # start method re-imports the caller's main module, which then
            # re-constructs System/BASolverWorker recursively and aborts
            raise RuntimeError(
                "BA worker subprocess died during startup. If your script "
                "constructs tpuslam.System at module top level, wrap the "
                "entry point in `if __name__ == '__main__':` — the worker "
                "uses multiprocessing 'spawn', which re-imports your main "
                "module (see 'Safe importing of main module' in the "
                "multiprocessing docs). Alternatively pass "
                "System(..., ba_worker=False) to solve in-process."
            ) from None
        assert kind == "ready"
        self._ready = True

    def _send_async(self, msg):
        """All sends go through one lock on a writer thread: a ~2 MB problem
        exceeds the pipe buffer, so (a) a blocking send would stall the
        tracking loop for as long as the worker is busy, and (b) concurrent
        sends would interleave the pickle stream."""

        def _locked_send():
            with self._send_lock:
                try:
                    self._conn.send(msg)
                except (OSError, ValueError, BrokenPipeError):
                    pass  # worker died; poll()/solve() report the failure

        t = threading.Thread(target=_locked_send, daemon=True)
        t.start()
        return t

    def _recv_matching(self, req_id: int, timeout: float):
        """Next response for ``req_id`` or None; stashes other ids."""
        if req_id in self._stash:
            return self._stash.pop(req_id)
        deadline = time.monotonic() + timeout
        while True:
            remain = deadline - time.monotonic()
            if not self._conn.poll(max(remain, 0.0)):
                return None
            kind, rid, payload = self._conn.recv()
            if kind == "ready":
                self._ready = True
                continue
            if kind == "warmed":
                self._warm_count += 1
                continue
            if rid == req_id:
                return kind, payload
            self._stash[rid] = (kind, payload)
            if time.monotonic() >= deadline:
                return None

    def wait_warm(self, timeout: float = 1800.0, n_buckets: int = 1):
        """Block until the warmer process has compiled its first
        ``n_buckets`` buckets into the persistent cache. Use before
        timing-sensitive sections (bench.py): the first real solve otherwise
        pays a bucket compile, stalling the async BA cadence (observed: 4/5
        windows skipped mid-compile). Default waits for ONE bucket — the
        small first bucket covers the common local-BA windows, while the
        full ladder can take minutes of compile on a bad lottery day (the
        warmer keeps going in the background, in its own process)."""
        self.wait_ready(timeout)
        if self._warm_conn is None:
            return  # warmup disabled: nothing to wait for
        deadline = time.monotonic() + timeout
        while self._warm_count < n_buckets:
            remain = deadline - time.monotonic()
            if remain <= 0 or not self._warm_conn.poll(max(remain, 0.0)):
                raise TimeoutError("BA worker warmup timed out")
            try:
                kind, _, _ = self._warm_conn.recv()
            except EOFError:
                raise TimeoutError("BA warmer process exited early")
            if kind == "warmed":
                self._warm_count += 1
            elif kind == "warm_done":
                break

    @property
    def warm_caps(self):
        """The (P, L, OL) bucket rungs this worker's warmer compiles."""
        return self._ctor[1]

    def pretouch(self, bucket, lm_cfg, chi2_line: float, chi2_point: float,
                 timeout: float = 300.0) -> Optional[float]:
        """Blocking: make the SOLVER process load/compile the given (P, L,
        OL) bucket's programs into its own jit cache (a toy solve, result
        discarded). Call after `wait_warm` for each warmed bucket and before
        timing: the warmer only fills the on-disk cache, and the solver's
        first touch of a bucket otherwise pays a multi-second cache load
        mid-run. Returns the pretouch wall ms (None on timeout/error)."""
        req_id = self.pretouch_async(bucket, lm_cfg, chi2_line, chi2_point,
                                     timeout=timeout)
        out = self.pretouch_wait(req_id, timeout=timeout)
        return out[0] if out is not None else None

    def pretouch_async(self, bucket, lm_cfg, chi2_line: float,
                       chi2_point: float, timeout: float = 300.0) -> int:
        """Non-blocking pretouch: enqueue the bucket's toy solve in the
        solver process and return a request id for `pretouch_wait`. Lets the
        bench overlap the solver's bucket trace+load with the tracking
        warmup in the main process (VERDICT r4 item 9: serial warmup then
        serial pretouch cost ~sum; the worker compiles in its own process,
        so overlapped they cost ~max)."""
        self.wait_ready(timeout)
        P_, L_, OL_ = bucket
        self._next_id += 1
        req_id = self._next_id
        self._send_async(
            ("pretouch", req_id,
             (int(P_), int(L_), int(OL_), lm_cfg, float(chi2_line), float(chi2_point)))
        )
        return req_id

    def pretouch_wait(self, req_id: int, timeout: float = 300.0):
        """(first_ms, steady_ms) of a pretouch_async request, or None."""
        out = self._recv_matching(req_id, timeout)
        if out is None:
            return None
        kind, payload = out
        if kind == "ok":
            return (
                float(payload.get("pretouch_ms", 0.0)),
                float(payload.get("steady_ms", 0.0)),
            )
        return None

    # ---- async API (the LocalMapper per-keyframe pipeline) ---------------
    def submit(self, prob_arrays: dict, lm_cfg, chi2_line: float, chi2_point: float) -> int:
        """Non-blocking: enqueue a solve; returns the request id to poll."""
        self.wait_ready()
        self._next_id += 1
        req_id = self._next_id
        self._send_async(("solve", req_id, (prob_arrays, lm_cfg, chi2_line, chi2_point)))
        return req_id

    def poll(self, req_id: int, timeout: float = 0.0):
        """Result of solve ``req_id``, or None if still running.
        Returns (res dict, None) | (None, err) | None."""
        out = self._recv_matching(req_id, timeout)
        if out is None:
            return None
        kind, payload = out
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
        """Blocking solve RPC. Returns (result dict, None) or (None, error).

        Safe to call while an async submit() is in flight: the worker
        processes requests in order, and any earlier response that arrives
        first is stashed for its own poll() — never consumed here (the
        round-2 advisor's cross-talk finding)."""
        self.wait_ready(timeout)
        self._next_id += 1
        req_id = self._next_id
        # writer thread even for the blocking path: the worker may be mid-
        # solve with its outbound pipe full; a blocking send here while the
        # worker blocks sending to us would deadlock. The recv loop below
        # drains our end, letting both sides make progress.
        self._send_async(("solve", req_id, (prob_arrays, lm_cfg, chi2_line, chi2_point)))
        out = self._recv_matching(req_id, timeout)
        if out is None:
            return None, "BA worker solve timed out"
        kind, payload = out
        if kind == "ok":
            return payload, None
        return None, str(payload)

    def close(self):
        try:
            if self._proc.is_alive():
                with self._send_lock:
                    self._conn.send(None)
                self._proc.join(timeout=10.0)
                if self._proc.is_alive():
                    self._proc.terminate()
            self._conn.close()
        except Exception:
            pass
        try:
            if self._warm_proc is not None and self._warm_proc.is_alive():
                self._warm_proc.terminate()
            if self._warm_conn is not None:
                self._warm_conn.close()
        except Exception:
            pass

    def __del__(self):  # best effort
        self.close()
