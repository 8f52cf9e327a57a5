"""tpuslam — TPU-native point+line visual SLAM.

A ground-up JAX/XLA/Pallas rebuild of a C++ line-SLAM system
(BTREE-C802/3DLine-SLAM capability class; see SURVEY.md):

- front-end: image pyramid, LSD-style line detection, LBD descriptors,
  descriptor matching — jitted XLA programs / Pallas kernels (SURVEY §2 L1-L2)
- back-end: batched Levenberg-Marquardt with explicit Schur elimination of
  landmarks over SE(3) poses + Pluecker/orthonormal 3D lines, replacing
  g2o/Ceres (SURVEY §2 L4, §5)
- host: sequential tracking control flow, map bookkeeping (SURVEY §2 L5-L6)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU matmuls default to bf16 multiplicands; the LM normal equations,
# Jacobian products, and descriptor statistics need true f32 (verified: the
# bf16 default loses tracking on-chip while CPU runs are fine). The extra
# MXU passes are negligible at SLAM's matrix sizes.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA executable cache: the big fused-frame program costs tens of
# seconds to minutes of REMOTE compile per process on the axon tunnel
# (compile-service latency lottery, PERF_NOTES.md); a cache hit loads in
# seconds (measured 26.7 s -> 6.4 s full first-run, benchmarks/probe_cache.py)
# and never touches the compile service — which also removes the lottery's
# process-degradation risk. Respect an explicit user setting; opt out with
# TPUSLAM_COMPILE_CACHE="".
import os as _os


def host_cache_tag() -> str:
    """Short fingerprint of the host CPU, for machine-keyed cache dirs.

    The build box's CPU model/features CHANGE between sessions, and a
    persistent XLA:CPU cache written on one machine SEGFAULTS when read on
    another (reproduced twice: crash inside compilation_cache
    get_executable_and_time / backend_compile_and_load, preceded by
    cpu_aot_loader 'machine type ... doesn't match' warnings — the
    round-3/4 full-suite segfault). Keying every cache path by this tag
    makes a machine change start a fresh cache instead of reading
    incompatible AOT executables.

    Round-4 advisor finding: model-name+flags alone was insufficient —
    LLVM's subtarget tuning (e.g. +prefer-no-scatter/+prefer-no-gather)
    derives from the CPUID family/model/stepping heuristics, not just the
    feature flags, so two hosts with identical flag strings still produced
    'Machine type ... doesn't match' AOT loads. Include vendor/family/
    model/stepping (what LLVM's host detection actually keys on) plus the
    jax/jaxlib versions (serialization format) in the hash."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        prefixes = (
            "vendor_id", "cpu family", "model", "model name", "stepping", "flags",
        )
        lines = [l for l in txt.splitlines() if l.startswith(prefixes)]
        key = "|".join(sorted(set(lines)))
    except OSError:
        import platform

        key = platform.processor() + platform.machine()
    import jax as _j

    try:
        import jaxlib as _jl

        key += f"|jax={_j.__version__}|jaxlib={_jl.__version__}"
    except ImportError:
        key += f"|jax={_j.__version__}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


_cache = _os.environ.get("TPUSLAM_COMPILE_CACHE", "/tmp/tpuslam_cache")
if _cache and not (
    _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    or _jax.config.jax_compilation_cache_dir
):
    try:
        _jax.config.update(
            "jax_compilation_cache_dir", f"{_cache}_{host_cache_tag()}"
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass

from tpuslam.geometry.camera import Intrinsics  # noqa: E402


def __getattr__(name):
    """Lazy top-level exports (keep `import tpuslam` light)."""
    if name == "System":
        from tpuslam.system import System

        return System
    if name == "SlamMap":
        from tpuslam.slammap.map import SlamMap

        return SlamMap
    raise AttributeError(name)


__all__ = ["Intrinsics", "System", "SlamMap", "__version__"]
