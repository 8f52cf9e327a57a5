"""Test configuration: force CPU backend with a virtual 8-device mesh.

SURVEY §6.2: tests run on CPU for determinism/speed; sharding tests use
xla_force_host_platform_device_count=8. Set TPUSLAM_TEST_TPU=1 to run the
suite against the real chip instead.
"""

import os

if not os.environ.get("TPUSLAM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # env ships JAX_PLATFORMS=axon; override
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest

if not os.environ.get("TPUSLAM_TEST_TPU"):
    # Some installed pytest plugins import jax before this conftest runs, so
    # the env var alone is not enough; update the config too (safe as long as
    # no computation has touched the backend yet).
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Single-core build machine: XLA CPU compiles of the big fused programs
    # dominate suite time. Persist them across test processes — keyed by a
    # host-CPU fingerprint: the box's CPU changes between sessions, and a
    # cache written on a different machine SEGFAULTS when read (the
    # round-3/4 full-suite crash inside compilation_cache._cache_read /
    # backend_compile_and_load; see tpuslam.host_cache_tag).
    from tpuslam import host_cache_tag

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_cache_tpuslam_{host_cache_tag()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _close_upload_threads():
    """Close any AsyncUploader worker threads the test left behind.

    Trackers constructed directly (no System.shutdown()) each spin up a
    daemon upload thread; by the end of a full suite run 8+ were alive and
    present in the round-3 segfault's faulthandler dump. Closing them per
    test keeps the process's thread count flat."""
    yield
    from tpuslam.frontend.pipeline import AsyncUploader

    AsyncUploader.close_all()
