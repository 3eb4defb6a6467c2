"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run against
XLA's host-platform device partitioning.  These env vars must be set before
the first jax import anywhere in the test session.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force via config (must happen
# before the backend is first queried).
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# XLA compile time dominates the device-path tests on a single-core
# host (~25-40 s per band_search variant).  A persistent compilation
# cache, keyed by hostname so a cache from a different machine is never
# loaded, makes repeat runs cheap; cold runs are unaffected.
try:
    import platform
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "jax-" + platform.node())
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running hardening/benchmark tests")
