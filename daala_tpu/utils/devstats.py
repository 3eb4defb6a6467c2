"""Device-path observability: dispatch counts, host<->device bytes,
fetch-blocked wall time and XLA compile totals.

The reference ships nothing like this (its backends are in-process
SIMD); for a TPU backend the equivalent of `perf` is knowing whether a
frame is compile-bound, transfer-bound or compute-bound.  Every device
front-end (models/keyframe.py, models/pvqsearch.py, models/mefield.py,
models/mesweep.py, models/restore.py, models/synthesis.py) reports its
traffic here; bench.py snapshots the counters into the probe JSON so
the recorded benchmark carries its own diagnosis.

Counters are process-global and cheap (no-ops beyond dict arithmetic);
`reset()` + `snapshot()` bracket a measured region.
"""

from __future__ import annotations

import time

import numpy as np

_ZERO = dict(dispatches=0, h2d_bytes=0, d2h_bytes=0,
             fetch_wall_s=0.0, compiles=0, compile_s=0.0)
STATS = dict(_ZERO)

# Optional per-call-site attribution (site -> [dispatches, h2d, d2h,
# fetch_wall_s]), enabled with DAALA_DEVSTATS_SITES=1 — answers "which
# upload/fetch is the 20 MB" without a profiler.
import os as _os
SITES: dict = {}
_TRACK_SITES = _os.environ.get("DAALA_DEVSTATS_SITES", "0") == "1"


def _site_add(**kw):
    if not _TRACK_SITES:
        return
    import sys
    f = sys._getframe(2)
    site = "%s:%d" % (_os.path.basename(f.f_code.co_filename),
                      f.f_lineno)
    s = SITES.setdefault(site, dict(dispatches=0, h2d=0, d2h=0,
                                    fetch_s=0.0))
    for k, v in kw.items():
        s[k] += v

_listener_installed = False


def _compile_listener(event, duration, **kw):
    # Only actual XLA backend compilation (one event per compiled
    # program); the broader /jax/core/compile/* family also fires for
    # every trace and MLIR lowering, which would overcount by ~1000x.
    if event.endswith("backend_compile_duration"):
        STATS["compiles"] += 1
        STATS["compile_s"] += float(duration)


def install():
    """Install the XLA compile-time listener (idempotent)."""
    global _listener_installed
    if _listener_installed:
        return
    try:
        from jax import monitoring
        monitoring.register_event_duration_secs_listener(
            _compile_listener)
        _listener_installed = True
    except Exception:
        pass


def reset():
    install()
    STATS.update(_ZERO)


def snapshot():
    s = dict(STATS)
    for k in ("fetch_wall_s", "compile_s"):
        s[k] = round(s[k], 3)
    return s


def _nbytes(x):
    try:
        return int(x.size) * int(x.dtype.itemsize)
    except Exception:
        return 0


def dispatch(*inputs):
    """Record one device dispatch and the host->device bytes of its
    numpy inputs (jax arrays already on device count zero)."""
    STATS["dispatches"] += 1
    nb = 0
    for x in inputs:
        if isinstance(x, np.ndarray):
            nb += _nbytes(x)
    STATS["h2d_bytes"] += nb
    _site_add(dispatches=1, h2d=nb)


def fetch(x, dtype=None):
    """np.asarray(x) with device->host byte and wall-time accounting."""
    t0 = time.perf_counter()
    a = np.asarray(x) if dtype is None else np.asarray(x, dtype)
    dt = time.perf_counter() - t0
    STATS["fetch_wall_s"] += dt
    STATS["d2h_bytes"] += _nbytes(a)
    _site_add(d2h=_nbytes(a), fetch_s=dt)
    return a


def prefetch(*arrays):
    """Start device->host copies of several jax arrays so subsequent
    fetch() calls overlap their transfers instead of serializing one
    blocking round trip per array."""
    for x in arrays:
        try:
            x.copy_to_host_async()
        except Exception:
            pass
