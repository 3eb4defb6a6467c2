"""Compiled-mode Pallas validation on real TPU hardware.

The in-process suite runs interpret mode on the CPU test mesh, which
cannot see Mosaic lowering constraints (sublane/lane tiling); this test
spawns a subprocess WITHOUT the conftest CPU forcing so the TPU plugin
(if present) becomes the default backend, compiles the DCT and lapped
filter kernels for every production size, and pins them bit-exact
against the host implementations.  Skips cleanly when no TPU is
attached (the bench machine runs it for real).
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_DRIVER = r"""
import sys
import numpy as np
import jax
try:
    backend = jax.default_backend()
except RuntimeError:
    # The TPU plugin is installed but the device is unreachable (e.g.
    # the tunnel to the chip is down) — same situation as no TPU.
    print("NO_TPU")
    sys.exit(0)
if backend not in ("tpu", "axon"):
    print("NO_TPU")
    sys.exit(0)
import jax.numpy as jnp
from daala_tpu.models.analysis import blocks_of, unblocks
from daala_tpu.ops import dct
from daala_tpu.ops import filter as filt
from daala_tpu.ops.pallas.dct_kernels import dct_frame_pallas
from daala_tpu.ops.pallas.lap_kernels import lap_frame_pallas

rng = np.random.default_rng(7)
for n in (4, 8, 16, 32, 64):
    H, W = 128, 256
    x = rng.integers(-(1 << 14), 1 << 14, (H, W)).astype(np.int32)
    want = np.asarray(unblocks(
        jnp.asarray(dct.fdct2d(np.asarray(blocks_of(jnp.asarray(x), n)))),
        H, W))
    got = np.asarray(dct_frame_pallas(jnp.asarray(x), n=n, forward=True,
                                      interpret=False))
    assert np.array_equal(got, want), "fdct %d mismatch on hardware" % n
    inv = np.asarray(dct_frame_pallas(jnp.asarray(got), n=n,
                                      forward=False, interpret=False))
    assert np.array_equal(inv, x), "idct %d mismatch on hardware" % n

for xdec in (0, 1):
    sb = 64 >> xdec
    h, w = 192, 256
    x = rng.integers(-(1 << 14), 1 << 14, (h, w)).astype(np.int32)
    ref = x.copy()
    filt.apply_prefilter_frame_sbs(ref, w // sb, h // sb, xdec, xdec)
    got = np.asarray(lap_frame_pallas(jnp.asarray(x), sb_x=sb, sb_y=sb,
                                      forward=True, interpret=False))
    assert np.array_equal(got, ref), "lap pre %d mismatch" % sb
    back = np.asarray(lap_frame_pallas(jnp.asarray(got), sb_x=sb,
                                       sb_y=sb, forward=False,
                                       interpret=False))
    assert np.array_equal(back, x), "lap post %d mismatch" % sb

print("HW_OK")
"""


@pytest.mark.slow
def test_pallas_kernels_on_hardware():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, "-c", _DRIVER], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, (
        "hardware pallas run failed:\n%s\n%s"
        % (res.stdout[-2000:], res.stderr[-8000:]))
    if "NO_TPU" in res.stdout:
        pytest.skip("no TPU attached")
    assert "HW_OK" in res.stdout
