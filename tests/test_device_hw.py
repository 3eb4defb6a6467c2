"""End-to-end device-tier validation on real TPU hardware.

The in-process device suites run on the conftest-forced virtual CPU
mesh; this test spawns a subprocess WITHOUT that forcing so the TPU
plugin (if present) is the default backend, and validates on the real
chip:

  1. the byte-identical conformance tier (``use_device_analysis``):
     keyframe + inter packets at complexity 7 equal the host path's
     byte for byte;
  2. the lean production tier (``use_device_pvq``: device-resident
     transforms feeding the ME SAD fields + whole-frame PVQ band RDO,
     compact decision tables down): its stream must satisfy the
     encoder self-check in OUR decoder and decode bit-exactly in the
     reference C decoder (``/root/reference`` oracle) when that
     oracle is available.

Skips cleanly when no TPU is attached (the bench machine runs it for
real).  Complements tests/test_pallas_hw.py (kernel-level) with the
codec-level device story.
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
    print("NO_TPU")
    sys.exit(0)
if backend not in ("tpu", "axon"):
    print("NO_TPU")
    sys.exit(0)

from daala_tpu.codec import headers
from daala_tpu.codec.encoder import Encoder
from daala_tpu.codec.decoder import Decoder

W, H, N = 192, 128, 3
rng = np.random.default_rng(5)
yy, xx = np.mgrid[0:H, 0:W]
frames = []
for t in range(N):
    y = (128 + 55 * np.sin((xx + 3 * t) / 9.0)
         + 35 * np.cos((yy + 2 * t) / 7.0)
         + rng.normal(0, 6, (H, W))).clip(0, 255).astype(np.uint8)
    cb = (128 + 20 * np.sin((xx[::2, ::2] + t) / 13.0)) \
        .clip(0, 255).astype(np.uint8)
    cr = (128 + 20 * np.cos((yy[::2, ::2] + t) / 11.0)) \
        .clip(0, 255).astype(np.uint8)
    frames.append([y, cb, cr])


def encode(device_analysis=False, device_pvq=False):
    info = headers.Info(pic_width=W, pic_height=H)
    enc = Encoder(info, quant=15, complexity=7)
    enc.keyframe_rate = 8
    if device_analysis:
        enc.use_device_analysis = True
    if device_pvq:
        enc.use_device_pvq = True
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += enc.flush()
    return enc, [bytes(p) for p in pkts]

# 1. Conformance tier: byte-identical to the host path on hardware.
_, host_pkts = encode()
_, dev_pkts = encode(device_analysis=True)
assert dev_pkts == host_pkts, (
    "device-analysis packets differ from host on hardware: %s vs %s"
    % ([len(p) for p in dev_pkts], [len(p) for p in host_pkts]))
print("ANALYSIS_OK")

# 2. Lean production tier: self-check + reference-decoder conformance.
enc, lean_pkts = encode(device_pvq=True)
info = headers.Info(pic_width=W, pic_height=H)
dec = Decoder(info)
out = [f for p in lean_pkts for f in dec.decode_packet(p)]
assert len(out) == N, len(out)
print("LEAN_DECODES")

sys.path.insert(0, "@TESTS_DIR@")
try:
    import codec_oracle as co
    co.get_lib()
except Exception as e:
    print("NO_ORACLE:", e)
    sys.exit(0)
ref = co.RefDecoder(enc.flush_headers())
ref_out = [f for p in lean_pkts for f in ref.decode_packet(p)]
assert len(ref_out) == N, len(ref_out)
for fi in range(N):
    for pli in range(3):
        assert np.array_equal(out[fi][pli], ref_out[fi][pli]), (
            "lean-tier frame %d plane %d: ours vs reference C decoder"
            % (fi, pli))
print("LEAN_REF_OK")
"""


@pytest.mark.slow
def test_device_tiers_on_hardware():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-c", _DRIVER.replace("@TESTS_DIR@", HERE)],
        env=env,
        capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, (
        "hardware device-tier run failed:\n%s\n%s"
        % (res.stdout[-2000:], res.stderr[-8000:]))
    if "NO_TPU" in res.stdout:
        pytest.skip("no TPU attached")
    assert "ANALYSIS_OK" in res.stdout
    assert "LEAN_DECODES" in res.stdout
