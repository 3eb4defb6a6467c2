"""Memory-safety hardening of the native engine: rebuild ec_core.cc with
AddressSanitizer + UndefinedBehaviorSanitizer and replay the fuzz corpus
plus an encode/decode round-trip through it (reference CI analogue:
ci/clang-asan.sh, ci/clang-ioc.sh).

The production C++ engine parses untrusted bitstreams; the garbage-parity
suite pins its *output* against the reference oracle but says nothing
about memory safety.  This test runs the same corpus classes under the
sanitizers in a subprocess (the sanitized .so needs the ASan runtime
preloaded into the interpreter).
"""

import ctypes.util
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = os.path.join(REPO, "daala_tpu", "native", "ec_core.cc")
LIB = "/tmp/daala_tpu_ec_core_asan.so"

_DRIVER = r"""
import os, random
import numpy as np
from daala_tpu.codec import headers
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder
import daala_tpu.native as NM
assert NM.available(), "sanitized native library failed to load"

w, h = 128, 96
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:h, 0:w]
y = (128 + 60 * np.sin(xx / 7.0)
     + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
cb = (128 + 30 * np.sin(xx[::2, ::2] / 9.0)).clip(0, 255).astype(np.uint8)
cr = cb.copy()
info = headers.Info(pic_width=w, pic_height=h)

# Encode path under the sanitizers: keyframe + inter + B-frames,
# exercising frame_enc.inc, me_enc.inc, bs_enc.inc.
enc = Encoder(info, quant=20)
enc.keyframe_rate = 64
enc.b_frames = 2
pkts = []
for t in range(4):
    pkts += enc.encode_frame([np.roll(y, t, 1), cb, cr])
pkts += enc.flush()
hdrs = enc.flush_headers()

# Clean decode (frame_dec.inc) of every packet.
dec = Decoder(info)
for p in pkts:
    dec.decode_packet(p)

# Garbage corpus: random byte corruptions of key + inter packets.
random.seed(42)
trials = int(os.environ.get("DAALA_TPU_FUZZ_TRIALS", "16"))
for trial in range(trials):
    for target in pkts[:2]:
        g = bytearray(target)
        for _ in range(random.randrange(1, 8)):
            g[random.randrange(len(g))] = random.randrange(256)
        d2 = Decoder(info)
        d2.decode_packet(pkts[0])
        d2.decode_packet(bytes(g))

# Truncations down to 1 byte.
for cut in (1, 3, len(pkts[1]) // 2, len(pkts[1]) - 1):
    d3 = Decoder(info)
    d3.decode_packet(pkts[0])
    d3.decode_packet(pkts[1][:cut])

print("SANITIZED_OK")
"""


def _find_asan_runtime():
    out = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True)
    path = out.stdout.strip()
    if path and os.path.sep in path and os.path.exists(path):
        return path
    return None


@pytest.mark.slow
def test_native_engine_asan_ubsan():
    runtime = _find_asan_runtime()
    if runtime is None:  # pragma: no cover
        pytest.skip("libasan runtime not found")
    newest = max(
        os.path.getmtime(os.path.join(REPO, "daala_tpu", "native", f))
        for f in os.listdir(os.path.join(REPO, "daala_tpu", "native"))
        if f.endswith((".cc", ".inc")))
    if not os.path.exists(LIB) or os.path.getmtime(LIB) < newest:
        subprocess.run(
            ["g++", "-O1", "-g", "-fwrapv", "-ffp-contract=off",
             "-fno-math-errno", "-std=c++17", "-shared", "-fPIC",
             "-fsanitize=address,undefined",
             "-fno-sanitize-recover=all",
             SRC, "-o", LIB],
            check=True, capture_output=True)
    env = dict(os.environ)
    env["LD_PRELOAD"] = runtime
    env["DAALA_TPU_NATIVE_LIB"] = LIB
    # Python itself leaks by design; only the engine's errors matter.
    env["ASAN_OPTIONS"] = ("detect_leaks=0:abort_on_error=1:"
                           "allocator_may_return_null=1")
    env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, "-c", _DRIVER], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, (
        "sanitized replay failed:\n--- stdout ---\n%s\n--- stderr ---\n%s"
        % (res.stdout[-4000:], res.stderr[-8000:]))
    assert "SANITIZED_OK" in res.stdout
