"""High-depth input (10/12-bit, bitdepth_mode 2/3 + FPR) conformance
(reference: include/daala/codec.h:196-221, src/state.c:365-373,
src/state.c:93-214 od_img_plane_copy, src/state.c:1216-1256
od_ref_buf_to_coeff)."""

import numpy as np
import pytest

try:
    import codec_oracle as co
    co.get_lib()
    HAVE_ORACLE = True
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

from daala_tpu.codec import headers
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder

pytestmark = pytest.mark.skipif(not HAVE_ORACLE,
                                reason="reference oracle unavailable")

W, H, N = 96, 64, 4


def _clip(depth, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    mx = (1 << depth) - 1
    mid = 1 << (depth - 1)
    frames = []
    for t in range(N):
        y = (mid + 0.45 * mid * np.sin((xx + 3 * t) / 9.0)
             + 0.3 * mid * np.cos((yy + 2 * t) / 7.0)
             + rng.normal(0, mx / 64, (H, W))).clip(0, mx) \
            .astype(np.uint16)
        cb = (mid + 0.15 * mid * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, mx).astype(np.uint16)
        cr = (mid + 0.15 * mid * np.cos((yy[::2, ::2] + t) / 11.0)) \
            .clip(0, mx).astype(np.uint16)
        frames.append([y, cb, cr])
    return frames


def _same(a, b):
    return all(np.array_equal(np.asarray(x[pl]), np.asarray(y[pl]))
               for x, y in zip(a, b) for pl in range(3))


@pytest.mark.parametrize("depth", [10, 12])
def test_decode_reference_highdepth_streams(depth):
    """Our decoder matches the reference decoder bit-exactly on
    reference-encoded 10/12-bit streams, including the uint16 output."""
    frames = _clip(depth)
    renc = co.RefEncoder(W, H, quant=15, complexity=7, keyframe_rate=8,
                         fpr=1, bitdepth=depth)
    hdrs = renc.flush_headers()
    pkts = [p for i, fr in enumerate(frames)
            for p, _ in renc.encode_frame(fr, last=(i == N - 1))]
    rdec = co.RefDecoder(hdrs)
    ref_out = [f for p in pkts for f in rdec.decode_packet(p)]
    info, _ = headers.decode_header(hdrs[0], None)
    assert info.bitdepth_mode == 1 + (depth - 8) // 2
    dec = Decoder(info)
    our_out = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(our_out) == N
    assert our_out[0][0].dtype == np.uint16
    assert _same(ref_out, our_out)


@pytest.mark.parametrize("depth", [10, 12])
def test_encode_highdepth_reference_decodes(depth):
    """Our 10/12-bit streams decode bit-exactly in the reference C
    decoder (and in our own)."""
    frames = _clip(depth)
    info = headers.Info(pic_width=W, pic_height=H,
                        bitdepth_mode=1 + (depth - 8) // 2,
                        full_precision_references=1, keyframe_rate=8)
    enc = Encoder(info, quant=15, complexity=7)
    enc.keyframe_rate = 8
    hdrs = list(enc.flush_headers())
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    rdec = co.RefDecoder(hdrs)
    ref_out = [f for p in pkts for f in rdec.decode_packet(p)]
    dec = Decoder(info)
    our_out = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(ref_out) == N
    assert _same(ref_out, our_out)
    # Sanity: reconstruction is actually near the high-depth source.
    mx = (1 << depth) - 1
    mse = np.mean((frames[0][0].astype(float)
                   - our_out[0][0].astype(float)) ** 2)
    assert 10 * np.log10(mx * mx / mse) > 30


def test_highdepth_lossless_roundtrip():
    """10-bit lossless: byte-identical round-trip, and the reference
    decoder reproduces the same output."""
    frames = _clip(10)
    info = headers.Info(pic_width=W, pic_height=H, bitdepth_mode=2,
                        full_precision_references=1, keyframe_rate=8)
    enc = Encoder(info, quant=0, complexity=7)
    enc.keyframe_rate = 8
    hdrs = list(enc.flush_headers())
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    dec = Decoder(info)
    our_out = [f for p in pkts for f in dec.decode_packet(p)]
    assert _same(frames, our_out)
    rdec = co.RefDecoder(hdrs)
    ref_out = [f for p in pkts for f in rdec.decode_packet(p)]
    assert _same(frames, ref_out)


def test_highdepth_requires_fpr():
    from daala_tpu.codec.state import CodecState
    with pytest.raises(ValueError, match="full_precision_references"):
        CodecState(headers.Info(pic_width=W, pic_height=H,
                                bitdepth_mode=2))


def test_cli_roundtrip_p10(tmp_path):
    """tools/encode.py / decode.py carry C420p10 y4m end-to-end."""
    import os
    import subprocess
    import sys as _sys
    src = tmp_path / "v10.y4m"
    out = tmp_path / "v10.ogv"
    rec = tmp_path / "rec10.y4m"
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:48, 0:64]
    with open(src, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420p10\n")
        for t in range(3):
            y = (512 + 200 * np.sin((xx + 3 * t) / 9.0)
                 + rng.normal(0, 12, (48, 64))).clip(0, 1023) \
                .astype("<u2")
            cb = (512 + 80 * np.sin((xx[::2, ::2] + t) / 13.0)) \
                .clip(0, 1023).astype("<u2")
            cr = (512 + 80 * np.cos((yy[::2, ::2] + t) / 11.0)) \
                .clip(0, 1023).astype("<u2")
            f.write(b"FRAME\n" + y.tobytes() + cb.tobytes() + cr.tobytes())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([_sys.executable,
                        os.path.join(root, "tools", "encode.py"),
                        str(src), str(out), "-v", "12", "--check"],
                       capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([_sys.executable,
                        os.path.join(root, "tools", "decode.py"),
                        str(out), str(rec)],
                       capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr
    from daala_tpu.utils.y4m import Y4MReader
    rd = Y4MReader(str(rec))
    frames = list(rd)
    assert rd.depth == 10
    assert len(frames) == 3
    assert frames[0][0].dtype == np.uint16
