"""Tool-level smoke tests: dump hooks and AWCY export."""

import json
import os
import subprocess
import sys

import numpy as np

from daala_tpu.codec import headers
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder
from daala_tpu.utils.y4m import Y4MReader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clip(w, h, n):
    rng = np.random.default_rng(4)
    frames = []
    for t in range(n):
        y = (128 + 50 * np.sin((np.arange(w)[None, :] + 3 * t) / 9.0)
             + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
        c = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append([y, c.copy(), c.copy()])
    return frames


def test_dump_hooks(tmp_path, monkeypatch):
    """OD_DUMP_IMAGES/OD_DUMP_RECONS analogue (utils/dump.py): per-tag
    y4m dumps; the encoder's recon must equal the decoder's output."""
    import daala_tpu.utils.dump as dump
    monkeypatch.setenv("DAALA_TPU_DUMP_IMAGES", str(tmp_path))
    monkeypatch.setenv("DAALA_TPU_DUMP_RECONS", str(tmp_path))
    dump._files.clear()
    frames = _clip(96, 64, 3)
    info = headers.Info(pic_width=96, pic_height=64)
    enc = Encoder(info, quant=20)
    enc.keyframe_rate = 4
    pkts = []
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    dec = Decoder(info)
    for p in pkts:
        dec.decode_packet(p)
    dump._files.clear()
    ins = [f for f in Y4MReader(str(tmp_path / "input.y4m"))]
    rec = [f for f in Y4MReader(str(tmp_path / "recon.y4m"))]
    out = [f for f in Y4MReader(str(tmp_path / "out.y4m"))]
    assert len(ins) == len(rec) == len(out) == 3
    for a, b in zip(ins, frames):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))
    for a, b in zip(rec, out):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))


def test_awcy_export(tmp_path):
    rd = tmp_path / "clip.rd.json"
    rows = [
        {"quant": 10, "bytes": 5000, "frames": 4, "bits_per_pixel": 0.2,
         "psnr": 42.1, "psnrhvs": 40.0, "ssim": 18.2, "msssim": None,
         "ciede2000": 39.5},
        {"quant": 30, "bytes": 1500, "frames": 4, "bits_per_pixel": 0.06,
         "psnr": 35.2, "psnrhvs": 33.1, "ssim": 14.0, "msssim": None,
         "ciede2000": 33.0},
    ]
    rd.write_text("\n".join(json.dumps(r) for r in rows))
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "awcy_export.py"),
                    str(rd), "-o", str(tmp_path / "awcy")],
                   check=True, capture_output=True)
    out = (tmp_path / "awcy" / "clip-daala.out").read_text().splitlines()
    assert len(out) == 2
    cols = out[0].split()
    assert cols[0] == "10" and cols[2] == "5000"
    assert abs(float(cols[3]) - 42.1) < 1e-9


def test_asymmetric_decimation_rejected():
    # The daala format supports only square chroma decimation; the
    # reference decoder asserts xdec == ydec (src/decode.c:617,734)
    # and release builds mis-decode 4:2:2.  We fail loudly instead.
    import pytest
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.state import CodecState
    with pytest.raises(ValueError, match="asymmetric decimation"):
        CodecState(H.Info(pic_width=64, pic_height=48,
                          plane_dec=((0, 0), (1, 0), (1, 0))))


def test_encode_cli_converts_422(tmp_path):
    # 4:2:2 y4m input is converted to 4:2:0 by the encode CLI (chroma
    # row-pair averaging) and produces a decodable 4:2:0 stream.
    import subprocess
    import sys as _sys
    import numpy as np
    src = tmp_path / "v422.y4m"
    out = tmp_path / "v422.ogv"
    rec = tmp_path / "rec.y4m"
    W, H, N = 64, 48, 3
    yy, xx = np.mgrid[0:H, 0:W]
    with open(src, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C422\n")
        for t in range(N):
            y = (128 + 60 * np.sin((xx + 3 * t) / 9.0)) \
                .clip(0, 255).astype(np.uint8)
            cb = (128 + 20 * np.sin((xx[:, ::2] + t) / 13.0)) \
                .clip(0, 255).astype(np.uint8)
            cr = (128 + 20 * np.cos((yy[:, ::2] + t) / 11.0)) \
                .clip(0, 255).astype(np.uint8)
            f.write(b"FRAME\n" + y.tobytes() + cb.tobytes() + cr.tobytes())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([_sys.executable,
                        os.path.join(root, "tools", "encode.py"),
                        str(src), str(out), "-v", "12", "--check"],
                       capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr
    assert "converting chroma to 4:2:0" in r.stderr
    r = subprocess.run([_sys.executable,
                        os.path.join(root, "tools", "decode.py"),
                        str(out), str(rec)],
                       capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr
    from daala_tpu.utils.y4m import Y4MReader
    frames = list(Y4MReader(str(rec)))
    assert len(frames) == N
    assert frames[0][1].shape == (H // 2, W // 2)
