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
