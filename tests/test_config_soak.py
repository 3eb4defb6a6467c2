"""Randomized cross-configuration conformance soak: random sizes
(including odd), chroma formats, quantizers (incl. lossless), B-frames,
keyframe rates, complexities, QMs, masking/dering toggles, FPR and
high-depth combinations — every stream must decode bit-exactly in the
reference C decoder.  DAALA_TPU_SOAK_TRIALS raises the trial count
beyond the CI default."""

import os

import numpy as np
import pytest

try:
    import codec_oracle as co
    co.get_lib()
    HAVE_ORACLE = True
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder

pytestmark = pytest.mark.skipif(not HAVE_ORACLE,
                                reason="reference oracle unavailable")

TRIALS = int(os.environ.get("DAALA_TPU_SOAK_TRIALS", "6"))


def _random_config(rng):
    w = int(rng.integers(3, 23)) * 8 + int(rng.integers(0, 7))
    h = int(rng.integers(3, 17)) * 8 + int(rng.integers(0, 7))
    cfg = dict(
        w=w, h=h,
        n=int(rng.integers(2, 7)),
        quant=int(rng.choice([0, 5, 12, 25, 60, 140])),
        bf=int(rng.integers(0, 4)),
        kfr=int(rng.choice([1, 4, 8, 64])),
        cx=int(rng.integers(0, 10)),
        qm=int(rng.integers(0, 2)),
        am=bool(rng.integers(0, 2)),
        der=bool(rng.integers(0, 2)),
        c444=bool(rng.integers(0, 4) == 0),
        fpr=bool(rng.integers(0, 3) == 0),
    )
    cfg["depth"] = int(rng.choice([8, 8, 8, 10, 12])) if cfg["fpr"] else 8
    if cfg["quant"] == 0:
        cfg["bf"] = 0  # lossless B-frames are coded as P
    return cfg


def _clip(rng, cfg):
    w, h, n, depth = cfg["w"], cfg["h"], cfg["n"], cfg["depth"]
    mx = (1 << depth) - 1
    mid = 1 << (depth - 1)
    dt = np.uint16 if depth > 8 else np.uint8
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (mid + 0.4 * mid * np.sin((xx + 3 * t) / 9.0)
             + 0.3 * mid * np.cos((yy + 2 * t) / 7.0)
             + rng.normal(0, mx / 50, (h, w))).clip(0, mx).astype(dt)
        cw = w if cfg["c444"] else (w + 1) // 2
        ch = h if cfg["c444"] else (h + 1) // 2
        cb = np.broadcast_to(
            (mid + 0.15 * mid * np.sin((np.arange(cw) + t) / 13.0))
            .clip(0, mx).astype(dt), (ch, cw)).copy()
        cr = np.broadcast_to(
            (mid + 0.15 * mid * np.cos((np.arange(ch)[:, None] + t)
                                       / 11.0)).clip(0, mx).astype(dt),
            (ch, cw)).copy()
        frames.append([y, cb, cr])
    return frames


@pytest.mark.parametrize("trial", range(TRIALS))
def test_random_config_reference_conformance(trial):
    rng = np.random.default_rng(1000 + trial)
    cfg = _random_config(rng)
    frames = _clip(rng, cfg)
    dec = (((0, 0),) * 3 if cfg["c444"]
           else ((0, 0), (1, 1), (1, 1))) + ((0, 0),)
    info = H.Info(pic_width=cfg["w"], pic_height=cfg["h"], plane_dec=dec,
                  keyframe_rate=cfg["kfr"],
                  bitdepth_mode=1 + (cfg["depth"] - 8) // 2,
                  full_precision_references=int(cfg["fpr"]
                                                or cfg["depth"] > 8))
    enc = Encoder(info, quant=cfg["quant"], complexity=cfg["cx"],
                  qm=cfg["qm"], use_activity_masking=cfg["am"],
                  use_dering=cfg["der"])
    enc.keyframe_rate = cfg["kfr"]
    enc.b_frames = cfg["bf"]
    enc.enable_encoder_check = True
    hdrs = list(enc.flush_headers())
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    dec_o = Decoder(info)
    ours = [f for p in pkts for f in dec_o.decode_packet(p)]
    rdec = co.RefDecoder(hdrs)
    refs = [f for p in pkts for f in rdec.decode_packet(p)]
    assert len(ours) == len(refs) == cfg["n"], cfg
    for a, b in zip(ours, refs):
        for pl in range(3):
            assert np.array_equal(np.asarray(a[pl]),
                                  np.asarray(b[pl])), cfg
