"""Device color-sweep MV refinement (mvest.refine_sweep +
models/mesweep.py): valid streams, quality parity with the greedy
refinement, and cross-backend determinism of the batched leaf SADs."""

import numpy as np
import pytest

from daala_tpu import native
from daala_tpu.codec import headers
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native engine unavailable")


def _clip(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) + 30 * np.cos(yy / 7.0)) \
        .astype(float)
    tex = rng.normal(0, 20, (32, 32))
    frames = []
    for t in range(n):
        y = np.roll(base, (t, 2 * t), (0, 1)).copy()
        oy, ox = 20 + 5 * t, 30 + 7 * t
        y[oy:oy + 32, ox:ox + 32] += tex
        y = (y + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 20 * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cb.copy()])
    return frames


def _encode(frames, w, h, mode, q=18):
    info = headers.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=q, complexity=7)
    enc.keyframe_rate = 8
    enc.mv_refine_mode = mode
    enc.enable_encoder_check = True
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += enc.flush()
    return info, [bytes(p) for p in pkts]


def test_sweep_streams_valid_and_quality_close():
    w, h = 192, 128
    frames = _clip(w, h, 6)
    res = {}
    for mode in ("greedy", "sweep"):
        info, pkts = _encode(frames, w, h, mode)
        dec = Decoder(info)
        outs = [f for p in pkts for f in dec.decode_packet(p)]
        assert len(outs) == len(frames)
        mse = np.mean([(o[0].astype(float) - f[0].astype(float)) ** 2
                       for o, f in zip(outs, frames)])
        res[mode] = (sum(len(p) for p in pkts),
                     10 * np.log10(255 ** 2 / mse))
    gb, gp = res["greedy"]
    sb, sp = res["sweep"]
    # Schedule change, not an algorithm downgrade: within 3% bytes and
    # 0.25 dB of the greedy refinement on this clip.
    assert sb < gb * 1.03
    assert sp > gp - 0.25


def test_sweep_reference_decoder_parity():
    try:
        import codec_oracle as co
        co.get_lib()
    except Exception:  # pragma: no cover
        pytest.skip("reference oracle unavailable")
    w, h = 192, 128
    frames = _clip(w, h, 4, seed=9)
    info, pkts = _encode(frames, w, h, "sweep")
    from daala_tpu.codec import headers as H
    hdrs = None
    enc_hdrs = []
    info2 = headers.Info(pic_width=w, pic_height=h)
    enc = Encoder(info2, quant=18)
    enc_hdrs = enc.flush_headers()
    rdec = co.RefDecoder(enc_hdrs)
    ours = Decoder(info)
    for p in pkts:
        rf = rdec.decode_packet(p)
        of = ours.decode_packet(p)
        assert len(rf) == len(of)
        for a, b in zip(rf, of):
            for pli in range(3):
                assert np.array_equal(np.asarray(a[pli]),
                                      np.asarray(b[pli]))
