"""Corrupted-stream decode parity: our decoder must produce exactly the
frames the reference C decoder produces on randomly corrupted packets
(the reference decodes garbage into garbage without failing; reference:
src/decode.c error handling + clamped symbol parsing)."""

import os
import random

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


def _mk_stream():
    w, h = 128, 96
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(xx / 7.0)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
    cb = (128 + 30 * np.sin(xx[::2, ::2] / 9.0)).clip(0, 255) \
        .astype(np.uint8)
    cr = cb.copy()
    info = headers.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=20)
    enc.keyframe_rate = 64
    p_key = enc.encode_frame([y, cb, cr])[0]
    p_inter = enc.encode_frame([np.roll(y, 2, 1), cb, cr])[0]
    return info, enc.flush_headers(), p_key, p_inter


def test_garbage_decode_parity():
    info, hdrs, p_key, p_inter = _mk_stream()
    random.seed(42)
    trials = int(os.environ.get("DAALA_TPU_FUZZ_TRIALS", "24"))
    for trial in range(trials):
        for target in (p_key, p_inter):
            g = bytearray(target)
            for _ in range(random.randrange(1, 8)):
                g[random.randrange(len(g))] = random.randrange(256)
            g = bytes(g)
            rdec = co.RefDecoder(hdrs)
            rdec.decode_packet(p_key)
            rf = rdec.decode_packet(g)
            dec = Decoder(info)
            dec.decode_packet(p_key)
            of = dec.decode_packet(g)
            assert len(rf) == len(of)
            for a, b in zip(rf, of):
                for p in range(3):
                    assert np.array_equal(np.asarray(a[p]),
                                          np.asarray(b[p]))


def test_truncated_decode_no_crash():
    info, hdrs, p_key, p_inter = _mk_stream()
    for cut in (1, 3, len(p_inter) // 2, len(p_inter) - 1):
        dec = Decoder(info)
        dec.decode_packet(p_key)
        out = dec.decode_packet(p_inter[:cut])
        assert isinstance(out, list)


def test_inter_first_dummy_reference():
    """Decoding that starts on an inter frame synthesizes a gray dummy
    reference and keeps going (reference: src/decode.c:193,1184-1191)."""
    info, hdrs, p_key, p_inter = _mk_stream()
    rdec = co.RefDecoder(hdrs)
    rf = rdec.decode_packet(p_inter)
    dec = Decoder(info)
    of = dec.decode_packet(p_inter)
    assert len(rf) == len(of)
    for a, b in zip(rf, of):
        for p in range(3):
            assert np.array_equal(np.asarray(a[p]), np.asarray(b[p]))


def test_accounting_locations():
    """Per-symbol accounting records carry (x, y, layer, level) locations
    (reference: src/accounting.h:34-46); block symbols must land on their
    block's 4x4-grid position."""
    info, hdrs, p_key, p_inter = _mk_stream()
    dec = Decoder(info)
    dec.accounting_enabled = True
    dec.decode_packet(p_key)
    recs = dec.accounting
    assert recs
    located = [r for r in recs if r[2] >= 0 and r[4] >= 0]
    assert len(located) > len(recs) // 2
    xs = {r[2] for r in located}
    ys = {r[3] for r in located}
    assert max(xs) >= 16 and max(ys) >= 16  # spans several blocks
    total_bytes = sum(r[1] for r in recs) / 64.0  # Q3 bits -> bytes
    assert abs(total_bytes - len(p_key)) < len(p_key) * 0.25


def test_garbage_decode_parity_highdepth():
    """Corrupted 10-bit FPR streams also decode bit-exactly like the
    reference (this path exercises the lossy-Haar-wavelet combination
    only garbage can signal, where the DC quantizer carries the
    per-plane PVQ QM factor; reference: src/decode.c:558-576)."""
    w, h = 128, 96
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (512 + 240 * np.sin(xx / 7.0)
         + rng.normal(0, 30, (h, w))).clip(0, 1023).astype(np.uint16)
    cb = (512 + 120 * np.sin(xx[::2, ::2] / 9.0)).clip(0, 1023) \
        .astype(np.uint16)
    cr = cb.copy()
    info = headers.Info(pic_width=w, pic_height=h, bitdepth_mode=2,
                        full_precision_references=1, keyframe_rate=64)
    enc = Encoder(info, quant=20)
    enc.keyframe_rate = 64
    hdrs = list(enc.flush_headers())
    p_key = enc.encode_frame([y, cb, cr])[0]
    p_inter = enc.encode_frame([np.roll(y, 2, 1), cb, cr])[0]
    random.seed(77)
    trials = int(os.environ.get("DAALA_TPU_FUZZ_TRIALS", "24"))
    for trial in range(trials):
        for target in (p_key, p_inter):
            g = bytearray(target)
            for _ in range(random.randrange(1, 10)):
                g[random.randrange(len(g))] = random.randrange(256)
            g = bytes(g)
            rdec = co.RefDecoder(hdrs)
            rdec.decode_packet(p_key)
            rf = rdec.decode_packet(g)
            dec = Decoder(info)
            dec.decode_packet(p_key)
            of = dec.decode_packet(g)
            assert len(rf) == len(of)
            for a, b in zip(rf, of):
                for p in range(3):
                    assert np.array_equal(np.asarray(a[p]),
                                          np.asarray(b[p]))


def test_corruption_state_propagation_parity():
    """A corrupted mid-stream packet poisons decoder state (references,
    reorder queue); every SUBSEQUENT valid packet must still decode
    bit-exactly like the reference, including its release-build
    behavior of overwriting an occupied reorder slot on garbage frame
    numbers (reference: src/state.c od_output_queue_add)."""
    w, h, n = 128, 96, 6
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 3 * t) / 9.0)
             + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 25 * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cb.copy()])
    info = headers.Info(pic_width=w, pic_height=h, keyframe_rate=64)
    enc = Encoder(info, quant=18)
    enc.keyframe_rate = 64
    hdrs = list(enc.flush_headers())
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    random.seed(11)
    trials = int(os.environ.get("DAALA_TPU_FUZZ_TRIALS", "24"))
    for trial in range(trials):
        ci = random.randrange(1, len(pkts))
        g = bytearray(pkts[ci])
        for _ in range(random.randrange(1, 8)):
            g[random.randrange(len(g))] = random.randrange(256)
        seq = pkts[:ci] + [bytes(g)] + pkts[ci + 1:]
        rdec = co.RefDecoder(hdrs)
        dec = Decoder(info)
        rr, oo = [], []
        for p in seq:
            rr += rdec.decode_packet(p)
            oo += dec.decode_packet(p)
        assert len(rr) == len(oo), (trial, ci)
        for a, b in zip(rr, oo):
            for pl in range(3):
                assert np.array_equal(np.asarray(a[pl]),
                                      np.asarray(b[pl])), (trial, ci)
