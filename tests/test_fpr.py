"""Full-precision references (FPR): 12-bit reference storage and 16-bit
motion compensation (reference: include/daala/codec.h:222-229,
src/mc.c:219, src/state.c:1230-1330).

Decode conformance runs against the reference C build with FPR enabled;
our encoder's FPR streams must decode bit-exactly in the reference
decoder."""

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


def _clip(w, h, n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 3 * t) / 7.0)
             + 40 * np.cos((yy + 2 * t) / 11.0)
             + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 30 * np.sin((xx[::2, ::2] + t) / 9.0)).clip(0, 255) \
            .astype(np.uint8)
        cr = (128 + 30 * np.cos((yy[::2, ::2] + t) / 13.0)).clip(0, 255) \
            .astype(np.uint8)
        frames.append([y, cb, cr])
    return frames


def test_fpr_decode_reference_streams():
    """Our decoder must decode reference FPR streams bit-exactly."""
    w, h, n = 128, 96, 6
    frames = _clip(w, h, n)
    renc = co.RefEncoder(w, h, quant=15, complexity=7, keyframe_rate=64,
                         fpr=1)
    hdrs = renc.flush_headers()
    pkts = []
    for i, fr in enumerate(frames):
        for p, g in renc.encode_frame(fr, last=(i == n - 1)):
            pkts.append(p)
    rdec = co.RefDecoder(hdrs)
    info, _ = headers.decode_header(hdrs[0], None)
    assert info.full_precision_references == 1
    dec = Decoder(info)
    ref_out = [f for p in pkts for f in rdec.decode_packet(p)]
    our_out = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(ref_out) == len(our_out) == n
    for a, b in zip(ref_out, our_out):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))


def test_fpr_encode_conformance():
    """Our FPR streams must decode bit-exactly in the reference decoder
    (and in our own)."""
    w, h, n = 128, 96, 6
    frames = _clip(w, h, n)
    info = headers.Info(pic_width=w, pic_height=h,
                        full_precision_references=1)
    enc = Encoder(info, quant=15, complexity=7)
    enc.keyframe_rate = 64
    enc.enable_encoder_check = True
    pkts = []
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    rdec = co.RefDecoder(enc.flush_headers())
    dec = Decoder(info)
    ref_out = [f for p in pkts for f in rdec.decode_packet(p)]
    our_out = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(ref_out) == len(our_out) == n
    for a, b in zip(ref_out, our_out):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))


def test_pvq_synthesis_val16_wrap_case():
    """Regression: the reference's od_val16 vectors wrap to int16; a
    Householder l2r_norm that rounds to exactly 32768 must follow the
    wrapped path (found via FPR conformance; reference: src/pvq.c
    od_apply_householder + od_rcp)."""
    import pvq_oracle as PO
    from daala_tpu.ops import pvq as P
    n = 128
    # Construct r16 with l2r == 65535 so l2r_norm rounds to 32768.
    r16 = np.zeros(n, np.int64)
    vals = [10, 21, 3, -12, -30, 30, 26, 205, 126, 30, 14, 7, 65, 62,
            -27, 45, 33, 9, 18, -11, 5, 88]
    r16[:len(vals)] = vals
    l2r = int(np.sum(r16 * r16))
    r16[len(vals)] = int(np.sqrt(max(0, 65535 - l2r)))
    while int(np.sum(r16 * r16)) < 65535:
        r16[len(vals) + 1] += 1
    while int(np.sum(r16 * r16)) > 65535:
        r16[len(vals) + 1] -= 1
        r16[len(vals) + 2] += 1
        if int(np.sum(r16 * r16)) > 65535:
            r16[len(vals) + 2] -= 1
            break
    if int(np.sum(r16 * r16)) != 65535:
        pytest.skip("could not construct exact l2r")
    y = np.zeros(n, np.int64)
    g, theta, m, s = 373, 0, 21, 1
    qm_inv = np.full(n, 6553, np.int64)
    ours = np.asarray(P.synthesis_partial(y, r16, n, False, g, theta, m,
                                          s, qm_inv), np.int64)
    oracle = np.asarray(PO.synthesis_partial(
        y[:n - 1].astype(np.int32), r16.astype(np.int16), n, 0, g, theta,
        m, s, qm_inv.astype(np.int16)), np.int64)
    assert np.array_equal(ours, oracle)
