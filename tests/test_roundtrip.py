"""End-to-end round trip: our encoder <-> our decoder <-> reference decoder.

The central interop invariants:
  1. our packets decode identically in our decoder and the reference's;
  2. our encoder-side reconstruction matches both (encoder-check,
     reference: src/encode.c:3231-3272);
  3. reference packets decode identically in both decoders
     (covered by test_decoder_conformance.py).
"""

import numpy as np
import pytest

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder

try:
    import codec_oracle as co
    co.get_lib()
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False


def synth(w, h, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    Y = np.clip(128 + 40 * np.sin(xx / 7.0) + 30 * np.cos(yy / 5.0)
                + rng.normal(size=(h, w)) * 10, 0, 255).astype(np.uint8)
    Cb = np.clip(120 + 20 * np.sin(np.mgrid[0:(h + 1) // 2,
                                            0:(w + 1) // 2][1] / 9.0),
                 0, 255).astype(np.uint8)
    Cr = np.clip(130 + rng.normal(size=((h + 1) // 2, (w + 1) // 2)) * 5,
                 0, 255).astype(np.uint8)
    return [Y, Cb, Cr]


CASES = [
    # (w, h, quant, fixed_bsize)
    (64, 64, 20, 1),
    (64, 64, 20, 0),
    (64, 64, 45, 2),
    (128, 64, 12, 1),
    (96, 80, 30, 1),
]


@pytest.mark.parametrize("w,h,quant,bsz", CASES)
def test_encode_decode_roundtrip(w, h, quant, bsz):
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=1)
    enc = Encoder(info, quant=quant)
    enc.fixed_bsize = bsz
    planes = synth(w, h, quant * 7 + w)
    pkt = enc.encode_frame(planes)[0]
    dec = Decoder(info)
    frames = dec.decode_packet(pkt)
    for p in range(3):
        np.testing.assert_array_equal(frames[0][p], enc.recon[p],
                                      err_msg="own decoder plane %d" % p)
    if HAVE_ORACLE:
        ref = co.RefDecoder(enc.flush_headers())
        ref_frames = ref.decode_packet(pkt)
        for p in range(3):
            np.testing.assert_array_equal(
                ref_frames[0][p], enc.recon[p],
                err_msg="reference decoder plane %d" % p)


@pytest.mark.skipif(not HAVE_ORACLE, reason="codec oracle unavailable")
def test_lossless_byte_identical_to_reference():
    """Wavelet/lossless mode has no RDO decisions, so our encoder must
    produce byte-identical packets to the reference encoder."""
    rng = np.random.default_rng(5)
    w = h = 64
    Y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    Cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    Cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    renc = co.RefEncoder(w, h, quant=0, keyframe_rate=1)
    renc.flush_headers()
    ref_pkt = renc.encode_frame([Y, Cb, Cr], last=True)[0][0]
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=1)
    enc = Encoder(info, quant=0)
    pkt = enc.encode_frame([Y, Cb, Cr])[0]
    assert pkt == ref_pkt


def test_lossless_roundtrip_own():
    rng = np.random.default_rng(17)
    w, h = 96, 64
    Y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    Cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    Cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=1)
    enc = Encoder(info, quant=0)
    pkt = enc.encode_frame([Y, Cb, Cr])[0]
    dec = Decoder(info)
    frames = dec.decode_packet(pkt)
    for p, plane in enumerate([Y, Cb, Cr]):
        np.testing.assert_array_equal(frames[0][p], plane)


@pytest.mark.skipif(not HAVE_ORACLE, reason="codec oracle unavailable")
def test_inter_encode_roundtrip():
    """I+P sequence from our encoder: encoder-check against both our
    decoder and the reference decoder."""
    rng = np.random.default_rng(11)
    w = h = 64
    yy, xx = np.mgrid[0:h, 0:w]
    tex = np.clip(128 + 45 * np.sin(xx / 6.0) * np.cos(yy / 5.0)
                  + rng.normal(size=(h, w)) * 8, 0, 255).astype(np.uint8)
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=100)
    enc = Encoder(info, quant=22)
    dec = Decoder(info)
    ref_dec = co.RefDecoder(enc.flush_headers())
    for t in range(3):
        Y = np.roll(np.roll(tex, t, 0), 2 * t, 1)
        Cb = np.full((h // 2, w // 2), 115, np.uint8)
        Cr = np.full((h // 2, w // 2), 135, np.uint8)
        pkt = enc.encode_frame([Y, Cb, Cr])[0]
        ours = dec.decode_packet(pkt)[0]
        refs = ref_dec.decode_packet(pkt)[0]
        for p in range(3):
            np.testing.assert_array_equal(ours[p], enc.recon[p])
            np.testing.assert_array_equal(refs[p], enc.recon[p])


def test_bsize_rdo_roundtrip():
    """Block-size RDO (complexity >= 2): full trial-encode merge pass
    (reference: od_split_superblocks_rdo, src/encode.c:2942-2948); the
    resulting stream must decode identically everywhere and the map must
    actually contain merged (non-4x4) blocks."""
    w = h = 128
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=64)
    enc = Encoder(info, quant=18, complexity=7)
    enc.enable_encoder_check = True
    planes = synth(w, h, 3)
    pkt = enc.encode_frame(planes)[0]
    assert enc.state.bsize[:h // 8, :w // 8].max() > 0, \
        "RDO never merged any block"
    dec = Decoder(info)
    frames = dec.decode_packet(pkt)
    for p in range(3):
        np.testing.assert_array_equal(frames[0][p], enc.recon[p])
    if HAVE_ORACLE:
        ref = co.RefDecoder(enc.flush_headers())
        ref_frames = ref.decode_packet(pkt)
        for p in range(3):
            np.testing.assert_array_equal(ref_frames[0][p], enc.recon[p])
    # And one P frame through the same path.
    planes2 = [np.roll(planes[0], 3, axis=1), planes[1], planes[2]]
    pkt2 = enc.encode_frame(planes2)[0]
    frames2 = dec.decode_packet(pkt2)
    for p in range(3):
        np.testing.assert_array_equal(frames2[0][p], enc.recon[p])


def test_inter_64x64_dc_ex_persistence():
    """64x64 inter blocks with coded DC: the reference resets ex_dc only
    for block sizes 0..3 (od_adapt_ctx_reset loops `i < 4`, reference:
    src/state.c:566-571), so the 64x64 expectation persists across
    frames starting from 0.  Our encoder once reset it to 32768,
    producing streams the reference decoder parsed differently (wrong
    generic-model cdf selection for dc:mag).  Regression: encode
    forced-64x64 inter frames and require bit-exact agreement between
    our decoder and the reference's."""
    if not HAVE_ORACLE:
        pytest.skip("codec oracle unavailable")
    w, h = 100, 76
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:h, 0:w]
    f0 = np.clip(128 + 60 * np.sin(xx / 17.0) + 40 * np.cos(yy / 13.0)
                 + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)
    cb = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
    cr = np.full(((h + 1) // 2, (w + 1) // 2), 135, np.uint8)
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=256)
    enc = Encoder(info, quant=16)
    enc.fixed_bsize = 4
    pkts = [enc.encode_frame([np.roll(f0, 2 * i, axis=1), cb, cr])[0]
            for i in range(3)]
    ref = co.RefDecoder(enc.flush_headers())
    ours = Decoder(info)
    for p in pkts:
        rf = ref.decode_packet(p)
        of = ours.decode_packet(p)
        for fa, fb in zip(rf, of):
            for a, b in zip(fa, fb):
                np.testing.assert_array_equal(a, b)


def test_two_pass_rate_control():
    """Two-pass RC (a working implementation of the API the reference
    stubs, src/rate.c:1199-1220): pass 1 records per-frame metrics,
    pass 2 must land near the target and decode everywhere."""
    w = h = 64
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(128 + 50 * np.sin(xx / 7.0) + 40 * np.cos(yy / 5.0)
                   + rng.normal(size=(h, w)) * 8, 0, 255).astype(np.uint8)
    frames = [[np.roll(base, 2 * i, axis=1),
               np.full((32, 32), 120, np.uint8),
               np.full((32, 32), 130, np.uint8)] for i in range(8)]
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=64, timebase_numerator=30)
    enc1 = Encoder(info, quant=16)
    enc1.record_pass1 = True
    for f in frames:
        enc1.encode_frame(f)
    stats = enc1.rc.twopass_out()
    bitrate = 120000
    enc2 = Encoder(info, quant=16, bitrate=bitrate)
    enc2.rc.twopass_in(stats)
    enc2.enable_encoder_check = True
    pkts = []
    for f in frames:
        pkts.extend(enc2.encode_frame(f))
    total_bits = sum(len(p) * 8 for p in pkts)
    target_bits = bitrate * len(frames) // 30
    assert 0.7 * target_bits < total_bits < 1.35 * target_bits, \
        (total_bits, target_bits)
    dec = Decoder(info)
    n = 0
    for p in pkts:
        n += len(dec.decode_packet(p))
    assert n == len(frames)
    if HAVE_ORACLE:
        ref = co.RefDecoder(enc2.flush_headers())
        for p in pkts:
            ref.decode_packet(p)


def test_lossless_inter_frames():
    """Lossless P frames via the Haar wavelet inter path (reference:
    src/encode.c:3024-3027 forces the wavelet mode for OD_LOSSLESS):
    must reconstruct the input exactly in our decoder AND the
    reference's."""
    w, h = 96, 80
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    f0 = np.clip(128 + 50 * np.sin(xx / 9.0) + 30 * np.cos(yy / 7.0)
                 + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
    cb = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
    cr = np.full(((h + 1) // 2, (w + 1) // 2), 135, np.uint8)
    frames = [[np.roll(f0, i, axis=1), cb, cr] for i in range(4)]
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=64)
    enc = Encoder(info, quant=0)
    enc.enable_encoder_check = True
    pkts = [enc.encode_frame(f)[0] for f in frames]
    # inter frames must be much cheaper than the keyframe
    assert len(pkts[1]) < len(pkts[0]) // 4
    dec = Decoder(info)
    for p, f in zip(pkts, frames):
        r = dec.decode_packet(p)[0]
        for a, b in zip(r, f):
            np.testing.assert_array_equal(a, b)
    if HAVE_ORACLE:
        ref = co.RefDecoder(enc.flush_headers())
        for p, f in zip(pkts, frames):
            r = ref.decode_packet(p)[0]
            for a, b in zip(r, f):
                np.testing.assert_array_equal(a, b)
