"""Conformance on video-like content at scale: pans, object motion,
scene cuts, texture, hard edges; up to 1080p (the reference CI gates on
real clips, reference: ci/fetch-videos.sh — no network here, so the
content classes are synthesized; see tests/content.py)."""

import numpy as np
import pytest

try:
    import codec_oracle as co
    co.get_lib()
    HAVE_ORACLE = True
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

import content
from daala_tpu.codec import headers
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder

pytestmark = pytest.mark.skipif(not HAVE_ORACLE,
                                reason="reference oracle unavailable")


def _conform(frames, w, h, quant, kfr=16, b_frames=0, complexity=7):
    """Encode with ours, decode with the reference decoder AND ours;
    assert bit-exact output and the embedded encoder check."""
    info = headers.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=quant, complexity=complexity)
    enc.keyframe_rate = kfr
    enc.b_frames = b_frames
    enc.enable_encoder_check = True
    pkts = []
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    rdec = co.RefDecoder(enc.flush_headers())
    dec = Decoder(info)
    ref_out = [f for p in pkts for f in rdec.decode_packet(p)]
    our_out = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(ref_out) == len(our_out) == len(frames)
    for a, b in zip(ref_out, our_out):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))
    return sum(len(p) for p in pkts)


def test_video_like_360p():
    frames = content.make_clip(640, 360, 10, seed=1)
    _conform(frames, 640, 360, quant=22, kfr=4, b_frames=0)


def test_video_like_bframes():
    frames = content.make_clip(320, 192, 9, seed=2)
    _conform(frames, 320, 192, quant=18, kfr=8, b_frames=2)


def test_video_like_1080p_intra_plus_inter():
    frames = content.make_clip(1920, 1080, 2, seed=3)
    _conform(frames, 1920, 1080, quant=30, kfr=256)


def test_lossless_video_like():
    """check_lossless.sh equivalent: decode(encode(x)) must equal x
    byte-for-byte at -v 0 (reference: tools/check_lossless.sh:41-56)."""
    frames = content.make_clip(128, 96, 6, seed=4)
    info = headers.Info(pic_width=128, pic_height=96)
    enc = Encoder(info, quant=0)
    enc.keyframe_rate = 4
    pkts = []
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    dec = Decoder(info)
    out = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))
    rdec = co.RefDecoder(enc.flush_headers())
    rout = [f for p in pkts for f in rdec.decode_packet(p)]
    for a, b in zip(frames, rout):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]), np.asarray(b[pli]))


def test_mono_conformance():
    """Single-plane (luma-only) streams decode bit-exactly in the
    reference decoder (reference: examples/encoder_example.c 'mono')."""
    w, h, n = 96, 64, 4
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [[(128 + 60 * np.sin((xx + 3 * t) / 9.0)
                + rng.normal(0, 5, (h, w))).clip(0, 255)
               .astype(np.uint8)] for t in range(n)]
    info = headers.Info(pic_width=w, pic_height=h, nplanes=1,
                        plane_dec=((0, 0),), keyframe_rate=8)
    enc = Encoder(info, quant=15, complexity=7)
    enc.keyframe_rate = 8
    hdrs = list(enc.flush_headers())
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    dec = Decoder(info)
    ours = [fr for p in pkts for fr in dec.decode_packet(p)]
    rdec = co.RefDecoder(hdrs)
    refs = [fr for p in pkts for fr in rdec.decode_packet(p)]
    assert len(ours) == len(refs) == n
    for a, b in zip(ours, refs):
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))


@pytest.mark.parametrize("bf", [0, 2])
def test_long_gop_golden_rotation(bf):
    """24 frames with keyframes every 8: exercises multiple keyframe
    restarts, golden-frame rotation (every 10th coded I/P frame), and
    reference-ring reuse across GOPs; bit-exact in the reference
    decoder (reference: src/encode.c:2999-3002 SELF slot selection,
    :3145-3178 reference updates)."""
    w, h, n = 96, 64, 24
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 2.5 * t) / 9.0)
             + 40 * np.cos((yy + 1.5 * t) / 7.0)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 20 * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cb.copy()])
    info = headers.Info(pic_width=w, pic_height=h, keyframe_rate=8)
    enc = Encoder(info, quant=18, complexity=7)
    enc.keyframe_rate = 8
    enc.b_frames = bf
    hdrs = list(enc.flush_headers())
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    rdec = co.RefDecoder(hdrs)
    dec = Decoder(info)
    rr = [f for p in pkts for f in rdec.decode_packet(p)]
    oo = [f for p in pkts for f in dec.decode_packet(p)]
    assert len(rr) == len(oo) == n
    for a, b in zip(rr, oo):
        for pl in range(3):
            assert np.array_equal(np.asarray(a[pl]), np.asarray(b[pl]))
