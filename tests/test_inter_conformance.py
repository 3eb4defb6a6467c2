"""Inter-frame decoder conformance vs the reference decoder."""

import numpy as np
import pytest

try:
    import codec_oracle as co
    co.get_lib()
    HAVE = True
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="codec oracle unavailable")


def run_case(nframes, w, h, quant, b_frames, seed, kfrate=100):
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(seed)
    enc = co.RefEncoder(w, h, quant=quant, keyframe_rate=kfrate,
                        b_frames=b_frames)
    hb = enc.flush_headers()
    yy, xx = np.mgrid[0:h, 0:w]
    tex = np.clip(128 + 50 * np.sin(xx / 5.3) * np.cos(yy / 4.1)
                  + rng.normal(size=(h, w)) * 12, 0, 255).astype(np.uint8)
    pkts = []
    for t in range(nframes):
        Y = np.roll(np.roll(tex, int(1.3 * t), 0), int(2.7 * t), 1)
        Cb = np.clip(110 + 30 * np.sin((xx[::2, ::2] + 3 * t) / 7.0),
                     0, 255).astype(np.uint8)
        Cr = np.full((h // 2, w // 2), 140, np.uint8)
        pkts += enc.encode_frame([Y, Cb, Cr], last=(t == nframes - 1))
    pkts += enc.finish()
    rd = co.RefDecoder(hb)
    ref_out = []
    for p, _ in pkts:
        ref_out += rd.decode_packet(p)
    info, _ = H.decode_header(hb[0], None)
    d = Decoder(info)
    our_out = []
    for p, _ in pkts:
        our_out += d.decode_packet(p)
    assert len(ref_out) == len(our_out)
    for t in range(len(ref_out)):
        for pli in range(3):
            np.testing.assert_array_equal(
                our_out[t][pli], ref_out[t][pli],
                err_msg="frame %d plane %d" % (t, pli))


CASES = [
    (6, 128, 64, 25, 0, 1, 100),   # P-frames
    (12, 64, 64, 25, 0, 2, 100),   # P incl. golden-frame interval
    (6, 64, 64, 30, 2, 3, 100),    # B-frames
    (5, 176, 144, 18, 1, 4, 100),  # QCIF, B=1
    (8, 64, 64, 40, 4, 5, 4),      # max B depth + mid-stream keyframes
]


@pytest.mark.parametrize("nframes,w,h,quant,b,seed,kfrate", CASES)
def test_inter_decode_matches_reference(nframes, w, h, quant, b, seed,
                                        kfrate):
    run_case(nframes, w, h, quant, b, seed, kfrate)
