"""Decoder conformance: bit-exact decode of reference-encoder streams.

This is the codec equivalent of the reference's encoder-check invariant
(reference: src/encode.c:3231-3272) turned around: our decoder must
reconstruct exactly what the reference decoder does, for every toolset the
reference encoder exercises.
"""

import numpy as np
import pytest

try:
    import codec_oracle as co
    co.get_lib()
    HAVE = True
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="codec oracle unavailable")


def synth_planes(w, h, seed, dec444):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    Y = np.clip(128 + 40 * np.sin(xx / 7.0) + 30 * np.cos(yy / 5.0)
                + rng.normal(size=(h, w)) * 10, 0, 255).astype(np.uint8)
    cw, ch = (w, h) if dec444 else (w // 2, h // 2)
    Cb = np.clip(120 + 20 * np.sin(np.mgrid[0:ch, 0:cw][1] / 9.0),
                 0, 255).astype(np.uint8)
    Cr = np.clip(130 + rng.normal(size=(ch, cw)) * 5,
                 0, 255).astype(np.uint8)
    return [Y, Cb, Cr]


CASES = [
    # (w, h, quant, dec444, dering)
    (64, 64, 20, False, None),
    (128, 64, 8, False, None),
    (64, 64, 20, False, 1),
    (176, 144, 25, False, 1),
    (100, 76, 30, False, 1),
    (64, 64, 20, True, 1),
    (64, 64, 120, False, 1),
]


@pytest.mark.parametrize("w,h,quant,dec444,dering", CASES)
def test_keyframe_decode_matches_reference(w, h, quant, dec444, dering):
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.decoder import Decoder
    dec = ((0, 0), (0, 0), (0, 0)) if dec444 else ((0, 0), (1, 1), (1, 1))
    enc = co.RefEncoder(w, h, quant=quant, keyframe_rate=1, dec=dec,
                        dering=dering)
    hb = enc.flush_headers()
    planes = synth_planes(w, h, quant + w, dec444)
    pkts = enc.encode_frame(planes, last=True)
    ref_frames = co.RefDecoder(hb).decode_packet(pkts[0][0])
    info, _ = H.decode_header(hb[0], None)
    d = Decoder(info)
    frames = d.decode_packet(pkts[0][0])
    for p in range(3):
        np.testing.assert_array_equal(frames[0][p], ref_frames[0][p],
                                      err_msg="plane %d" % p)
