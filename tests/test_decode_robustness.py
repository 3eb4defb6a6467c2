"""Decoder robustness: corrupted, truncated, and garbage packets must
never crash or spin (the reference decodes garbage without validation;
we additionally bound the two loops that could spin forever on
exhausted streams)."""

import time

import numpy as np

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder


def test_corrupt_packets_do_not_crash_or_spin():
    rng = np.random.default_rng(0)
    w = h = 64
    info = H.Info(pic_width=w, pic_height=h, nplanes=3,
                  plane_dec=((0, 0), (1, 1), (1, 1), (0, 0)),
                  keyframe_rate=64)
    f0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    enc = Encoder(info, quant=20)
    good = enc.encode_frame([f0, c, c])[0]
    p2 = enc.encode_frame([np.roll(f0, 1, axis=1), c, c])[0]
    t0 = time.time()
    for trial in range(90):
        dec = Decoder(info)
        base = good if trial % 2 else p2
        if trial % 2:
            try:
                dec.decode_packet(good)
            except Exception:
                pass
        pkt = bytearray(base)
        mode = trial % 3
        if mode == 0:
            for _ in range(rng.integers(1, 6)):
                pkt[rng.integers(0, len(pkt))] ^= 1 << rng.integers(0, 8)
        elif mode == 1:
            pkt = pkt[:rng.integers(1, len(pkt))]
        else:
            pkt = bytearray(rng.integers(
                0, 256, rng.integers(4, 200)).astype(np.uint8).tobytes())
            pkt[0] &= 0x7F
        # Garbage decode may produce garbage frames; it must return.
        try:
            dec.decode_packet(bytes(pkt))
        except Exception:
            pass  # clean errors are acceptable; crashes/hangs are not
    assert time.time() - t0 < 60
