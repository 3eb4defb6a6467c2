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


def test_corrupt_packet_reference_hang_class_is_bounded():
    """A corruption class exists where the REFERENCE decoder spins for
    minutes (observed >8 min of CPU on a 65-byte corrupted 4:4:4
    packet: its unary/Laplace tail loops have no bound once the raw-bit
    window is exhausted).  Our decoder's corrupt-stream guards
    (bounded unary continuation, Laplace spin caps) must keep decode
    time bounded on the same packet."""
    import random
    import time
    rng = np.random.default_rng(2)
    w, h, n = 96, 64, 5
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 0.4 * 128 * np.sin((xx + 3 * t) / 9.0)
             + rng.normal(0, 255 / 40, (h, w))).clip(0, 255) \
            .astype(np.uint8)
        cb = (128 + 0.2 * 128 * np.sin((np.arange(w)[None, :] + t) / 13.0)
              + 0 * np.arange(h)[:, None]).clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cb.copy()])
    info = H.Info(pic_width=w, pic_height=h,
                  plane_dec=((0, 0),) * 4, keyframe_rate=4)
    enc = Encoder(info, quant=18)
    enc.keyframe_rate = 4
    pkts = [p for fr in frames for p in enc.encode_frame(fr)]
    pkts += list(enc.flush())
    # The seed-13 trial-17 corruption from the fuzz campaign that hangs
    # the reference C decoder.
    random.seed(13)
    target = None
    for trial in range(20):
        ci = random.randrange(1, len(pkts))
        g = bytearray(pkts[ci])
        for _ in range(random.randrange(1, 8)):
            g[random.randrange(len(g))] = random.randrange(256)
        if trial == 17:
            target = (ci, bytes(g))
    ci, g = target
    seq = pkts[:ci] + [g] + pkts[ci + 1:]
    dec = Decoder(info)
    t0 = time.time()
    for p in seq:
        dec.decode_packet(p)
    assert time.time() - t0 < 30, "bounded-decode guard regressed"
