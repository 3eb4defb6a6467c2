"""The device decode back-end (daala_tpu/models/synthesis.py: jitted
masked IDCT + split/frame postfilters) must reconstruct frames
bit-identically to the host decoder loop, for intra and inter frames,
4:2:0 and 4:4:4, and odd picture sizes."""

import numpy as np
import pytest

from daala_tpu.codec import headers
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder

from test_frame_native import _clip, _encode

CASES = [
    # (name, kwargs, W, H, nframes, kfr, dec420)
    ("intra", dict(quant=18, complexity=7), 128, 128, 1, 1, True),
    ("inter", dict(quant=14, complexity=7), 128, 96, 5, 8, True),
    ("i444", dict(quant=18, complexity=7), 64, 64, 2, 8, False),
    ("odd_size", dict(quant=20, complexity=7), 75, 49, 3, 8, True),
    ("lossless_haar", dict(quant=0), 64, 64, 2, 8, True),  # host fallback
]


def _decode_all(pkts, w, h, dec420, device):
    info = headers.Info(pic_width=w, pic_height=h)
    if not dec420:
        info = headers.Info(pic_width=w, pic_height=h,
                            plane_dec=((0, 0), (0, 0), (0, 0), (0, 0)))
    dec = Decoder(info)
    dec.use_device_synthesis = device
    outs = []
    for p in pkts:
        outs.extend(dec.decode_packet(p))
    return outs


@pytest.mark.parametrize("name,kw,w,h,n,kfr,dec420",
                         CASES, ids=[c[0] for c in CASES])
def test_device_synthesis_matches_host(name, kw, w, h, n, kfr, dec420):
    frames = _clip(w, h, n, dec420=dec420)
    pkts = _encode(True, frames, w, h, kfr=kfr, dec420=dec420, **kw)
    host = _decode_all(pkts, w, h, dec420, device=False)
    dev = _decode_all(pkts, w, h, dec420, device=True)
    assert len(host) == len(dev) == n
    for i, (a, b) in enumerate(zip(host, dev)):
        for pli in range(3):
            assert np.array_equal(a[pli], b[pli]), (name, i, pli)
