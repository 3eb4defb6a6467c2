"""Device full-pel SAD fields (models/mefield.py) must match the host
window SADs exactly, and the native ME consuming them must make
bit-identical decisions."""

import numpy as np
import pytest

from daala_tpu import native
from daala_tpu.codec import headers
from daala_tpu.codec import mc as MC
from daala_tpu.models import mefield as MF

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native engine unavailable")


def _win_sad_ref(cur, refp, pad, vis, y0, x0, dy, dx):
    """Direct host window SAD (me_enc.inc win_sad semantics)."""
    vh, vw = vis
    ya, xa = max(y0 - 32, 0), max(x0 - 32, 0)
    yb, xb = min(y0 + 32, vh), min(x0 + 32, vw)
    a = cur[ya:yb, xa:xb].astype(np.int64)
    b = refp[pad + ya + dy:pad + yb + dy,
             pad + xa + dx:pad + xb + dx].astype(np.int64)
    return int(np.abs(a - b).sum())


def test_fullpel_fields_match_direct():
    rng = np.random.default_rng(3)
    w, h = 192, 128
    vis = (115, 177)  # odd visible dims exercise partial cells
    pad = MC.OD_BUFFER_PADDING
    cur = rng.integers(0, 256, (h, w), dtype=np.uint8)
    refp = rng.integers(0, 256, (h + 2 * pad, w + 2 * pad),
                        dtype=np.uint8)
    r = 16
    nvm, nhm = h // 8, w // 8
    fields = MF.fullpel_sad_fields(cur, [refp], pad, vis, nvm, nhm, r=r)
    t = fields[0]
    nvb, nhb = nvm // 8 + 1, nhm // 8 + 1
    assert t.shape == ((2 * r + 1) ** 2, nvb, nhb)
    for (vyi, vxi) in [(0, 0), (1, 2), (nvb - 1, nhb - 1), (1, 0)]:
        y0, x0 = vyi * 64, vxi * 64
        for (dy, dx) in [(-r, -r), (0, 0), (r, r), (-3, 7), (11, -16)]:
            want = _win_sad_ref(cur, refp, pad, vis, y0, x0, dy, dx)
            got = int(t[(dy + r) * (2 * r + 1) + dx + r, vyi, vxi])
            assert got == want, (vyi, vxi, dy, dx)


def test_device_me_decisions_identical():
    """Full encode differential: device SAD fields on vs off must give
    byte-identical packets (the native search consumes them as exact
    lookups)."""
    from daala_tpu.codec.encoder import Encoder
    w, h = 192, 128
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(4):
        y = (128 + 60 * np.sin((xx + 4 * t) / 9.0)
             + 30 * np.cos((yy - 3 * t) / 7.0)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 20 * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = cb.copy()
        frames.append([y, cb, cr])
    pkts = {}
    for dev in (False, True):
        info = headers.Info(pic_width=w, pic_height=h)
        enc = Encoder(info, quant=18, complexity=7)
        enc.keyframe_rate = 8
        enc.use_device_analysis = dev
        out = [p for fr in frames for p in enc.encode_frame(fr)]
        out += enc.flush()
        pkts[dev] = [bytes(p) for p in out]
    assert pkts[True] == pkts[False]
