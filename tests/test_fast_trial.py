"""Fast trial pass (speed=2): projection-only PVQ candidates +
closed-form rates in the block-size RDO trial encode.

This is the approximation family the reference already trusts for its
whole trial search below complexity 5 (src/encode.c:1359, speed=1),
taken one step further: only the nearest quantized gain/theta candidate
is evaluated.  The final pass always searches and codes exactly, so the
streams stay normative; only split decisions can move.

Covers: (1) the pure-Python pvq_theta fallback vs the native
ec_pvq_theta at every speed, (2) the end-to-end RD guard — fast-trial
streams decode bit-exactly in the reference C decoder and cost within a
few percent of the exact trial pass at several quantizers.
"""

import sys

import numpy as np
import pytest

from daala_tpu import native
from daala_tpu.codec import headers as H
from daala_tpu.codec import pvq_codec as PC
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder
from daala_tpu.entropy.adapt import AdaptCtx
from daala_tpu.ops import pvq as P
from daala_tpu.ops.pvq import OD_PVQ_LAMBDA

import content

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native engine unavailable")


@pytest.mark.parametrize("speed", [0, 1, 2])
def test_pvq_theta_python_matches_native(speed):
    """The pure-Python pvq_theta fallback and the native ec_pvq_theta
    must make identical decisions at every search speed (the fallback
    is the readable spec the native search is fuzzed against)."""
    adapt = AdaptCtx()
    adapt.reset(False)
    lam = OD_PVQ_LAMBDA
    rng = np.random.default_rng(31 + speed)
    n = 15
    beta = P.BETA_1
    nlib = PC._NLIB
    try:
        for trial in range(60):
            q0 = int(rng.integers(40, 160))
            mag = int(rng.integers(40, 900))
            x = rng.normal(0, mag, n).astype(np.int32)
            r = (x * rng.uniform(-0.3, 1.2)
                 + rng.normal(0, mag / 3, n)).astype(np.int32)
            if trial % 7 == 0:
                r[:] = 0
            if trial % 11 == 0:
                x[:] = 0
            qm = [16] * n
            qm_inv = [4096] * n
            is_kf = bool(trial % 2)
            args = (x.tolist(), r.tolist(), n, q0, beta, 1, is_kf, 0,
                    adapt, qm, qm_inv, lam, speed)
            out_n = [0] * n
            y_n = [0] * n
            PC._NLIB = nlib
            res_n = PC.pvq_theta(out_n, args[0], args[1], n, q0, y_n,
                                 beta, 1, is_kf, 0, adapt, qm, qm_inv,
                                 lam, speed)
            out_p = [0] * n
            y_p = [0] * n
            PC._NLIB = None
            res_p = PC.pvq_theta(out_p, args[0], args[1], n, q0, y_p,
                                 beta, 1, is_kf, 0, adapt, qm, qm_inv,
                                 lam, speed)
            assert res_n[:4] == res_p[:4], (trial, res_n, res_p)
            assert out_n == out_p, trial
            assert abs(res_n[4] - res_p[4]) < 1e-6 * (1 + abs(res_p[4]))
    finally:
        PC._NLIB = nlib


def _encode_clip(frames, w, h, quant, fast, boost=1.0):
    info = H.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=quant, complexity=7,
                  trial_rate_approx=fast, trial_prune_boost=boost)
    enc.keyframe_rate = 8
    # Pin the greedy ME tier: this suite isolates the fast-vs-exact
    # TRIAL pass; the selective-thorough mesh default adds unrelated
    # RD jitter on micro-clips this small.
    enc.mv_decimate = 0
    enc.mv_max_level = 3
    pkts = list(enc.flush_headers())
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    return pkts


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("quant,boost", [(10, 1.0), (25, 1.0),
                                         (55, 1.0), (25, 3.0),
                                         (55, 3.0)])
def test_fast_trial_rd_guard(quant, boost):
    """Fast-trial streams (including the boosted production preset,
    trial_prune_boost=3 with the 0.5 q3/px rate gate — BD-rate vs the
    plain fast trial is +0.0..+0.4% across the corpus classes,
    tools/sweep_trial.py) must decode bit-exactly in the reference C
    decoder and stay RD-neutral vs the exact trial pass (bytes within
    5%, PSNR within 0.3 dB) across the quantizer range."""
    sys.path.insert(0, "tests")
    import codec_oracle as co

    w, h, nfr = 96, 80, 4
    frames = content.make_clip(w, h, nfr, seed=9)
    stats = {}
    for fast in (False, True):
        pkts = _encode_clip(frames, w, h, quant, fast,
                            boost=boost if fast else 1.0)
        info = H.Info(pic_width=w, pic_height=h)
        dec = Decoder(info)
        outs = [f for p in pkts[3:] for f in dec.decode_packet(p)]
        assert len(outs) == nfr
        rd = co.RefDecoder(pkts[:3])
        routs = [f for p in pkts[3:] for f in rd.decode_packet(p)]
        for i, (a, b) in enumerate(zip(outs, routs)):
            for pl in range(3):
                assert np.array_equal(np.asarray(a[pl]),
                                      np.asarray(b[pl])), (fast, i, pl)
        nb = sum(len(p) for p in pkts[3:])
        ps = float(np.mean([_psnr(np.asarray(a[0]), np.asarray(b[0]))
                            for a, b in zip(frames, outs)]))
        stats[fast] = (nb, ps)
    nb_e, ps_e = stats[False]
    nb_f, ps_f = stats[True]
    assert abs(nb_f - nb_e) / nb_e < 0.05, stats
    assert abs(ps_f - ps_e) < 0.3, stats
