"""Device PVQ band search (models/pvqsearch.py).

Validates the batched per-band gain/theta/codeword RDO against the
host search (pvq_codec.pvq_theta) and the end-to-end opt-in encoder
mode (use_device_pvq): streams must decode bit-exactly in the
reference C decoder and stay RD-neutral vs the host search.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import content
from daala_tpu.codec import headers as H
from daala_tpu.codec import pvq_codec as PC
from daala_tpu.codec.decoder import Decoder
from daala_tpu.codec.encoder import Encoder, OD_PVQ_LAMBDA
from daala_tpu.entropy.adapt import AdaptCtx
from daala_tpu.models import pvqsearch as PS
from daala_tpu.ops import pvq as P
from daala_tpu.utils.metrics import psnr


def _search(X, R, qm, q0, beta, lam, cw, is_keyframe=False):
    """Drive band_search through its device-gather interface with a
    trivial identity layout: row i's band lives at dflat[i*n : i*n+n]."""
    m, n = X.shape
    base = (np.arange(m, dtype=np.int32) * n)
    tab = np.arange(n, dtype=np.int32)[None, :]
    qmt = np.asarray(qm, np.int32)[None, :]
    with jax.enable_x64(True):
        ints, y, sd = PS.band_search(
            jnp.asarray(np.asarray(X, np.int32).ravel()),
            jnp.asarray(np.asarray(R, np.int32).ravel()),
            jnp.asarray(base), jnp.zeros((m,), jnp.int32),
            jnp.asarray(tab), jnp.asarray(qmt),
            jnp.full((m,), q0, jnp.int32),
            jnp.full((m,), beta == P.BETA_1_5, jnp.bool_),
            jnp.float32(lam), n, n + 64,
            k1_cdf=jnp.asarray(cw.pvq_k1_cdf, jnp.int32),
            split_cdf=jnp.asarray(cw.pvq_split_cdf, jnp.int32),
            is_keyframe=is_keyframe)
    ints = np.asarray(ints)
    return [ints[:, 0], ints[:, 1], ints[:, 2], ints[:, 3], ints[:, 4],
            np.asarray(y).astype(np.int32), np.asarray(sd),
            ints[:, 5]]


@pytest.mark.parametrize("n,beta", [(15, P.BETA_1), (8, P.BETA_1_5)])
def test_band_search_matches_host(n, beta):
    """Device decisions replayed through pvq_theta(forced=...) must be
    dominated by exact matches with the host search; every decision
    must replay without error (the residue are near-tie flips from the
    f32 RDO + frame-start rate tables, which the e2e test bounds)."""
    adapt = AdaptCtx()
    adapt.reset(False)
    cw = adapt.pvq.pvq_codeword_ctx
    lam = OD_PVQ_LAMBDA
    rng = np.random.default_rng(7 + n)
    m = 48
    agree = 0
    total = 0
    for mag, q0 in ((120, 110), (700, 60)):
        X = rng.normal(0, mag, (m, n)).astype(np.int32)
        R = (X * rng.uniform(-0.2, 1.2, (m, 1))
             + rng.normal(0, mag / 3, (m, n))).astype(np.int32)
        R[:4] = 0
        X[4:6] = 0
        qm = np.full(n, 16, np.int32)
        qm_inv = [4096] * n
        noref, qg, itheta, ts, k, y, sdf, valid = _search(
            X, R, qm, q0, beta, lam, cw)
        for i in range(m):
            if not valid[i]:
                continue
            out_h = [0] * n
            y_h = [0] * n
            h = PC.pvq_theta(out_h, X[i].tolist(), R[i].tolist(), n, q0,
                             y_h, beta, 1, False, 0, adapt, qm.tolist(),
                             qm_inv, lam, 0)
            e = (int(noref[i]), int(qg[i]), int(itheta[i]), int(ts[i]),
                 int(k[i]), y[i], float(sdf[i]))
            out_d = [0] * n
            y_d = [0] * n
            d = PC.pvq_theta(out_d, X[i].tolist(), R[i].tolist(), n, q0,
                             y_d, beta, 1, False, 0, adapt, qm.tolist(),
                             qm_inv, lam, 0, forced=e)
            # The replay must be internally consistent: coded symbols
            # fully determine the reconstruction.
            assert d[1] == int(itheta[i]) and d[3] == int(k[i])
            total += 1
            agree += (h[0] == d[0] and h[1] == d[1] and h[3] == d[3]
                      and list(out_h) == list(out_d))
    assert total > 80
    assert agree / total > 0.85, (agree, total)


def test_band_search_keyframe_matches_host():
    """Keyframe-luma mode (is_keyframe=True, zero reference): device
    decisions must be dominated by exact matches with the host
    pvq_theta keyframe search and every decision must replay."""
    adapt = AdaptCtx()
    adapt.reset(True)
    cw = adapt.pvq.pvq_codeword_ctx
    lam = OD_PVQ_LAMBDA
    rng = np.random.default_rng(31)
    n, beta = 15, P.BETA_1_5
    m = 48
    agree = 0
    total = 0
    for mag, q0 in ((120, 110), (700, 60), (40, 200)):
        X = rng.normal(0, mag, (m, n)).astype(np.int32)
        X[4:6] = 0
        R = np.zeros((m, n), np.int32)
        qm = np.full(n, 16, np.int32)
        qm_inv = [4096] * n
        noref, qg, itheta, ts, k, y, sdf, valid = _search(
            X, R, qm, q0, beta, lam, cw, is_keyframe=True)
        for i in range(m):
            if not valid[i]:
                continue
            out_h = [0] * n
            y_h = [0] * n
            h = PC.pvq_theta(out_h, X[i].tolist(), R[i].tolist(), n,
                             q0, y_h, beta, 1, True, 0, adapt,
                             qm.tolist(), qm_inv, lam, 0)
            # Keyframe decisions must stay on the noref path (the skip
            # symbol must be SKIP_ZERO, never SKIP_COPY).
            assert noref[i] == 1
            e = (int(noref[i]), int(qg[i]), int(itheta[i]), int(ts[i]),
                 int(k[i]), y[i], float(sdf[i]))
            out_d = [0] * n
            y_d = [0] * n
            d = PC.pvq_theta(out_d, X[i].tolist(), R[i].tolist(), n,
                             q0, y_d, beta, 1, True, 0, adapt,
                             qm.tolist(), qm_inv, lam, 0, forced=e)
            assert d[3] == int(k[i])
            total += 1
            agree += (h[0] == d[0] and h[3] == d[3]
                      and list(out_h) == list(out_d))
    assert total > 120
    assert agree / total > 0.85, (agree, total)


@pytest.mark.parametrize("w,h,q", [
    (96, 64, 8), (96, 64, 18), (96, 64, 40),
    (160, 112, 18), (160, 112, 40),
])
def test_device_pvq_end_to_end(w, h, q):
    """Opt-in device PVQ search — keyframe luma + all inter planes —
    across quantizers and resolutions: streams decode bit-exactly in
    the reference C decoder and stay RD-neutral (bytes within 5%,
    PSNR within 0.3 dB of the host search)."""
    sys.path.insert(0, "tests")
    import codec_oracle as co

    nfr = 4
    frames = content.make_clip(w, h, nfr, seed=5)

    def run(device_pvq):
        info = H.Info(pic_width=w, pic_height=h)
        e = Encoder(info, quant=q, complexity=7)
        e.keyframe_rate = 256
        if device_pvq:
            e.use_device_analysis = True
            e.use_device_pvq = True
        pkts = list(e.flush_headers())
        nb = 0
        for fr in frames:
            for p in e.encode_frame(fr):
                nb += len(p)
                pkts.append(p)
        for p in e.flush():
            nb += len(p)
            pkts.append(p)
        d = Decoder(info)
        outs = []
        for p in pkts[3:]:
            outs.extend(d.decode_packet(p))
        ps = float(np.mean([psnr(a[0].astype(np.float64),
                                 b[0].astype(np.float64))
                            for a, b in zip(frames, outs)]))
        rd = co.RefDecoder(pkts[:3])
        routs = [fr for p in pkts[3:] for fr in rd.decode_packet(p)]
        assert len(routs) == nfr
        for i, (a, b) in enumerate(zip(outs, routs)):
            for pl in range(3):
                assert np.array_equal(np.asarray(a[pl]),
                                      np.asarray(b[pl])), (i, pl)
        return nb, ps

    nb_h, ps_h = run(False)
    nb_d, ps_d = run(True)
    assert abs(nb_d - nb_h) / nb_h < 0.05, (nb_h, nb_d)
    assert abs(ps_d - ps_h) < 0.3, (ps_h, ps_d)


def test_device_pvq_native_matches_python():
    """The native frame engine consuming the flattened device decision
    table (frame_enc.inc ec_pvq_theta_forced) must produce the same
    bytes as the Python replay path (pvq_codec._pvq_theta_forced)."""
    w, h, nfr, q = 96, 64, 5, 18
    frames = content.make_clip(w, h, nfr, seed=5)

    def run(native_frame):
        info = H.Info(pic_width=w, pic_height=h)
        e = Encoder(info, quant=q, complexity=7)
        # Mid-stream keyframe: covers the keyframe-luma forced replay
        # (zero-reference device search + live-reference host fallback)
        # in both engines.
        e.keyframe_rate = 4
        e.use_device_analysis = True
        e.use_device_pvq = True
        e.use_native_frame = native_frame
        pkts = [p for fr in frames for p in e.encode_frame(fr)]
        pkts += e.flush()
        return pkts

    a = run(True)
    b = run(False)
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert bytes(x) == bytes(y), ("device-PVQ replay divergence", i)
