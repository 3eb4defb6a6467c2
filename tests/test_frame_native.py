"""Differential test: the native whole-frame coefficient encoder
(daala_tpu/native/frame_enc.inc) must be byte-identical to the Python
implementation in daala_tpu/codec/encoder.py across frame types, chroma
formats, block-size decision modes, and the lossless wavelet path."""

import numpy as np
import pytest

from daala_tpu import native
from daala_tpu.codec import headers
from daala_tpu.codec.encoder import Encoder

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native engine unavailable")


def _clip(w, h, n, seed=0, dec420=True):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 3 * t) / 7.0)
             + 40 * np.cos((yy + 2 * t) / 11.0)
             + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
        s = (slice(None, None, 2),) * 2 if dec420 else (slice(None),) * 2
        cb = (128 + 30 * np.sin((xx[s] + t) / 9.0)).clip(0, 255) \
            .astype(np.uint8)
        cr = (128 + 30 * np.cos((yy[s] + t) / 13.0)).clip(0, 255) \
            .astype(np.uint8)
        frames.append([y, cb, cr])
    return frames


def _encode(native_path, frames, w, h, kfr=8, dec420=True, **kw):
    info = headers.Info(pic_width=w, pic_height=h)
    if not dec420:
        info = headers.Info(pic_width=w, pic_height=h,
                            plane_dec=((0, 0), (0, 0), (0, 0), (0, 0)))
    enc = Encoder(info, **kw)
    enc.use_native_frame = native_path
    enc.keyframe_rate = kfr
    pkts = []
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    return pkts


CASES = [
    # (name, kwargs, W, H, nframes, kfr, dec420)
    ("intra_rdo", dict(quant=20, complexity=7), 128, 128, 1, 1, True),
    ("intra_openloop", dict(quant=12, complexity=1), 80, 64, 1, 1, True),
    ("inter", dict(quant=15, complexity=7), 128, 96, 4, 8, True),
    ("lossless", dict(quant=0), 64, 64, 2, 8, True),
    ("i444", dict(quant=18, complexity=7), 64, 64, 2, 8, False),
    ("flat_qm", dict(quant=16, complexity=7, qm=0), 64, 64, 1, 1, True),
    ("no_masking", dict(quant=16, complexity=7,
                        use_activity_masking=False), 64, 64, 1, 1, True),
    # Fast trial pass (speed=2 projection-only PVQ candidates +
    # closed-form rates): the Python and native engines must make the
    # same approximations and stay byte-identical.
    ("fast_trial", dict(quant=18, complexity=7, trial_rate_approx=True),
     128, 96, 3, 8, True),
    # Boosted subtree prune (production speed preset: prune envelopes
    # scaled by trial_prune_boost, rate-gated to mostly-skip nodes):
    # the Python and native gates must fire identically.  quant=25
    # puts the Q4 quantizer past the >=240 boost gate.
    ("fast_trial_boost", dict(quant=25, complexity=7,
                              trial_rate_approx=True,
                              trial_prune_boost=3.0,
                              trial_prune_rate_gate=0.5),
     128, 96, 3, 8, True),
]


@pytest.mark.parametrize("name,kw,w,h,n,kfr,dec420",
                         CASES, ids=[c[0] for c in CASES])
def test_native_matches_python(name, kw, w, h, n, kfr, dec420):
    frames = _clip(w, h, n, dec420=dec420)
    py = _encode(False, frames, w, h, kfr=kfr, dec420=dec420, **dict(kw))
    nat = _encode(True, frames, w, h, kfr=kfr, dec420=dec420, **dict(kw))
    assert len(py) == len(nat)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, "packet %d differs (%d vs %d bytes)" % (
            i, len(a), len(b))


def _decode(native_path, pkts, w, h, dec420=True):
    from daala_tpu.codec.decoder import Decoder
    info = headers.Info(pic_width=w, pic_height=h)
    if not dec420:
        info = headers.Info(pic_width=w, pic_height=h,
                            plane_dec=((0, 0), (0, 0), (0, 0), (0, 0)))
    dec = Decoder(info)
    dec.use_native_frame = native_path
    return [f for p in pkts for f in dec.decode_packet(p)]


@pytest.mark.parametrize("name,kw,w,h,n,kfr,dec420",
                         CASES, ids=[c[0] for c in CASES])
def test_native_decode_matches_python(name, kw, w, h, n, kfr, dec420):
    """The native whole-frame decoder (frame_dec.inc fd_decode_mvs /
    fc_decode_frame) must reconstruct byte-identically to the Python
    decoder on every frame type."""
    frames = _clip(w, h, n, dec420=dec420)
    pkts = _encode(True, frames, w, h, kfr=kfr, dec420=dec420, **dict(kw))
    py = _decode(False, pkts, w, h, dec420=dec420)
    nat = _decode(True, pkts, w, h, dec420=dec420)
    assert len(py) == len(nat) == n
    for i, (a, b) in enumerate(zip(py, nat)):
        for pli in range(3):
            assert np.array_equal(np.asarray(a[pli]),
                                  np.asarray(b[pli])), \
                "frame %d plane %d differs" % (i, pli)


def test_native_compute_dist_matches_python():
    """The SIMD distortion metric (fc_compute_dist) must be bit-identical
    to daala_tpu/codec/dist.py compute_dist: RDO tie-breaks depend on it."""
    import ctypes
    from daala_tpu.codec.dist import compute_dist

    lib = native.get_lib()
    lib.fc_compute_dist.restype = ctypes.c_double
    lib.fc_compute_dist.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    rng = np.random.default_rng(7)
    for n in (8, 16, 32, 64):
        for mask in (0, 1):
            for flat in (0, 1):
                for cq in (20, 36, 40, 47, 55):
                    # lapped-domain magnitudes (OD_COEFF_SHIFT scaled),
                    # plus near-identical pairs to stress cancellation
                    x = rng.integers(-5000, 5000, (n, n)).astype(np.int32)
                    if rng.random() < 0.3:
                        y = x + rng.integers(-3, 4, (n, n)).astype(np.int32)
                    else:
                        y = rng.integers(-5000, 5000, (n, n)) \
                            .astype(np.int32)
                    y = y.astype(np.int32)
                    want = compute_dist(x, y, n, mask, cq, bool(flat))
                    got = lib.fc_compute_dist(
                        x.ctypes.data, n, y.ctypes.data, n, n, mask, cq,
                        flat)
                    assert got == want, (n, mask, flat, cq)


def test_native_me_matches_python():
    """The native motion-estimation engine (me_enc.inc) and the Python
    pipeline (mvest.py) must produce byte-identical streams: estimation,
    mesh subdivision (try_vertex candidates), refinement, and MV-res
    selection all mirror each other."""
    import content

    w, h, n = 160, 96, 6
    frames = content.make_clip(w, h, n, seed=3)
    info = headers.Info(pic_width=w, pic_height=h)
    pkts = {}
    for native_me in (True, False):
        enc = Encoder(info, quant=15, complexity=7)
        enc.keyframe_rate = 8
        enc.use_native_me = native_me
        # Pin the greedy pipeline: the Python engine implements only
        # the greedy mesh (the decimate=5/6 thorough tiers are
        # native-only, non-normative speed/quality presets).
        enc.mv_decimate = 0
        enc.mv_max_level = 3
        out = []
        for fr in frames:
            out += enc.encode_frame(fr)
        out += enc.flush()
        pkts[native_me] = out
    assert len(pkts[True]) == len(pkts[False])
    for i, (a, b) in enumerate(zip(pkts[True], pkts[False])):
        assert bytes(a) == bytes(b), ("ME engine divergence at packet", i)


def test_native_frame_matches_python_highdepth():
    """The native frame coder's full-precision input/reference paths
    (frame_enc.inc in_fpr/mc_fpr) must produce byte-identical streams
    to the Python implementation at 10-bit, lossy and lossless."""
    w, h, n = 96, 64, 4
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (512 + 240 * np.sin((xx + 3 * t) / 9.0)
             + rng.normal(0, 16, (h, w))).clip(0, 1023).astype(np.uint16)
        cb = (512 + 80 * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, 1023).astype(np.uint16)
        cr = (512 + 80 * np.cos((yy[::2, ::2] + t) / 11.0)) \
            .clip(0, 1023).astype(np.uint16)
        frames.append([y, cb, cr])
    info = headers.Info(pic_width=w, pic_height=h, bitdepth_mode=2,
                        full_precision_references=1, keyframe_rate=8)
    for quant in (15, 0):
        pkts = {}
        for native in (True, False):
            enc = Encoder(info, quant=quant, complexity=7)
            enc.keyframe_rate = 8
            enc.use_native_frame = native
            out = [p for fr in frames for p in enc.encode_frame(fr)]
            out += enc.flush()
            pkts[native] = out
        assert len(pkts[True]) == len(pkts[False])
        for i, (a, b) in enumerate(zip(pkts[True], pkts[False])):
            assert bytes(a) == bytes(b), ("highdepth divergence", quant, i)


def test_native_me_min_level_matches_python():
    """OD_SET_MV_LEVEL_MIN analogue: forced mesh subdivision floor
    behaves identically in both ME engines and stays conformant
    (reference: daalaenc.h:194, src/mcenc.c:6405)."""
    import content

    w, h, n = 160, 96, 5
    frames = content.make_clip(w, h, n, seed=3)
    sizes = {}
    for lmin in (0, 2):
        pkts = {}
        for native_me in (True, False):
            info = headers.Info(pic_width=w, pic_height=h)
            enc = Encoder(info, quant=15, complexity=7)
            enc.keyframe_rate = 8
            enc.use_native_me = native_me
            enc.mv_decimate = 0  # greedy pipeline: see parity test above
            enc.mv_max_level = 3
            enc.mv_level_min = lmin
            out = [p for fr in frames for p in enc.encode_frame(fr)]
            out += enc.flush()
            pkts[native_me] = [bytes(p) for p in out]
        assert pkts[True] == pkts[False], lmin
        sizes[lmin] = sum(len(p) for p in pkts[True])
    # The forced subdivision must actually change the stream.
    assert sizes[2] != sizes[0]
