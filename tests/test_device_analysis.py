"""The device keyframe-analysis front-end (daala_tpu/models/keyframe.py)
must produce byte-identical packets when the host EC pass consumes it —
single-device and sharded over a multi-device mesh (conftest forces 8
virtual CPU devices)."""

import numpy as np
import pytest

from daala_tpu import native
from daala_tpu.codec import headers
from daala_tpu.codec.encoder import Encoder

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native engine unavailable")


def _frame(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(xx / 7.0) + 40 * np.cos(yy / 11.0)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
    cb = (128 + 30 * np.sin(xx[::2, ::2] / 9.0)).clip(0, 255) \
        .astype(np.uint8)
    cr = (128 + 30 * np.cos(yy[::2, ::2] / 13.0)).clip(0, 255) \
        .astype(np.uint8)
    return [y, cb, cr]


def _encode_kf(w, h, frame, device=False, device_put_fn=None,
               complexity=1):
    info = headers.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=18, complexity=complexity)
    enc.keyframe_rate = 1
    if device:
        enc.use_device_analysis = True
        if device_put_fn is not None:
            enc.device_put_fn = device_put_fn
    return enc.encode_frame(frame)[0]


@pytest.mark.parametrize("w,h,cx", [(256, 192, 1)])
def test_device_analysis_matches_host(w, h, cx):
    frame = _frame(w, h)
    host = _encode_kf(w, h, frame, device=False, complexity=cx)
    dev = _encode_kf(w, h, frame, device=True, complexity=cx)
    assert dev == host


def test_device_analysis_sharded_mesh():
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs multiple devices")
    dp = 2 if ndev % 2 == 0 else 1
    sp = ndev // dp
    mesh = Mesh(np.array(jax.devices()[:dp * sp]).reshape(dp, sp),
                ("dp", "sp"))
    # Same shape as the host-match test so the jitted analysis reuses
    # its compilation cache (CPU compiles dominate the test time).
    w, h = 256, 192
    frame = _frame(w, h, seed=3)
    host = _encode_kf(w, h, frame, device=False)

    def put(plane, pli):
        return jax.device_put(plane, NamedSharding(mesh, PS("dp", "sp")))

    with mesh:
        dev = _encode_kf(w, h, frame, device=True, device_put_fn=put)
    assert dev == host


def _clip(w, h, n, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 3 * t) / 9.0)
             + 40 * np.cos((yy + 2 * t) / 7.0)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        cw, ch = (w + 1) // 2, (h + 1) // 2
        cb = (128 + 20 * np.sin((xx[:ch, :cw] + t) / 13.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 + 20 * np.cos((yy[:ch, :cw] + t) / 11.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cr])
    return frames


@pytest.mark.parametrize("w,h", [(192, 128), (177, 115)])
def test_device_inter_analysis_matches_host(w, h):
    """Inter frames through the device front-end (input + OBMC
    prediction transforms, models/keyframe.py inter_analysis_plane)
    produce byte-identical packets, including the padding-follows-
    prediction substitution at odd sizes."""
    frames = _clip(w, h, 4)
    pkts = {}
    for dev in (False, True):
        info = headers.Info(pic_width=w, pic_height=h)
        enc = Encoder(info, quant=15, complexity=1)
        enc.keyframe_rate = 8
        enc.use_device_analysis = dev
        out = [p for fr in frames for p in enc.encode_frame(fr)]
        out += enc.flush()
        pkts[dev] = [bytes(p) for p in out]
    assert pkts[True] == pkts[False]


@pytest.mark.parametrize("w,h", [(192, 128)])
def test_device_analysis_complexity7(w, h):
    """At complexity >= 2 the device path must cover BOTH passes: the
    RDO trial pyramid (frame_enc.inc pre_rd/pre_rmd/pre_d_rdo) and the
    final analysis on the decided block-size map — byte-identical
    packets on keyframes and inter frames."""
    frames = _clip(w, h, 4, seed=7)
    pkts = {}
    for dev in (False, True):
        info = headers.Info(pic_width=w, pic_height=h)
        enc = Encoder(info, quant=15, complexity=7)
        enc.keyframe_rate = 8
        enc.use_device_analysis = dev
        out = [p for fr in frames for p in enc.encode_frame(fr)]
        out += enc.flush()
        pkts[dev] = [bytes(p) for p in out]
    assert pkts[True] == pkts[False]


def test_device_analysis_fpr_highdepth():
    """The device lift covers full-precision references and 10-bit
    input (models/keyframe.py _lift_input); packets must stay
    byte-identical through both device passes."""
    w, h = 192, 128
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(3):
        y = (512 + 240 * np.sin((xx + 3 * t) / 9.0)
             + rng.normal(0, 12, (h, w))).clip(0, 1023) \
            .astype(np.uint16)
        cb = (512 + 100 * np.sin((xx[::2, ::2] + t) / 13.0)) \
            .clip(0, 1023).astype(np.uint16)
        cr = (512 - 80 * np.cos((yy[::2, ::2] + t) / 11.0)) \
            .clip(0, 1023).astype(np.uint16)
        frames.append([y, cb, cr])
    pkts = {}
    for dev in (False, True):
        info = headers.Info(pic_width=w, pic_height=h, bitdepth_mode=2,
                            full_precision_references=True)
        enc = Encoder(info, quant=15, complexity=7)
        enc.keyframe_rate = 8
        enc.use_device_analysis = dev
        out = [p for fr in frames for p in enc.encode_frame(fr)]
        out += enc.flush()
        pkts[dev] = [bytes(p) for p in out]
    assert pkts[True] == pkts[False]
