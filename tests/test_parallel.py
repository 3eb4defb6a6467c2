"""Parallel scaling utilities: device mesh + host segment parallelism."""

import numpy as np
import pytest

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.parallel import mesh as PM

try:
    import codec_oracle as co
    co.get_lib()
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False


def test_device_mesh_batch_encode_step():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    mesh = PM.make_mesh()
    frames = np.random.default_rng(0).integers(
        0, 256, (4, 128, 128), np.uint8)
    sharded = PM.shard_batch(np.asarray(frames), mesh)
    with mesh:
        rec, sse, nz = PM.batch_encode_step(sharded)
        rec.block_until_ready()
    assert rec.shape == frames.shape
    assert int(sse) > 0


def test_segment_parallel_encode_decodes():
    w = h = 64
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(128 + 50 * np.sin(xx / 7.0) + 40 * np.cos(yy / 5.0)
                   + rng.normal(size=(h, w)) * 8, 0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 119, np.uint8)
    cr = np.full((h // 2, w // 2), 131, np.uint8)
    frames = [[np.roll(base, i, axis=1), cb, cr] for i in range(20)]
    info_kwargs = dict(pic_width=w, pic_height=h, nplanes=3,
                      plane_dec=((0, 0), (1, 1), (1, 1)),
                      keyframe_rate=16)
    pkts = PM.encode_clip_parallel(frames, info_kwargs,
                                   dict(quant=20, complexity=1),
                                   segment_len=16, workers=2)
    assert len(pkts) == 20
    info = H.Info(**info_kwargs)
    dec = Decoder(info)
    out = []
    for p in pkts:
        out.extend(dec.decode_packet(p))
    assert len(out) == 20
    # Quality sanity on the luma of the last frame.
    ps = 10 * np.log10(255 ** 2 / max(1e-9, np.mean(
        (out[-1][0].astype(float) - frames[-1][0].astype(float)) ** 2)))
    assert ps > 25
    if HAVE_ORACLE:
        from daala_tpu.codec.encoder import Encoder
        enc = Encoder(info, quant=20)
        ref = co.RefDecoder(enc.flush_headers())
        rout = []
        for p in pkts:
            rout.extend(ref.decode_packet(p))
        assert len(rout) == 20
        for a, b in zip(out, rout):
            for pa, pb in zip(a, b):
                np.testing.assert_array_equal(pa, pb)


def test_encode_clips_batched_matches_serial():
    """BASELINE.json config 5: the batched multi-clip encoder (clips on
    dp rows, planes sharded over sp columns, full complexity-7 trial
    RDO + entropy per clip) produces packets byte-identical to serial
    encodes."""
    import content
    from daala_tpu.codec import headers
    from daala_tpu.codec.encoder import Encoder
    from daala_tpu.parallel import mesh as PM
    w, h = 256, 192
    clips = [content.make_clip(w, h, 2, seed=s) for s in (1, 2)]
    m = PM.make_mesh(dp=2)
    outs = PM.encode_clips_batched(clips, dict(pic_width=w,
                                               pic_height=h), m,
                                   quant=18, complexity=7,
                                   threads=False)
    # One-thread-per-clip schedule (the production default: device
    # dispatch of one clip overlaps host entropy of another) must be
    # byte-identical too.
    outs_t = PM.encode_clips_batched(clips, dict(pic_width=w,
                                                 pic_height=h), m,
                                     quant=18, complexity=7,
                                     threads=True)
    for ci, frames in enumerate(clips):
        info = headers.Info(pic_width=w, pic_height=h)
        enc = Encoder(info, quant=18, complexity=7)
        want = [p for fr in frames for p in enc.encode_frame(fr)]
        want += enc.flush()
        assert [bytes(p) for p in outs[ci]] == [bytes(p) for p in want]
        assert [bytes(p) for p in outs_t[ci]] == [bytes(p) for p in want]
