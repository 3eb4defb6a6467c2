"""The device OBMC engine (models/obmc.py) must reproduce the host
predictor (codec/mc.py mc_predict_frame) bit-exactly on arbitrary
meshes: all subdivision levels, mixed blend setups (oc, s), all
fractional MV phases, multiref/B fields, chroma decimation, and
full-precision (12-bit) references."""

import numpy as np
import pytest

from daala_tpu.codec import headers
from daala_tpu.codec import mc as MC
from daala_tpu.models import obmc as OB


class _Img:
    def __init__(self, planes):
        self.planes = planes


def _mk_refs(info, rng, hi=False):
    pad = MC.OD_BUFFER_PADDING
    imgs = []
    for _ in range(2):
        planes = []
        for pli in range(info.nplanes):
            xd, yd = info.plane_dec[pli]
            h = (info.frame_height >> yd) + 2 * (pad >> xd)
            w = (info.frame_width >> xd) + 2 * (pad >> xd)
            if hi:
                planes.append(rng.integers(0, 4096, (h, w),
                                           dtype=np.uint16))
            else:
                planes.append(rng.integers(0, 256, (h, w),
                                           dtype=np.uint8))
        imgs.append(_Img(planes))
    return imgs


def _random_grid(info, rng, levels=3, bframe=False):
    nh = info.frame_width >> 3
    nv = info.frame_height >> 3
    g = MC.MVGrid(nh, nv)
    # Level-0 lattice always valid.
    for vy in range(0, nv + 1, 8):
        for vx in range(0, nh + 1, 8):
            g.valid[vy, vx] = 1
    # Random subdivisions: enabling the center vertex of blocks,
    # level by level (children require the parent split).
    for lvl in range(1, levels + 1):
        step = 8 >> lvl
        for vy in range(step, nv + 1 - step, 2 * step):
            for vx in range(step, nh + 1 - step, 2 * step):
                parent_ok = True
                if lvl >= 2:
                    # the containing quad at the previous level must be
                    # split (its center valid)
                    pstep = step * 2
                    cy = (vy // (2 * pstep)) * 2 * pstep + pstep
                    cx = (vx // (2 * pstep)) * 2 * pstep + pstep
                    parent_ok = bool(g.valid[min(cy, nv), min(cx, nh)])
                if parent_ok and rng.random() < 0.5:
                    g.valid[vy, vx] = 1
    vmask = g.valid.astype(bool)
    n = int(vmask.sum())
    g.mv[vmask, 0] = rng.integers(-256, 257, n)
    g.mv[vmask, 1] = rng.integers(-256, 257, n)
    if bframe:
        g.ref[vmask] = rng.choice([1, 1, 2], n)
        g.mv1[vmask, 0] = rng.integers(-256, 257, n)
        g.mv1[vmask, 1] = rng.integers(-256, 257, n)
    else:
        g.ref[vmask] = rng.choice([0, 1], n)
    return g


@pytest.mark.parametrize("bframe", [False, True])
@pytest.mark.parametrize("hi", [False, True])
def test_device_obmc_matches_host(bframe, hi):
    info = headers.Info(pic_width=192, pic_height=128,
                        bitdepth_mode=2 if hi else 1,
                        full_precision_references=1 if hi else 0)
    rng = np.random.default_rng(9 + int(bframe) + 2 * int(hi))
    refs = _mk_refs(info, rng, hi=hi)
    ref_imgi = [0, 1, 1, 0] if not bframe else [0, 0, 1, 0]
    g = _random_grid(info, rng, bframe=bframe)

    class _Dst:
        def __init__(self):
            pad = MC.OD_BUFFER_PADDING
            self._p = []
            for pli in range(info.nplanes):
                xd, yd = info.plane_dec[pli]
                h = (info.frame_height >> yd) + 2 * (pad >> xd)
                w = (info.frame_width >> xd) + 2 * (pad >> xd)
                self._p.append(np.zeros(
                    (h, w), np.uint16 if hi else np.uint8))

        def plane_view(self, pli):
            xd, yd = info.plane_dec[pli]
            pad = MC.OD_BUFFER_PADDING >> xd
            return self._p[pli][pad:pad + (info.frame_height >> yd),
                                pad:pad + (info.frame_width >> xd)]

    dst = _Dst()
    MC.mc_predict_frame(g, refs, ref_imgi, info, dst)
    for pli in range(info.nplanes):
        want = dst.plane_view(pli)
        got = OB.predict_frame_plane_device(g, refs, ref_imgi, info, pli)
        assert np.array_equal(got, want), "plane %d mismatch" % pli
