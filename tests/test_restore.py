"""Jittable dering (models/restore.py) vs the host implementation."""

import numpy as np
import pytest

from daala_tpu.models import restore as R
from daala_tpu.ops import dering as D


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("xdec", [0, 1])
def test_dering_jax_bit_exact(seed, xdec):
    rng = np.random.default_rng(seed)
    n = 64 >> xdec
    H = W = 128 >> xdec
    plane = rng.integers(-2048, 2048, (H, W)).astype(np.int16)
    bskip = (rng.random(((H * 2) >> 2 << 2, (W * 2) >> 2 << 2))
             < 0.3).astype(np.uint8)
    bskip = bskip[:H >> (2 - xdec), :W >> (2 - xdec)]
    # full-plane bskip at this plane's 4x4 granularity
    bskip = (rng.random((H >> 2, W >> 2)) < 0.3).astype(np.uint8)
    threshold = 40
    for sby in range(2):
        for sbx in range(2):
            if xdec == 0:
                want, dirs = D.od_dering(plane, sby, sbx, 0, 0, bskip,
                                         threshold, n)
                got, dirs_j = R.od_dering_jax(plane, sby, sbx, 0, 0,
                                              bskip, threshold, n)
                np.testing.assert_array_equal(dirs_j, dirs)
            else:
                # chroma path shares the luma dirs
                dirs = rng.integers(0, 8, (n >> 2, n >> 2)) \
                    .astype(np.int32)
                dirs = rng.integers(0, 8, (8, 8)).astype(np.int32)
                want, _ = D.od_dering(plane, sby, sbx, 1, 1, bskip,
                                      threshold, n, dirs=dirs)
                got, _ = R.od_dering_jax(plane, sby, sbx, 1, 1, bskip,
                                         threshold, n, dirs=dirs)
            np.testing.assert_array_equal(got, want)
