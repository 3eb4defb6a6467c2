"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

INTERPRET = True


def test_pallas_dct_matches_numpy():
    import jax.numpy as jnp
    from daala_tpu.ops.pallas.dct_kernels import dct_frame_pallas
    from daala_tpu.models.analysis import blocks_of, unblocks
    from daala_tpu.ops import dct
    rng = np.random.default_rng(1)
    H = W = 64
    x = rng.integers(-2048, 2048, (H, W)).astype(np.int32)
    want = np.asarray(unblocks(
        jnp.asarray(dct.fdct2d(np.asarray(blocks_of(jnp.asarray(x), 8)))),
        H, W))
    got = dct_frame_pallas(jnp.asarray(x), n=8, forward=True,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
    inv = dct_frame_pallas(got, n=8, forward=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(inv), x)


@pytest.mark.parametrize("dims", [(128, 256), (192, 128)])
@pytest.mark.parametrize("dec", [(0, 0), (1, 1)])
def test_lap_frame_pallas(dims, dec):
    """Pallas lapped pre/post filter stripes must match the host frame
    filter bit-exactly, and post(pre(x)) must be the identity."""
    from daala_tpu.ops import filter as filt
    from daala_tpu.ops.pallas.lap_kernels import lap_frame_pallas

    h, w = dims
    xdec, ydec = dec
    sb_x, sb_y = 64 >> xdec, 64 >> ydec
    rng = np.random.default_rng(5)
    x = rng.integers(-(1 << 14), 1 << 14, (h, w)).astype(np.int32)
    ref = x.copy()
    filt.apply_prefilter_frame_sbs(ref, w // sb_x, h // sb_y,
                                   xdec, ydec)
    got = np.asarray(lap_frame_pallas(jnp.asarray(x), sb_x=sb_x,
                                      sb_y=sb_y, forward=True,
                                      interpret=INTERPRET))
    assert np.array_equal(got, ref)
    back = np.asarray(lap_frame_pallas(jnp.asarray(got), sb_x=sb_x,
                                       sb_y=sb_y, forward=False,
                                       interpret=INTERPRET))
    assert np.array_equal(back, x)
