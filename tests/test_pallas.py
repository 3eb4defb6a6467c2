"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import numpy as np
import pytest


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
