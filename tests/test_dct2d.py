"""2-D DCT and scan-order tests (vs reference C oracle where available)."""

import numpy as np
import pytest

from daala_tpu.ops import dct, partition

try:
    import ref_oracle
    ref_oracle.get_lib()
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False

SIZES = (4, 8, 16, 32, 64)


def rand_blocks(n, rng, count=64, scale=1 << 12):
    return np.asarray(rng.integers(-scale, scale, size=(count, n, n)),
                      np.int32)


@pytest.mark.parametrize("n", SIZES)
def test_fdct2d_roundtrip(n):
    rng = np.random.default_rng(n)
    x = rand_blocks(n, rng)
    y = dct.fdct2d(x)
    np.testing.assert_array_equal(dct.idct2d(y), x)


@pytest.mark.skipif(not HAVE_ORACLE, reason="reference oracle unavailable")
@pytest.mark.parametrize("n", SIZES)
def test_fdct2d_matches_reference(n):
    rng = np.random.default_rng(1000 + n)
    x = rand_blocks(n, rng, count=16)
    np.testing.assert_array_equal(dct.fdct2d(x), ref_oracle.ref_fdct2d(n, x))
    y = ref_oracle.ref_fdct2d(n, x)
    np.testing.assert_array_equal(dct.idct2d(y), ref_oracle.ref_idct2d(n, y))


def test_fdct2d_jax_matches_numpy():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    x = rand_blocks(8, rng)
    want = dct.fdct2d(x)
    got = jax.jit(dct.fdct2d)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("n", SIZES)
def test_scan_order_roundtrip(n):
    rng = np.random.default_rng(n)
    x = rand_blocks(n, rng, count=8)
    v = partition.raster_to_coding(x)
    slen = partition.scan_length(n)
    assert v.shape == (8, slen)
    assert slen == {4: 16, 8: 64, 16: 256, 32: 512, 64: 512}[n]
    back = partition.coding_to_raster(v, n, base=x)
    np.testing.assert_array_equal(back, x)
    # Scanned positions must be unique; with base=None the unscanned tail
    # is zeroed.
    perm = partition.coding_order_indices(n)
    assert len(set(perm.tolist())) == slen
    z = partition.coding_to_raster(v, n)
    np.testing.assert_array_equal(z.reshape(8, -1)[:, perm],
                                  x.reshape(8, -1)[:, perm])


@pytest.mark.parametrize("n", SIZES)
def test_band_offsets(n):
    offs = partition.band_offsets(n)
    assert offs[0] == 1
    # 32x32 and 64x64 both stop their band structure at 512 coefficients
    # (reference: src/partition.c:79-83).
    expect_last = {4: 16, 8: 64, 16: 256, 32: 1024, 64: 1024}[n] // 2
    if n == 4:
        expect_last = 16
    elif n == 8:
        expect_last = 64
    elif n == 16:
        expect_last = 256
    else:
        expect_last = 512
    assert offs[-1] == expect_last


def test_overflow_sanitizer(monkeypatch):
    """DAALA_TPU_CHECK_OVERFLOW=1 recomputes transforms in int64 and
    flags int32 lifting wraps (analog of OD_DCT_CHECK_OVERFLOW)."""
    import numpy as np
    from daala_tpu.ops import dct as D
    monkeypatch.setattr(D, "_CHECK_OVERFLOW", True)
    rng = np.random.default_rng(1)
    x = rng.integers(-(1 << 14), 1 << 14, (2, 16, 16)).astype(np.int32)
    y = D.fdct2d(x)
    assert np.array_equal(D.idct2d(y), x)
    big = np.full((1, 8, 8), 1 << 28, np.int32)
    import pytest
    with pytest.raises(OverflowError):
        D.fdct2d(big)
