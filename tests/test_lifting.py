"""Bit-exactness tests for the generated lifting kernels.

Mirrors the reference's dcttest strategy (reference: src/tests/dcttest.c):
forward/inverse round-trip plus direct comparison against the reference C
implementation compiled as an oracle.
"""

import numpy as np
import pytest

import daala_tpu.ops._lifting as L

try:
    import ref_oracle
    HAVE_ORACLE = True
    try:
        ref_oracle.get_lib()
    except Exception:
        HAVE_ORACLE = False
except Exception:
    HAVE_ORACLE = False

SIZES = (4, 8, 16, 32, 64)
FILTER_SIZES = (4, 8, 16, 32)
NVEC = 512


def rand_lanes(n, rng, scale=1 << 12):
    """Random int32 test vectors roughly in coefficient range (the codec
    feeds 8-bit pixels shifted by OD_COEFF_SHIFT=4, so +-2^12 is generous)."""
    return np.asarray(
        rng.integers(-scale, scale, size=(n, NVEC)), np.int32)


def as_rows(lanes):
    return np.stack(lanes, axis=-1)


@pytest.mark.parametrize("n", SIZES)
def test_dct_roundtrip(n):
    rng = np.random.default_rng(n)
    x = rand_lanes(n, rng)
    fdct = getattr(L, "fdct%d" % n)
    idct = getattr(L, "idct%d" % n)
    y = fdct(list(x))
    xr = idct(y)
    np.testing.assert_array_equal(as_rows(xr), as_rows(list(x)))


@pytest.mark.parametrize("n", FILTER_SIZES)
def test_filter_roundtrip(n):
    rng = np.random.default_rng(100 + n)
    x = rand_lanes(n, rng)
    pre = getattr(L, "pre_filter%d" % n)
    post = getattr(L, "post_filter%d" % n)
    y = pre(list(x))
    xr = post(y)
    np.testing.assert_array_equal(as_rows(xr), as_rows(list(x)))


@pytest.mark.skipif(not HAVE_ORACLE, reason="reference oracle unavailable")
@pytest.mark.parametrize("n", SIZES)
def test_dct_matches_reference(n):
    rng = np.random.default_rng(200 + n)
    x = rand_lanes(n, rng)
    rows = as_rows(list(x))
    got_f = as_rows(getattr(L, "fdct%d" % n)(list(x)))
    want_f = ref_oracle.ref_fdct(n, rows)
    np.testing.assert_array_equal(got_f, want_f)
    got_i = as_rows(getattr(L, "idct%d" % n)(list(want_f.T)))
    want_i = ref_oracle.ref_idct(n, want_f)
    np.testing.assert_array_equal(got_i, want_i)


@pytest.mark.skipif(not HAVE_ORACLE, reason="reference oracle unavailable")
@pytest.mark.parametrize("n", FILTER_SIZES)
@pytest.mark.parametrize("kind", ["pre", "post"])
def test_filter_matches_reference(n, kind):
    rng = np.random.default_rng(300 + n)
    x = rand_lanes(n, rng)
    rows = as_rows(list(x))
    got = as_rows(getattr(L, "%s_filter%d" % (kind, n))(list(x)))
    want = ref_oracle.ref_filter(kind, n, rows)
    np.testing.assert_array_equal(got, want)
