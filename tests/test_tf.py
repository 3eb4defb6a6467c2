"""TF resolution-switching ops vs the reference C (src/tf.c)."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from daala_tpu.ops import tf as TF

CACHE = os.path.join(os.path.dirname(__file__), ".oracle_cache")
REF = "/root/reference"

PRELUDE = r"""
#include <stdint.h>
#include <string.h>
typedef int32_t od_coeff;
#define OD_DCT_RSHIFT(a, b) \
 (((int32_t)(((uint32_t)(a) >> (32 - (b))) + (a))) >> (b))
#define OD_ASSERT(x)
#define OD_LOG_BSIZE0 (2)
#define OD_BSIZE_MAX (64)
#define OD_HAAR_KERNEL(ll, lh, hl, hh) \
  do { \
    od_coeff llmhh_2__; \
    (ll) += (hl); \
    (hh) -= (lh); \
    llmhh_2__ = ((ll) - (hh)) >> 1; \
    (lh) = llmhh_2__ - (lh); \
    (hl) = llmhh_2__ - (hl); \
    (ll) -= (lh); \
    (hh) += (hl); \
  } \
  while(0)
"""


def _build():
    os.makedirs(CACHE, exist_ok=True)
    lib = os.path.join(CACHE, "libtf.so")
    if os.path.exists(lib):
        return lib
    src = open(os.path.join(REF, "src", "tf.c")).read()
    # Strip the license banner + includes; keep function bodies only.
    body = src[src.index("/*Increase horizontal frequency"):]
    with open(os.path.join(CACHE, "tf_oracle.c"), "w") as f:
        f.write(PRELUDE + body)
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC",
                    os.path.join(CACHE, "tf_oracle.c"), "-o", lib],
                   check=True)
    return lib


@pytest.fixture(scope="module")
def lib():
    if not os.path.isdir(REF):
        pytest.skip("no reference tree")
    L = ctypes.CDLL(_build())
    return L


def _c(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_tf_up_down_hv(lib, n):
    rng = np.random.default_rng(n)
    src = rng.integers(-1000, 1000, (2 * n, 2 * n)).astype(np.int32)
    ref = np.zeros((2 * n, 2 * n), np.int32)
    lib.od_tf_up_hv(_c(ref), 2 * n, _c(src), 2 * n, n)
    ours = TF.tf_up_hv(src, n)
    np.testing.assert_array_equal(ours, ref)
    ref2 = np.zeros((2 * n, 2 * n), np.int32)
    lib.od_tf_down_hv(_c(ref2), 2 * n, _c(ref), 2 * n, 2 * n)
    ours2 = TF.tf_down_hv(ours, 2 * n)
    np.testing.assert_array_equal(ours2, ref2)
    # exact reversibility
    np.testing.assert_array_equal(ours2, src)


@pytest.mark.parametrize("n", [4, 8, 16])
def test_tf_up_lp(lib, n):
    rng = np.random.default_rng(n + 1)
    big = rng.integers(-1000, 1000, (2 * n, 2 * n)).astype(np.int32)
    for dx in (n, n + 2):
        ref = np.zeros((n, n), np.int32)
        lib.od_tf_up_h_lp(_c(ref), n, _c(big), 2 * n, dx, n)
        np.testing.assert_array_equal(TF.tf_up_h_lp(big, dx, n), ref)
    for dy in (n // 2, n):
        ref = np.zeros((n, n), np.int32)
        lib.od_tf_up_v_lp(_c(ref), n, _c(big), 2 * n, dy, n)
        np.testing.assert_array_equal(TF.tf_up_v_lp(big, dy, n), ref)


@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_tf_filter_2d(lib, n):
    rng = np.random.default_rng(n + 2)
    src = rng.integers(-1000, 1000, (n, n)).astype(np.int32)
    ref = np.zeros((n, n), np.int32)
    lib.od_tf_filter_2d(_c(ref), n, _c(src), n, n)
    np.testing.assert_array_equal(TF.tf_filter_2d(src, n), ref)
    inv = np.zeros((n, n), np.int32)
    lib.od_tf_filter_inv_2d(_c(inv), n, _c(ref), n, n)
    np.testing.assert_array_equal(TF.tf_filter_inv_2d(ref, n), inv)
    np.testing.assert_array_equal(inv, src)


@pytest.mark.parametrize("curr,dest,filt", [(1, 0, 0), (2, 0, 1),
                                            (2, 1, 0), (3, 0, 1),
                                            (3, 3, 0)])
def test_convert_block_down(lib, curr, dest, filt):
    lib_ = lib
    n = 4 << curr
    rng = np.random.default_rng(curr * 8 + dest)
    src = rng.integers(-1000, 1000, (n, n)).astype(np.int32)
    ref = np.zeros((n, n), np.int32)
    lib_.od_convert_block_down(_c(ref), n, _c(src), n, curr, dest, filt)
    np.testing.assert_array_equal(
        TF.convert_block_down(src, curr, dest, filt), ref)
