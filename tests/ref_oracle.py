"""Build a C oracle library from the reference's normative lifting functions.

Used only by tests to prove that the generated lane-wise kernels in
daala_tpu/ops/_lifting.py are bit-exact with the reference implementation
(reference: src/dct.c, src/filter.c).  The oracle is compiled on demand into
a cache directory and loaded with ctypes; tests skip if no reference tree or
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import gen_lifting  # noqa: E402

CACHE = os.path.join(os.path.dirname(__file__), ".oracle_cache")

PRELUDE = """
#include <stdint.h>
typedef int32_t od_coeff;
#define OD_DCT_RSHIFT(a, b) \\
 (((int32_t)(((uint32_t)(a) >> (32 - (b))) + (a))) >> (b))
"""


def _build() -> str:
    os.makedirs(CACHE, exist_ok=True)
    lib_path = os.path.join(CACHE, "liboracle.so")
    src_path = os.path.join(CACHE, "oracle.c")
    if os.path.exists(lib_path):
        return lib_path
    dct_text = gen_lifting.preprocess(
        os.path.join(gen_lifting.REF, "src", "dct.c"))
    filt_text = gen_lifting.preprocess(
        os.path.join(gen_lifting.REF, "src", "filter.c"))
    parts = [PRELUDE]
    for fn in gen_lifting.DCT_FUNCS:
        parts.append(gen_lifting.extract_function(dct_text, fn))
    for n in (4, 8, 16, 32, 64):
        for kind in ("fdct", "idct"):
            parts.append(gen_lifting.extract_function(
                dct_text, "od_bin_%s%dx%d" % (kind, n, n)))
    for fn in gen_lifting.FILTER_FUNCS:
        parts.append(gen_lifting.extract_function(filt_text, fn))
    with open(src_path, "w") as f:
        f.write("\n".join(parts))
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", src_path,
                    "-o", lib_path], check=True)
    return lib_path


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
    return _lib


def ref_fdct(n: int, x: np.ndarray) -> np.ndarray:
    """Run the reference 1-D forward DCT on each row of x (shape (..., n))."""
    lib = get_lib()
    fn = getattr(lib, "od_bin_fdct%d" % n)
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty_like(x)
    flat_in = x.reshape(-1, n)
    flat_out = out.reshape(-1, n)
    for i in range(flat_in.shape[0]):
        fn(flat_out[i].ctypes.data_as(ctypes.c_void_p),
           flat_in[i].ctypes.data_as(ctypes.c_void_p), 1)
    return out


def ref_idct(n: int, y: np.ndarray) -> np.ndarray:
    lib = get_lib()
    fn = getattr(lib, "od_bin_idct%d" % n)
    y = np.ascontiguousarray(y, np.int32)
    out = np.empty_like(y)
    flat_in = y.reshape(-1, n)
    flat_out = out.reshape(-1, n)
    for i in range(flat_in.shape[0]):
        fn(flat_out[i].ctypes.data_as(ctypes.c_void_p), 1,
           flat_in[i].ctypes.data_as(ctypes.c_void_p))
    return out


def ref_fdct2d(n: int, x: np.ndarray) -> np.ndarray:
    """Reference 2-D forward DCT on a batch of blocks (..., n, n)."""
    lib = get_lib()
    fn = getattr(lib, "od_bin_fdct%dx%d" % (n, n))
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty_like(x)
    fi = x.reshape(-1, n, n)
    fo = out.reshape(-1, n, n)
    for i in range(fi.shape[0]):
        fn(fo[i].ctypes.data_as(ctypes.c_void_p), n,
           fi[i].ctypes.data_as(ctypes.c_void_p), n)
    return out


def ref_idct2d(n: int, y: np.ndarray) -> np.ndarray:
    lib = get_lib()
    fn = getattr(lib, "od_bin_idct%dx%d" % (n, n))
    y = np.ascontiguousarray(y, np.int32)
    out = np.empty_like(y)
    fi = y.reshape(-1, n, n)
    fo = out.reshape(-1, n, n)
    for i in range(fi.shape[0]):
        fn(fo[i].ctypes.data_as(ctypes.c_void_p), n,
           fi[i].ctypes.data_as(ctypes.c_void_p), n)
    return out


def ref_filter(kind: str, n: int, x: np.ndarray) -> np.ndarray:
    """kind: 'pre' or 'post'.  Applies the reference lapped filter rowwise."""
    lib = get_lib()
    fn = getattr(lib, "od_%s_filter%d" % (kind, n))
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty_like(x)
    flat_in = x.reshape(-1, n)
    flat_out = out.reshape(-1, n)
    for i in range(flat_in.shape[0]):
        fn(flat_out[i].ctypes.data_as(ctypes.c_void_p),
           flat_in[i].ctypes.data_as(ctypes.c_void_p))
    return out
