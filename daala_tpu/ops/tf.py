"""Time/frequency resolution switching (TF) ops.

Frequency-domain conversion between transform resolutions: merge 2x2
groups of NxN coefficient blocks into one 2Nx2N block (and back) via the
shared Haar butterfly, plus the low-pass "TF filter" lifting pre/post
pass.  Behavioral reference: src/tf.c:39-287 and the OD_HAAR_KERNEL macro
(src/tf.h:34-45).  The codec's coded path only needs the LP upsamplers
(ops/intra.py wraps tf_up_hv_lp for CfL, reference src/intra.c:72-143);
the rest is here for full API parity and for offline tooling.

All functions are batched over leading dimensions and pure (return a new
array) — the reference's strided in-place writes become interleave-style
gathers/scatters, which is both numpy- and XLA-friendly.
"""

from __future__ import annotations

import numpy as np

from daala_tpu.ops.haar import haar_kernel
from daala_tpu.ops.intrin import dct_rshift


def _interleave(a, b, swap_mask, axis):
    """Interleave a and b along `axis` (each length m -> 2m), swapping the
    pair order where swap_mask (length m, bool) is set.

    Models the reference's `hswap = x & 1` write pattern: output index
    2*x + hswap gets a[x], 2*x + 1 - hswap gets b[x]."""
    a = np.moveaxis(a, axis, -1)
    b = np.moveaxis(b, axis, -1)
    m = a.shape[-1]
    out = np.empty(a.shape[:-1] + (2 * m,), dtype=a.dtype)
    even = np.where(swap_mask, b, a)
    odd = np.where(swap_mask, a, b)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return np.moveaxis(out, -1, axis)


def _deinterleave(x, swap_mask, axis):
    """Inverse of _interleave: split length-2m axis into (a, b)."""
    x = np.moveaxis(x, axis, -1)
    even = x[..., 0::2]
    odd = x[..., 1::2]
    a = np.where(swap_mask, odd, even)
    b = np.where(swap_mask, even, odd)
    return np.moveaxis(a, -1, axis), np.moveaxis(b, -1, axis)


def _swap_mask(m):
    return (np.arange(m) & 1).astype(bool)


def tf_up_h_lp(src, dx, n):
    """Raise horizontal frequency resolution of (..., n, n) blocks using
    the HF neighbor dx columns to the right inside a larger coefficient
    array; returns the upsampled LF half (reference: src/tf.c:39-58).

    src must be at least (..., n, n + dx)."""
    ll = src[..., :n, :n // 2].astype(np.int32)
    lh = src[..., :n, dx:dx + n // 2].astype(np.int32)
    lh = ll - lh
    ll = ll - dct_rshift(lh, 1)
    return _interleave(ll, lh, _swap_mask(n // 2), axis=-1)


def tf_up_v_lp(src, dy, n):
    """Vertical analog of tf_up_h_lp (reference: src/tf.c:60-79)."""
    ll = src[..., :n // 2, :n].astype(np.int32)
    hl = src[..., dy:dy + n // 2, :n].astype(np.int32)
    hl = ll - hl
    ll = ll - dct_rshift(hl, 1)
    return _interleave(ll, hl, _swap_mask(n // 2), axis=-2)


def tf_up_hv(src, n):
    """Merge a 2x2 group of nxn blocks (laid out as quadrants of a
    (..., 2n, 2n) array) into one 2nx2n block, raising frequency
    resolution (reference: src/tf.c:110-139)."""
    ll = src[..., :n, :n].astype(np.int32)
    lh = src[..., :n, n:2 * n].astype(np.int32)
    hl = src[..., n:2 * n, :n].astype(np.int32)
    hh = src[..., n:2 * n, n:2 * n].astype(np.int32)
    # lh/hl swapped into the kernel for exact reversibility w/ tf_down_hv.
    ll, hl, lh, hh = haar_kernel(ll, hl, lh, hh)
    top = _interleave(ll, lh, _swap_mask(n), axis=-1)
    bot = _interleave(hl, hh, _swap_mask(n), axis=-1)
    return _interleave(top, bot, _swap_mask(n), axis=-2)


def tf_down_hv(src, n):
    """Split one nxn block into a 2x2 group of (n/2)x(n/2) blocks laid
    out as quadrants, raising time resolution; exact inverse of
    tf_up_hv (reference: src/tf.c:141-173)."""
    assert n % 2 == 0
    m = n // 2
    top, bot = _deinterleave(src[..., :n, :n].astype(np.int32),
                             _swap_mask(m), axis=-2)
    ll, lh = _deinterleave(top, _swap_mask(m), axis=-1)
    hl, hh = _deinterleave(bot, _swap_mask(m), axis=-1)
    ll, lh, hl, hh = haar_kernel(ll, lh, hl, hh)
    out = np.empty(src.shape[:-2] + (n, n), np.int32)
    out[..., :m, :m] = ll
    out[..., :m, m:] = lh
    out[..., m:, :m] = hl
    out[..., m:, m:] = hh
    return out


def _tf_filter_axis(x, n, axis, inverse):
    """The 1-D low-pass lifting filter over odd lanes
    (reference: src/tf.c:175-199): pairs (u, v) = (lanes 2i+1, 2i+3),
    u += v >> 1; v -= u >> 1, applied sequentially down the lanes."""
    x = np.moveaxis(x, axis, -1).copy()
    m = (n >> 1) - 1
    if not inverse:
        for i in range(m):
            u = 2 * i + 1
            v = u + 2
            x[..., u] += x[..., v] >> 1
            x[..., v] -= x[..., u] >> 1
    else:
        for i in range(m):
            v = n - 1 - 2 * i
            u = v - 2
            x[..., v] += x[..., u] >> 1
            x[..., u] -= x[..., v] >> 1
    return np.moveaxis(x, -1, axis)


def tf_filter_2d(src, n):
    """2-D TF filter: rows then columns (reference: src/tf.c:200-216)."""
    x = src[..., :n, :n].astype(np.int32)
    x = _tf_filter_axis(x, n, -1, False)
    return _tf_filter_axis(x, n, -2, False)


def tf_filter_inv_2d(src, n):
    """Inverse 2-D TF filter: columns then rows
    (reference: src/tf.c:218-234)."""
    x = src[..., :n, :n].astype(np.int32)
    x = _tf_filter_axis(x, n, -2, True)
    return _tf_filter_axis(x, n, -1, True)


def convert_block_down(src, curr_size, dest_size, filter):
    """Convert an NxN coefficient block (N = 4 << curr_size) down to a
    quadtree of blocks of size 4 << dest_size via recursive tf_down_hv,
    optionally undoing the TF filter first
    (reference: src/tf.c:236-287)."""
    n = 4 << curr_size
    x = src[..., :n, :n].astype(np.int32)
    if curr_size == dest_size:
        return x
    if filter:
        x = tf_filter_inv_2d(x, n)
    x = tf_down_hv(x, n)
    if curr_size - 1 == dest_size:
        return x
    m = n // 2
    out = np.empty_like(x)
    for j in range(2):
        for i in range(2):
            out[..., j * m:(j + 1) * m, i * m:(i + 1) * m] = \
                convert_block_down(x[..., j * m:(j + 1) * m,
                                     i * m:(i + 1) * m],
                                   curr_size - 1, dest_size, filter)
    return out
