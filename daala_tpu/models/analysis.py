"""JAX/TPU frame analysis + synthesis pipeline (the codec's compute core).

This is the TPU-first re-expression of the per-frame signal path
(reference walks blocks one at a time; here every stage is one batched
tensor op over the whole frame, or a whole batch of frames):

  pixels -> coefficient lift -> frame lapped prefilter
         -> blockwise reversible DCT -> (quantization metrics)
  and the inverse synthesis path.

Everything is jittable with static shapes; the lapped filters at
superblock boundaries are gather/filter/scatter on static row/column
indices; the lifting kernels from _lifting.py trace directly into XLA as
fused elementwise chains over (nblocks, ...) lanes.

The entropy-coding stage is host-side by design (see SURVEY.md section 7);
this module covers everything the TPU computes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from daala_tpu.ops import _lifting as L
from daala_tpu.ops.intrin import OD_COEFF_SHIFT

OD_BSIZE_MAX = 64


def lift_to_coeff(frame_u8):
    """(…, H, W) uint8 -> int32 coefficient domain."""
    return (frame_u8.astype(jnp.int32) - 128) << OD_COEFF_SHIFT


def coeff_to_u8(coeffs):
    v = (coeffs + (1 << OD_COEFF_SHIFT >> 1)) >> OD_COEFF_SHIFT
    return jnp.clip(v + 128, 0, 255).astype(jnp.uint8)


def _filter_rows_at(c, row_starts, inv):
    """Apply the 4-point lapped filter vertically at each row start
    (vectorized across all boundaries and all columns)."""
    if not row_starts:
        return c
    fn = L.post_filter4 if inv else L.pre_filter4
    rows = jnp.asarray(row_starts)  # (nb,)
    # Gather (nb, 4, W) bands.
    idx = rows[:, None] + jnp.arange(4)[None, :]
    band = c[idx]  # (nb, 4, W)
    lanes = [band[:, k, :] for k in range(4)]
    out = fn(lanes)
    band = jnp.stack(out, axis=1)
    return c.at[idx].set(band)


def _filter_cols_at(c, col_starts, inv):
    if not col_starts:
        return c
    fn = L.post_filter4 if inv else L.pre_filter4
    cols = jnp.asarray(col_starts)
    idx = cols[:, None] + jnp.arange(4)[None, :]
    band = c[:, idx]  # (H, nb, 4)
    lanes = [band[:, :, k] for k in range(4)]
    out = fn(lanes)
    band = jnp.stack(out, axis=2)
    return c.at[:, idx].set(band)


def prefilter_frame(c, sb=OD_BSIZE_MAX):
    """Frame-level lapped prefilter at superblock boundaries
    (reference: src/filter.c:1529-1560): horizontal edges then vertical."""
    h, w = c.shape[-2], c.shape[-1]
    row_starts = [sby * sb - 2 for sby in range(1, h // sb)]
    col_starts = [sbx * sb - 2 for sbx in range(1, w // sb)]
    c = _filter_rows_at(c, row_starts, inv=False)
    c = _filter_cols_at(c, col_starts, inv=False)
    return c


def postfilter_frame(c, sb=OD_BSIZE_MAX):
    h, w = c.shape[-2], c.shape[-1]
    row_starts = [sby * sb - 2 for sby in range(1, h // sb)]
    col_starts = [sbx * sb - 2 for sbx in range(1, w // sb)]
    c = _filter_cols_at(c, col_starts, inv=True)
    c = _filter_rows_at(c, row_starts, inv=True)
    return c


def split_filter(c, bs_from, bs_to):
    """Interior lapped filters for all split boundaries from superblock
    level down to blocks of size (4 << bs_to): equivalent to running
    od_prefilter_split over the whole frame for a uniform block-size map."""
    size = OD_BSIZE_MAX
    while size > (4 << bs_to):
        half = size // 2
        h, w = c.shape[-2], c.shape[-1]
        row_starts = [y + half - 2 for y in range(0, h, size)]
        col_starts = [x + half - 2 for x in range(0, w, size)]
        c = _filter_rows_at(c, row_starts, inv=False)
        c = _filter_cols_at(c, col_starts, inv=False)
        size = half
    return c


def split_unfilter(c, bs_to):
    sizes = []
    size = OD_BSIZE_MAX
    while size > (4 << bs_to):
        sizes.append(size)
        size //= 2
    for size in reversed(sizes):
        half = size // 2
        h, w = c.shape[-2], c.shape[-1]
        row_starts = [y + half - 2 for y in range(0, h, size)]
        col_starts = [x + half - 2 for x in range(0, w, size)]
        c = _filter_cols_at(c, col_starts, inv=True)
        c = _filter_rows_at(c, row_starts, inv=True)
    return c


def blocks_of(c, n):
    """(H, W) -> (H//n * W//n, n, n) block tensor."""
    h, w = c.shape
    return (c.reshape(h // n, n, w // n, n)
             .transpose(0, 2, 1, 3)
             .reshape(-1, n, n))


def unblocks(blocks, h, w):
    n = blocks.shape[-1]
    return (blocks.reshape(h // n, w // n, n, n)
                  .transpose(0, 2, 1, 3)
                  .reshape(h, w))


def fdct_frame(c, bs):
    """Blockwise forward DCT of the whole frame at uniform size 4<<bs."""
    from daala_tpu.ops import dct
    n = 4 << bs
    h, w = c.shape
    return unblocks(dct.fdct2d(blocks_of(c, n)), h, w)


def idct_frame(d, bs):
    from daala_tpu.ops import dct
    n = 4 << bs
    h, w = d.shape
    return unblocks(dct.idct2d(blocks_of(d, n)), h, w)


@functools.partial(jax.jit, static_argnames=("bs",))
def analysis_transform(frame_u8, bs=1):
    """Full forward analysis: pixels -> lapped, transformed coefficients.

    This is the encoder's device-side front half for a uniform block size;
    the PVQ search consumes these coefficients."""
    c = lift_to_coeff(frame_u8)
    c = prefilter_frame(c)
    c = split_filter(c, 4, bs)
    return fdct_frame(c, bs)


@functools.partial(jax.jit, static_argnames=("bs",))
def synthesis_transform(coeffs, bs=1):
    """Inverse of analysis_transform: coefficients -> pixels."""
    c = idct_frame(coeffs, bs)
    c = split_unfilter(c, bs)
    c = postfilter_frame(c)
    return coeff_to_u8(c)


@functools.partial(jax.jit, static_argnames=("bs", "quant"))
def encode_step(frame_u8, bs=1, quant=3840):
    """One device-side 'encode step': analysis, uniform quantization of the
    coefficient tensor, reconstruction, and distortion statistics.

    This is the jittable flagship pipeline used by bench/entry; the real
    codec replaces the uniform quantizer with the PVQ search (host loop
    today, batched device search next)."""
    d = analysis_transform(frame_u8, bs=bs)
    q = jnp.int32(quant)
    dq = jnp.where(d >= 0, (d + (q >> 1)) // q, -((-d + (q >> 1)) // q))
    rec_coeffs = dq * q
    rec = synthesis_transform(rec_coeffs, bs=bs)
    err = rec.astype(jnp.int32) - frame_u8.astype(jnp.int32)
    sse = jnp.sum(err * err)
    nz = jnp.sum((dq != 0).astype(jnp.int32))
    return rec, sse, nz
