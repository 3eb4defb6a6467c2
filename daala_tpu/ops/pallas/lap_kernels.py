"""Pallas TPU kernels for the frame lapped pre/post filters.

The frame-level lapped filter applies the reversible 4-tap lifting
filter (daala_tpu/ops/_lifting.py pre_filter4/post_filter4) across every
superblock boundary (reference: src/filter.c:1529-1610
od_apply_prefilter_frame_sbs / od_apply_postfilter_frame_sbs).  The
boundary rows are static, so a kernel instance holds a full-height
column stripe in VMEM and applies every horizontal-boundary band as a
statically unrolled sequence of VPU lifting steps; the vertical
boundaries run as the same kernel on the transposed frame (the
transposes are left to XLA, as in dct_kernels.py).

Order matches the host path exactly: prefilter does rows (horizontal
boundaries) then columns; postfilter does columns then rows.  Integer
lifting is per-lane exact, so outputs are bit-identical to
daala_tpu/ops/filter.py (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daala_tpu.ops import _lifting as L


def _default_interpret():
    # Pallas compiles only on real TPU backends; everywhere else
    # (CPU test meshes, the virtual multichip dryrun) use interpret
    # mode, which is bit-identical.
    return jax.default_backend() != "tpu"


def _band_kernel(row_starts, forward):
    fn = L.pre_filter4 if forward else L.post_filter4

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]
        for r in row_starts:  # static unroll: one 4-row band per boundary
            lanes = [o_ref[r + k, :] for k in range(4)]
            out = fn(lanes)
            for k in range(4):
                o_ref[r + k, :] = out[k]

    return kernel


def _row_pass(frame, row_starts, forward, interpret, tile_w=512):
    h, w = frame.shape
    if not row_starts:
        return frame
    # Pick the widest column tile that divides the frame width and
    # satisfies Mosaic's lane-dim constraint (multiple of 128, or the
    # full width).
    tile_w = min(tile_w, w)
    while tile_w > 128 and (w % tile_w or tile_w % 128):
        tile_w -= 128
    if w % tile_w or tile_w % 128:
        tile_w = w
    return pl.pallas_call(
        _band_kernel(tuple(row_starts), forward),
        out_shape=jax.ShapeDtypeStruct((h, w), frame.dtype),
        grid=(w // tile_w,),
        in_specs=[pl.BlockSpec((h, tile_w), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, tile_w), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frame)


@functools.partial(jax.jit,
                   static_argnames=("sb_x", "sb_y", "forward", "interpret"))
def lap_frame_pallas(frame, sb_x=64, sb_y=64, forward=True,
                     interpret=None):
    """Frame lapped pre/post filter of a (H, W) int32 plane with the
    lifting bands executed as Pallas stripe kernels.

    sb_x/sb_y: superblock size per axis (64 >> xdec/ydec for chroma)."""
    if interpret is None:
        interpret = _default_interpret()
    h, w = frame.shape
    rows = [k * sb_y - 2 for k in range(1, h // sb_y)]
    cols = [k * sb_x - 2 for k in range(1, w // sb_x)]
    if forward:
        z = _row_pass(frame, rows, True, interpret)
        z = _row_pass(z.T, cols, True, interpret).T
        return z
    z = _row_pass(frame.T, cols, False, interpret).T
    return _row_pass(z, rows, False, interpret)
