"""Pallas TPU kernels for the hot transform ops.

The lifting networks from _lifting.py are pure elementwise chains, so they
trace directly inside a Pallas kernel body: each lifting step is one VPU
op over a whole (n, W) stripe of the frame held in VMEM.  The kernel
pipelines stripes through VMEM via the grid; Mosaic double-buffers the
HBM->VMEM DMAs automatically.

2-D transform decomposition: with colpass(v)[j, i] = dct1d(v[:, i])[j] and
T the per-tile transpose, the reference composition
(reference: src/dct.c:152-163) is
  fdct2d = T(colpass(T(colpass(x))))     idct2d = colpass(T(colpass(T(y))))
The column passes run in Pallas; the per-tile transposes are left to XLA
(Mosaic's vector layouts do not support the in-register tile reshape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daala_tpu.ops import _lifting as L

_FDCT_1D = {4: L.fdct4, 8: L.fdct8, 16: L.fdct16, 32: L.fdct32,
            64: L.fdct64}
_IDCT_1D = {4: L.idct4, 8: L.idct8, 16: L.idct16, 32: L.idct32,
            64: L.idct64}


def _colpass_kernel(n, bn, forward):
    fn = _FDCT_1D[n] if forward else _IDCT_1D[n]

    def kernel(x_ref, o_ref):
        x = x_ref[:]  # (bn, W): bn // n transform stripes
        outs = []
        for s in range(bn // n):
            outs.extend(fn([x[s * n + k, :] for k in range(n)]))
        o_ref[:] = jnp.stack(outs, axis=0)

    return kernel


def _colpass(frame, n, forward, interpret):
    h, w = frame.shape
    # Mosaic requires the block's second-minor dim to be a multiple of
    # 8 (sublanes); pack multiple n-row stripes per block for n == 4.
    bn = max(n, 8)
    if h % bn:
        bn = n
    return pl.pallas_call(
        _colpass_kernel(n, bn, forward),
        out_shape=jax.ShapeDtypeStruct((h, w), frame.dtype),
        grid=(h // bn,),
        in_specs=[pl.BlockSpec((bn, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frame)


def _tile_t(frame, n):
    """Per n x n tile transpose of a (H, W) frame (XLA side)."""
    h, w = frame.shape
    return (frame.reshape(h // n, n, w // n, n)
                 .transpose(0, 2, 3, 1)
                 .reshape(h // n, w // n, n, n)
                 .transpose(0, 2, 1, 3)
                 .reshape(h, w))


def _default_interpret():
    # Pallas compiles only on real TPU backends; elsewhere use interpret
    # mode (bit-identical).
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("n", "forward", "interpret"))
def dct_frame_pallas(frame, n=8, forward=True, interpret=None):
    """Blockwise n x n forward/inverse DCT of a (H, W) int32 frame with
    the lifting chains executed as Pallas stripe kernels."""
    if interpret is None:
        interpret = _default_interpret()
    h, w = frame.shape
    assert h % n == 0 and w % n == 0
    if forward:
        z = _colpass(frame, n, True, interpret)
        z = _tile_t(z, n)
        z = _colpass(z, n, True, interpret)
        return _tile_t(z, n)
    z = _tile_t(frame, n)
    z = _colpass(z, n, False, interpret)
    z = _tile_t(z, n)
    return _colpass(z, n, False, interpret)
