"""Pallas OBMC leaf kernels.

The XLA formulation of the per-leaf corner-window fetch (models/obmc.py
predict_leaves) lowers to TPU gathers at ~30-150 ms per class; these
kernels DMA each leaf's 4 corner windows HBM->VMEM with dynamic offsets
and run the 6-tap subpel filters + merged blend on the VPU.

Mosaic constraints shape the layout:
- DMA starts must honor the (8, 128) VMEM tiling -> align the window
  origin down, copy a widened (n+16, 256) block, realign with dynamic
  rotates (pltpu.roll); the planes carry margins (stage_planes_i32).
- SMEM rows of scalar-prefetch operands cost 512 bytes each -> all DMA
  addressing packs into ONE (L, 16) array ([0:4] srcs, [4:8] sy,
  [8:12] sx, [12] wsel, [13] py, [14] px), callers chunk L at 1024.
- Filter taps arrive as a per-leaf VMEM block (L, 4, 16) gathered
  outside the kernel ([:, k, 0:6] horizontal, [:, k, 8:14] vertical).

Entry points (bit-exact with models/obmc.py, the interpret/CPU
reference):
  obmc_blend_pallas      -> (L, n, n) int32 blended leaf predictions
  obmc_leaf_cells_pallas -> (L, n/8, n/8) int32 per-8px-cell SADs

Reference chain: od_state_pred_block_from_setup (src/state.c:628-672),
od_mc_predict1fmv8 (src/mc.c:92-206), od_mc_blend_full/full_split
(src/mc.c:352-378,1650-1750).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_CHUNK = 1024  # SMEM budget: 1024 rows x 512 B = 512 KiB


def _corner_pred(win, taps_ref, k, n, hi):
    """One corner's subpel prediction from its (n+5, n+5) int32 window
    (VMEM); taps_ref is the (1, 4, 16) per-leaf tap block."""
    buff = jnp.zeros((n + 5, n), jnp.int32)
    for m in range(6):
        buff = buff + win[:, m:m + n] * taps_ref[0, k, m]
    if hi:
        buff = buff - (128 << 11)
    else:
        buff = buff - (128 << 7)
        buff = buff.astype(jnp.int16).astype(jnp.int32)
    acc = jnp.zeros((n, n), jnp.int32)
    for m in range(6):
        acc = acc + buff[m:m + n, :] * taps_ref[0, k, 8 + m]
    if hi:
        return jnp.clip(((acc + (1 << 13)) >> 14) + (128 << 4),
                        0, (1 << 12) - 1)
    return jnp.clip((acc + (1 << 13) + (128 << 14)) >> 14, 0, 255)


def _blend_body(n, hi, scal_ref, planes_ref, wtab_ref, taps_ref,
                win_scr, sems, emit):
    i = pl.program_id(0)
    nw = n + 5

    def dma(k):
        sy = scal_ref[i, 4 + k]
        sx = scal_ref[i, 8 + k]
        sy_al = pl.multiple_of((sy >> 3) << 3, 8)
        sx_al = pl.multiple_of((sx >> 7) << 7, 128)
        return pltpu.make_async_copy(
            planes_ref.at[scal_ref[i, k],
                          pl.ds(sy_al, n + 16),
                          pl.ds(sx_al, 256)],
            win_scr.at[k], sems.at[k])

    for k in range(4):
        dma(k).start()
    preds = []
    for k in range(4):
        dma(k).wait()
        row_off = scal_ref[i, 4 + k] & 7
        col_off = scal_ref[i, 8 + k] & 127
        # pltpu.roll shifts forward only: rolling by (size - off) brings
        # index `off` to 0.
        rsh = jnp.where(row_off == 0, 0, (n + 16) - row_off)
        csh = jnp.where(col_off == 0, 0, 256 - col_off)
        w = pltpu.roll(win_scr[k], rsh, 0)
        w = pltpu.roll(w, csh, 1)
        preds.append(_corner_pred(w[0:nw, 0:nw], taps_ref, k, n, hi))
    lb2p1 = 2 * (n.bit_length() - 1) + 1
    wsel = scal_ref[i, 12]
    accb = (preds[0] << lb2p1) + (1 << (lb2p1 - 1))
    for k in range(1, 4):
        sw = wtab_ref[pl.ds(wsel * 4 + k, 1), :, :][0]
        accb = accb + (preds[k] - preds[0]) * sw
    emit(accb >> lb2p1)


@functools.partial(jax.jit, static_argnames=("n", "hi", "interpret"))
def _blend_chunk(planes_i32, wtab64, taps, scal, n, hi, interpret):
    L = scal.shape[0]

    def kernel(scal_ref, planes_ref, wtab_ref, taps_ref, out_ref,
               win_scr, sems):
        def emit(v):
            out_ref[0] = v
        _blend_body(n, hi, scal_ref, planes_ref, wtab_ref, taps_ref,
                    win_scr, sems, emit)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((64, n, n), lambda i, *_: (0, 0, 0)),
                  pl.BlockSpec((1, 4, 16), lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, n), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, n + 16, 256), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n, n), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, planes_i32, wtab64, taps)


@functools.partial(jax.jit,
                   static_argnames=("n", "hi", "vh", "vw", "interpret"))
def _cells_chunk(planes_i32, cur_i32, wtab64, taps, scal, n, vh, vw, hi,
                 interpret):
    L = scal.shape[0]
    nc = n // 8

    def kernel(scal_ref, planes_ref, wtab_ref, taps_ref, cur_ref,
               out_ref, win_scr, sems, cur_scr, csem):
        i = pl.program_id(0)

        def cdma():
            py = pl.multiple_of(scal_ref[i, 13], 8)
            px_al = pl.multiple_of((scal_ref[i, 14] >> 7) << 7, 128)
            return pltpu.make_async_copy(
                cur_ref.at[pl.ds(py, n), pl.ds(px_al, 256)],
                cur_scr.at[:], csem)

        cdma().start()

        def emit(blend):
            cdma().wait()
            coff = scal_ref[i, 14] & 127
            cur = pltpu.roll(cur_scr[:],
                             jnp.where(coff == 0, 0, 256 - coff), 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            mask = ((rows < vh - scal_ref[i, 13])
                    & (cols < vw - scal_ref[i, 14]))
            d = jnp.where(mask, jnp.abs(blend - cur[:, 0:n]), 0)
            # Sublane reduction to 8-row bands; the lane reduction to
            # cells happens in XLA outside the kernel.
            out_ref[0] = d.reshape(nc, 8, n).sum(1)

        _blend_body(n, hi, scal_ref, planes_ref, wtab_ref, taps_ref,
                    win_scr, sems, emit)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((64, n, n), lambda i, *_: (0, 0, 0)),
                  pl.BlockSpec((1, 4, 16), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, nc, n), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, n + 16, 256), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((n, 256), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    bands = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, nc, n), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, planes_i32, wtab64, taps, cur_i32)
    return bands.reshape(L, nc, nc, 8).sum(3)


def obmc_blend_pallas(planes_i32, wtab64, taps, scal, n, hi=False,
                      interpret=False):
    """(L, n, n) int32 blended leaf predictions; chunks L to fit the
    SMEM scalar budget."""
    L = scal.shape[0]
    if L <= MAX_CHUNK:
        return _blend_chunk(planes_i32, wtab64, taps, scal, n, hi,
                            interpret)
    outs = []
    for a in range(0, L, MAX_CHUNK):
        outs.append(_blend_chunk(planes_i32, wtab64,
                                 taps[a:a + MAX_CHUNK],
                                 scal[a:a + MAX_CHUNK], n, hi,
                                 interpret))
    return jnp.concatenate(outs, 0)


def obmc_leaf_cells_pallas(planes_i32, cur_i32, wtab64, taps, scal, n,
                           vh, vw, hi=False, interpret=False):
    """(L, n//8, n//8) int32 per-8px-cell SADs of each predicted leaf vs
    the current frame, clipped to the visible area."""
    L = scal.shape[0]
    if L <= MAX_CHUNK:
        return _cells_chunk(planes_i32, cur_i32, wtab64, taps, scal, n,
                            vh, vw, hi, interpret)
    outs = []
    for a in range(0, L, MAX_CHUNK):
        outs.append(_cells_chunk(planes_i32, cur_i32, wtab64,
                                 taps[a:a + MAX_CHUNK],
                                 scal[a:a + MAX_CHUNK], n, vh, vw, hi,
                                 interpret))
    return jnp.concatenate(outs, 0)
