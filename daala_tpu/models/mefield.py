"""Device motion-search cost fields.

The encoder-side BMA init (native/me_enc.inc estimate_multi; reference
intent: the SAD pyramid of od_mv_est_init_mvs, src/mcenc.c:1333-1613,
:3031) evaluates every level-0 vertex against a dense +/-R full-pel
window, and the global motion search evaluates the same window over the
whole visible frame.  Both are decision-independent of the raster-scan
predictor chain — only the *rate* addend and the argmin are sequential —
so the complete SAD fields batch as one device pass:

  for each offset (dy, dx) in the (2R+1)^2 window:
    D = |cur - ref shifted by (dy, dx)| over the visible area
    cell-sum D into the 8x8-cell grid
    window-sum the cells into the level-0 vertex windows
      (each vertex's window [y0-32, y0+32) x [x0-32, x0+32) clipped to
       the visible frame is exactly an 8x8-cell block of a zero-padded
       cell grid, and the windows tile the frame, so the global-search
       SAD is the sum of the per-vertex window SADs)

The host consumes the fields in full_pel_search / global_mv_search via
exact lookup (same strict-< row-major argmin, same rate model), making
the decisions bit-identical to the direct computation
(tests/test_mefield.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# Level-0 vertex spacing: 64 px = 8 cells of 8 px (mc.py
# OD_LOG_MVBSIZE_MIN + OD_LOG_MVB_DELTA0).
_CELL = 8
_WIN_CELLS = 8  # 64-px window = 8 cells


@functools.partial(jax.jit, static_argnames=("r", "nvb", "nhb"))
def _fullpel_fields(cur_vis, ref_win, r, nvb, nhb):
    """cur_vis: (vh, vw) visible current luma; ref_win:
    (vh + 2r, vw + 2r) reference window starting at (-r, -r).
    Returns (noff, nvb, nhb) int32 per-vertex window SADs, offsets in
    row-major (dy, dx) order, dy, dx in [-r, r].

    Bandwidth-shaped for the VPU: the scan body works in int16 (a cell
    SAD is at most 64*255 < 2^15) and emits only the (ch, cw) cell
    grid; the window gather/sum over all offsets happens once, batched,
    at the end."""
    vh, vw = cur_vis.shape
    ch = -(-vh // _CELL)
    cw = -(-vw // _CELL)
    # Pad once, outside the scan, to cell-aligned int16 buffers; the
    # visibility mask zeroes the partial-cell overhang instead of a
    # per-iteration pad.
    py, px = ch * _CELL - vh, cw * _CELL - vw
    cur16 = jnp.pad(cur_vis.astype(jnp.int16), ((0, py), (0, px)))
    ref16 = jnp.pad(ref_win.astype(jnp.int16), ((0, py), (0, px)))
    mask = jnp.pad(jnp.ones((vh, vw), jnp.int16), ((0, py), (0, px)))
    noffd = 2 * r + 1
    offs = jnp.arange(noffd * noffd, dtype=jnp.int32)

    def one(off):
        dy = off // noffd
        dx = off % noffd
        ref = jax.lax.dynamic_slice(ref16, (dy, dx),
                                    (ch * _CELL, cw * _CELL))
        d = jnp.abs(cur16 - ref) * mask
        return (d.reshape(ch, _CELL, cw * _CELL)
                 .sum(1, dtype=jnp.int16)
                 .reshape(ch, cw, _CELL)
                 .sum(2, dtype=jnp.int16))

    cells = jax.lax.map(one, offs)  # (noff, ch, cw) int16
    # Vertex windows: 4 zero cells of margin on each side turns every
    # clipped window into a uniform 8x8-cell block (vertex (i, j) covers
    # padded cell rows [8i, 8i+8)); both inputs are zero beyond the
    # visible area so the margin cells carry no SAD.
    cp = jnp.zeros((cells.shape[0], nvb * _WIN_CELLS, nhb * _WIN_CELLS),
                   jnp.int32)
    cp = jax.lax.dynamic_update_slice(cp, cells.astype(jnp.int32),
                                      (0, 4, 4))
    return cp.reshape(-1, nvb, _WIN_CELLS, nhb, _WIN_CELLS).sum((2, 4))


def fullpel_sad_fields(cur, refs_padded, pad, vis, nvmvbs, nhmvbs, r=16,
                       device_put_fn=None):
    """Compute the full-pel SAD fields for every search reference.

    cur: (H, W) uint8 current luma (frame-sized); refs_padded: list of
    padded uint8 reference planes; vis = (vis_h, vis_w).  Returns a list
    of numpy int32 (noff, nvb, nhb) tensors, one per reference, where
    nvb = nvmvbs // 8 + 1, nhb = nhmvbs // 8 + 1.  The global-search SAD
    field is their sum over (nvb, nhb)."""
    vis_h, vis_w = vis
    nvb = nvmvbs // 8 + 1
    nhb = nhmvbs // 8 + 1
    # Ship the planes in their native 8-bit MC-view dtype and upcast on
    # device (the kernel immediately widens to int16): uploading int32
    # copies of two 1080p planes was 17 MB/frame of the lean tier's
    # 22 MB h2d total (measured with DAALA_DEVSTATS_SITES).
    cur_vis = np.ascontiguousarray(cur[:vis_h, :vis_w])
    if device_put_fn is not None:
        cur_vis = device_put_fn(cur_vis, 0)
    from daala_tpu.utils import devstats
    pending = []
    for rp in refs_padded:
        win = np.ascontiguousarray(
            rp[pad - r:pad + vis_h + r, pad - r:pad + vis_w + r])
        if device_put_fn is not None:
            win = device_put_fn(win, 0)
        devstats.dispatch(cur_vis, win)
        pending.append(_fullpel_fields(jnp.asarray(cur_vis),
                                       jnp.asarray(win), r, nvb, nhb))
    devstats.prefetch(*pending)
    return [devstats.fetch(t, np.int32) for t in pending]
