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
    """cur_vis: (vh, vw) int32 visible current luma; ref_win:
    (vh + 2r, vw + 2r) int32 reference window starting at (-r, -r).
    Returns (noff, nvb, nhb) int32 per-vertex window SADs, offsets in
    row-major (dy, dx) order, dy, dx in [-r, r]."""
    vh, vw = cur_vis.shape
    ch = -(-vh // _CELL)
    cw = -(-vw // _CELL)
    offs = jnp.arange((2 * r + 1) * (2 * r + 1), dtype=jnp.int32)

    def one(off):
        dy = off // (2 * r + 1)
        dx = off % (2 * r + 1)
        ref = jax.lax.dynamic_slice(ref_win, (dy, dx), (vh, vw))
        d = jnp.abs(cur_vis - ref)
        # Cell sums over the ceil grid (zero pad beyond vis).
        d = jnp.pad(d, ((0, ch * _CELL - vh), (0, cw * _CELL - vw)))
        cells = d.reshape(ch, _CELL, cw, _CELL).sum((1, 3))
        # Vertex windows: pad 4 cells of zeros on each side; vertex
        # (i, j) covers padded cell rows [8i, 8i+8).
        cp = jnp.zeros((nvb * _WIN_CELLS, nhb * _WIN_CELLS), jnp.int32)
        cp = jax.lax.dynamic_update_slice(cp, cells, (4, 4))
        return cp.reshape(nvb, _WIN_CELLS, nhb, _WIN_CELLS).sum((1, 3))

    return jax.lax.map(one, offs)


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
    cur_vis = np.asarray(cur[:vis_h, :vis_w], np.int32)
    if device_put_fn is not None:
        cur_vis = device_put_fn(cur_vis, 0)
    out = []
    for rp in refs_padded:
        win = np.asarray(
            rp[pad - r:pad + vis_h + r, pad - r:pad + vis_w + r],
            np.int32)
        if device_put_fn is not None:
            win = device_put_fn(win, 0)
        t = _fullpel_fields(jnp.asarray(cur_vis), jnp.asarray(win),
                            r, nvb, nhb)
        out.append(np.asarray(t, np.int32))
    return out
