"""Motion estimation (encoder side, non-normative).

A TPU-friendly redesign of the reference's mesh ME (reference:
src/mcenc.c): instead of the sequential BMA + decimation heap + row/col
Viterbi refinement, we do a dense windowed block search per level-0 vertex,
fully vectorizable, followed by subpel refinement using the exact
normative interpolation (mc.predict1fmv), so the SAD we minimize is the
SAD the decoder's prediction will realize.

The mesh is kept at level 0 (uniform 64x64 OBMC blocks).  Finer mesh
subdivision is an RD refinement to be added with the perf work; streams
are valid either way.
"""

from __future__ import annotations

import numpy as np

from daala_tpu.codec import mc as MC


def _block_window(plane_pad, pad, y0, x0, n, h, w):
    """The search template: the n x n region centered on the vertex,
    clipped to the frame."""
    ya = max(0, y0 - n // 2)
    xa = max(0, x0 - n // 2)
    yb = min(h, y0 + n // 2)
    xb = min(w, x0 + n // 2)
    return ya, xa, yb, xb


def full_pel_search(cur, ref_pad, pad, y0, x0, n, search_range, h, w):
    """Exhaustive full-pel SAD search of the clipped window centered at
    (y0, x0); returns (mvy, mvx) in pixels."""
    ya, xa, yb, xb = _block_window(None, pad, y0, x0, n, h, w)
    if yb <= ya or xb <= xa:
        return 0, 0
    tpl = cur[ya:yb, xa:xb].astype(np.int32)
    best = None
    best_mv = (0, 0)
    r = search_range
    # Vectorize over candidate rows: build SAD surface row by row.
    for dy in range(-r, r + 1):
        sy = pad + ya + dy
        row = ref_pad[sy:sy + (yb - ya), pad + xa - r:pad + xb + r]
        rowi = row.astype(np.int32)
        for dx in range(-r, r + 1):
            cand = rowi[:, r + dx:r + dx + (xb - xa)]
            sad = int(np.abs(cand - tpl).sum())
            # Bias toward the zero vector to stabilize flat areas.
            cost = sad + 2 * (abs(dx) + abs(dy))
            if best is None or cost < best:
                best = cost
                best_mv = (dy, dx)
    return best_mv


def subpel_refine(cur, ref_pad, pad, y0, x0, n, mv8, h, w):
    """Refine the 1/8-pel MV around the current candidate using the
    normative subpel interpolation."""
    ya, xa, yb, xb = _block_window(None, pad, y0, x0, n, h, w)
    if yb <= ya or xb <= xa:
        return mv8
    tpl = cur[ya:yb, xa:xb].astype(np.int32)
    best_mv = mv8
    best = None
    for step in (4, 2, 1):
        improved = True
        while improved:
            improved = False
            for dmy, dmx in ((0, step), (0, -step), (step, 0), (-step, 0)):
                cand = (best_mv[0] + dmy, best_mv[1] + dmx)
                pred = MC.predict1fmv(ref_pad, pad, ya, xa, cand[1],
                                      cand[0], yb - ya, xb - xa)
                sad = int(np.abs(pred.astype(np.int32) - tpl).sum())
                if best is None:
                    base = MC.predict1fmv(ref_pad, pad, ya, xa, best_mv[1],
                                          best_mv[0], yb - ya, xb - xa)
                    best = int(np.abs(base.astype(np.int32) - tpl).sum())
                if sad < best:
                    best = sad
                    best_mv = cand
                    improved = True
    return best_mv


def estimate(grid: MC.MVGrid, cur_luma, ref_img, info, search_range=16,
             ref_index=MC.OD_FRAME_PREV):
    """Fill the MV grid: level-0 vertices only (all valid), MVs against
    the given reference image, 1/8-pel precision."""
    grid.clear()
    h, w = cur_luma.shape
    ref_pad = ref_img.planes[0]
    pad = MC.OD_BUFFER_PADDING
    D0 = MC.OD_MVB_DELTA0
    clamp = MC.OD_UMV_CLAMP * 8
    for vy in range(0, grid.nvmvbs + 1, D0):
        for vx in range(0, grid.nhmvbs + 1, D0):
            y0 = vy << MC.OD_LOG_MVBSIZE_MIN
            x0 = vx << MC.OD_LOG_MVBSIZE_MIN
            dy, dx = full_pel_search(cur_luma, ref_pad, pad, y0, x0, 64,
                                     search_range, h, w)
            mv8 = subpel_refine(cur_luma, ref_pad, pad, y0, x0, 64,
                                (dy * 8, dx * 8), h, w)
            grid.valid[vy, vx] = 1
            grid.ref[vy, vx] = ref_index
            grid.mv[vy, vx, 0] = int(np.clip(mv8[1], -clamp, clamp))
            grid.mv[vy, vx, 1] = int(np.clip(mv8[0], -clamp, clamp))


def estimate_multi(grid: MC.MVGrid, cur_luma, refs, info, search_range=16):
    """Multi-reference level-0 estimation: refs is a list of
    (ref_index, RefImage); each vertex picks the reference with the best
    refined SAD (B-frames pick between PREV and NEXT per vertex)."""
    grid.clear()
    h, w = cur_luma.shape
    pad = MC.OD_BUFFER_PADDING
    D0 = MC.OD_MVB_DELTA0
    clamp = MC.OD_UMV_CLAMP * 8
    for vy in range(0, grid.nvmvbs + 1, D0):
        for vx in range(0, grid.nhmvbs + 1, D0):
            y0 = vy << MC.OD_LOG_MVBSIZE_MIN
            x0 = vx << MC.OD_LOG_MVBSIZE_MIN
            best = None
            for ref_index, ref_img in refs:
                ref_pad = ref_img.planes[0]
                dy, dx = full_pel_search(cur_luma, ref_pad, pad, y0, x0,
                                         64, search_range, h, w)
                mv8 = subpel_refine(cur_luma, ref_pad, pad, y0, x0, 64,
                                    (dy * 8, dx * 8), h, w)
                ya, xa, yb, xb = _block_window(None, pad, y0, x0, 64, h, w)
                if yb <= ya or xb <= xa:
                    sad = 0
                else:
                    pred = MC.predict1fmv(ref_pad, pad, ya, xa, mv8[1],
                                          mv8[0], yb - ya, xb - xa)
                    sad = int(np.abs(
                        pred.astype(np.int32)
                        - cur_luma[ya:yb, xa:xb].astype(np.int32)).sum())
                if best is None or sad < best[0]:
                    best = (sad, ref_index, mv8)
            _, ref_index, mv8 = best
            grid.valid[vy, vx] = 1
            grid.ref[vy, vx] = ref_index
            mvx = int(np.clip(mv8[1], -clamp, clamp))
            mvy = int(np.clip(mv8[0], -clamp, clamp))
            if ref_index == MC.OD_FRAME_NEXT:
                grid.mv1[vy, vx, 0] = mvx
                grid.mv1[vy, vx, 1] = mvy
            else:
                grid.mv[vy, vx, 0] = mvx
                grid.mv[vy, vx, 1] = mvy
