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


def _block_sad(cur, pred_plane, y0, x0, n_y, n_x):
    a = cur[y0:y0 + n_y, x0:x0 + n_x].astype(np.int32)
    b = pred_plane[y0:y0 + n_y, x0:x0 + n_x].astype(np.int32)
    return int(np.abs(a - b).sum())


def _affected_l0_blocks(vx, vy, mvb_sz, nh, nv):
    """Level-0 (64px) mesh blocks overlapping the squares adjacent to the
    vertex; pred_block is re-run on these to evaluate a candidate."""
    D0 = MC.OD_MVB_DELTA0
    bx0 = max(0, (vx - mvb_sz) // D0 * D0)
    by0 = max(0, (vy - mvb_sz) // D0 * D0)
    bx1 = min(nh, vx + mvb_sz)
    by1 = min(nv, vy + mvb_sz)
    out = []
    by = by0
    while by < by1:
        bx = bx0
        while bx < bx1:
            out.append((bx, by))
            bx += D0
        by += D0
    return out


def _majority_ref(grid, vx, vy, mvb_sz, nh, nv):
    refs = []
    for dy, dx in ((-1, -1), (-1, 1), (1, 1), (1, -1), (-1, 0), (1, 0),
                   (0, -1), (0, 1)):
        cy = vy + dy * mvb_sz
        cx = vx + dx * mvb_sz
        if 0 <= cy <= nv and 0 <= cx <= nh and grid.valid[cy, cx]:
            refs.append(int(grid.ref[cy, cx]))
    if not refs:
        return MC.OD_FRAME_PREV
    return max(set(refs), key=refs.count)


def refine_mesh(grid: MVGrid, cur_luma, ref_images, info, lam_sad,
                search_range=8, max_level=2):
    """Encoder-side adaptive mesh subdivision.

    TPU-friendly replacement for the reference's decimation-heap + Viterbi
    refinement (reference: src/mcenc.c:4019,5211): instead of starting
    from the finest mesh and merging, we start from the level-0 mesh
    (already estimated) and greedily SPLIT where the true OBMC prediction
    SAD improves by more than lam_sad (an RD threshold covering the split
    flag + MV delta cost).  Candidate order and validity exactly mirror
    the bitstream's mesh coding order, so every accepted vertex is
    codeable.

    ref_images: {ref_index: RefImage} — used both for MV search and for
    the OBMC re-prediction.
    """
    h, w = cur_luma.shape
    pad = MC.OD_BUFFER_PADDING
    nv, nh = grid.nvmvbs, grid.nhmvbs
    clamp = MC.OD_UMV_CLAMP * 8
    ref_imgs = [None] * 4
    ref_imgi = [-1] * 4
    slots = {}
    for i, (ridx, rimg) in enumerate(ref_images.items()):
        ref_imgs[i] = rimg
        slots[ridx] = i
    for ridx, i in slots.items():
        ref_imgi[ridx] = i
    if ref_imgi[MC.OD_FRAME_PREV] < 0 and MC.OD_FRAME_NEXT in slots:
        ref_imgi[MC.OD_FRAME_PREV] = slots[MC.OD_FRAME_NEXT]
    if ref_imgi[MC.OD_FRAME_NEXT] < 0 and MC.OD_FRAME_PREV in slots:
        ref_imgi[MC.OD_FRAME_NEXT] = slots[MC.OD_FRAME_PREV]
    ref_imgi[MC.OD_FRAME_GOLD] = ref_imgi[MC.OD_FRAME_PREV]
    scratch = np.zeros((h, w), np.uint8)

    cur_u8 = np.ascontiguousarray(cur_luma, np.uint8)

    def eval_blocks(blocks):
        sad = 0
        for bx, by in blocks:
            r = MC.pred_l0_native(grid, ref_imgs, ref_imgi, info, scratch,
                                  0, bx, by, cur=cur_u8)
            if r is not None:
                sad += r
                continue
            MC.pred_block(grid, ref_imgs, ref_imgi, info, scratch, 0,
                          bx, by, MC.OD_LOG_MVB_DELTA0)
            y0 = by << MC.OD_LOG_MVBSIZE_MIN
            x0 = bx << MC.OD_LOG_MVBSIZE_MIN
            n = MC.OD_MVB_DELTA0 << MC.OD_LOG_MVBSIZE_MIN
            sad += _block_sad(cur_luma, scratch, y0, x0,
                              min(n, h - y0), min(n, w - x0))
        return sad

    def try_vertex(vx, vy, mvb_sz):
        blocks = _affected_l0_blocks(vx, vy, mvb_sz, nh, nv)
        sad0 = eval_blocks(blocks)
        ridx = _majority_ref(grid, vx, vy, mvb_sz, nh, nv)
        rimg = ref_images.get(ridx)
        if rimg is None:
            ridx = next(iter(ref_images))
            rimg = ref_images[ridx]
        y0 = vy << MC.OD_LOG_MVBSIZE_MIN
        x0 = vx << MC.OD_LOG_MVBSIZE_MIN
        n = (2 * mvb_sz) << MC.OD_LOG_MVBSIZE_MIN
        dy, dx = full_pel_search(cur_luma, rimg.planes[0], pad, y0, x0, n,
                                 search_range, h, w)
        mv8 = subpel_refine(cur_luma, rimg.planes[0], pad, y0, x0, n,
                            (dy * 8, dx * 8), h, w)
        grid.valid[vy, vx] = 1
        grid.ref[vy, vx] = ridx
        mvx = int(np.clip(mv8[1], -clamp, clamp))
        mvy = int(np.clip(mv8[0], -clamp, clamp))
        if ridx == MC.OD_FRAME_NEXT:
            grid.mv1[vy, vx] = (mvx, mvy)
        else:
            grid.mv[vy, vx] = (mvx, mvy)
        sad1 = eval_blocks(blocks)
        if sad0 - sad1 > lam_sad:
            return True
        grid.valid[vy, vx] = 0
        grid.ref[vy, vx] = 0
        grid.mv[vy, vx] = (0, 0)
        grid.mv1[vy, vx] = (0, 0)
        return False

    level = 1
    log_mvb_sz = MC.OD_LOG_MVB_DELTA0 - 1
    while log_mvb_sz >= 0 and level <= max_level:
        mvb_sz = 1 << log_mvb_sz
        # Odd level: square centers, all 4 diagonal corners must be valid.
        for vy in range(mvb_sz, nv + 1, 2 * mvb_sz):
            for vx in range(mvb_sz, nh + 1, 2 * mvb_sz):
                if (grid.valid[vy - mvb_sz, vx - mvb_sz]
                        and grid.valid[vy - mvb_sz, vx + mvb_sz]
                        and grid.valid[vy + mvb_sz, vx + mvb_sz]
                        and grid.valid[vy + mvb_sz, vx - mvb_sz]):
                    try_vertex(vx, vy, mvb_sz)
        level += 1
        if level > max_level:
            break
        # Even level: edge midpoints, axial neighbors (clipped) valid.
        for vy in range(0, nv + 1, mvb_sz):
            vx0 = mvb_sz if not (vy & mvb_sz) else 0
            for vx in range(vx0, nh + 1, 2 * mvb_sz):
                ok = ((vy - mvb_sz < 0 or grid.valid[vy - mvb_sz, vx])
                      and (vx - mvb_sz < 0 or grid.valid[vy, vx - mvb_sz])
                      and (vy + mvb_sz > nv or grid.valid[vy + mvb_sz, vx])
                      and (vx + mvb_sz > nh
                           or grid.valid[vy, vx + mvb_sz]))
                if ok:
                    try_vertex(vx, vy, mvb_sz)
        level += 1
        log_mvb_sz -= 1


def refine_mvs(grid: MVGrid, cur_luma, ref_images, info, lam_sad,
               iters=2):
    """Iterated local MV refinement against the true OBMC objective.

    Lightweight counterpart of the reference's row/column Viterbi passes
    (reference: od_mv_est_refine_row/col, src/mcenc.c:5211,5875): visit
    every valid vertex in raster order and try a small candidate set —
    neighbors' MVs, the zero MV, and +-{1,2} 1/8-pel perturbations — and
    keep a candidate only if the OBMC SAD over the blocks the vertex
    influences improves by more than a small rate bias.  Unlike a
    template-matching search, this accounts for the overlapped blending
    with neighboring vertices, which is what the greedy per-vertex
    estimate misses.
    """
    h, w = cur_luma.shape
    nv, nh = grid.nvmvbs, grid.nhmvbs
    clamp = MC.OD_UMV_CLAMP * 8
    ref_imgs = [None] * 4
    ref_imgi = [-1] * 4
    slots = {}
    for i, (ridx, rimg) in enumerate(ref_images.items()):
        ref_imgs[i] = rimg
        slots[ridx] = i
    for ridx, i in slots.items():
        ref_imgi[ridx] = i
    if ref_imgi[MC.OD_FRAME_PREV] < 0 and MC.OD_FRAME_NEXT in slots:
        ref_imgi[MC.OD_FRAME_PREV] = slots[MC.OD_FRAME_NEXT]
    if ref_imgi[MC.OD_FRAME_NEXT] < 0 and MC.OD_FRAME_PREV in slots:
        ref_imgi[MC.OD_FRAME_NEXT] = slots[MC.OD_FRAME_PREV]
    ref_imgi[MC.OD_FRAME_GOLD] = ref_imgi[MC.OD_FRAME_PREV]
    scratch = np.zeros((h, w), np.uint8)
    D0 = MC.OD_MVB_DELTA0
    cur32 = cur_luma.astype(np.int32)

    cur_u8 = np.ascontiguousarray(cur_luma, np.uint8)

    def eval_blocks(blocks):
        sad = 0
        for bx, by in blocks:
            r = MC.pred_l0_native(grid, ref_imgs, ref_imgi, info, scratch,
                                  0, bx, by, cur=cur_u8)
            if r is not None:
                sad += r
                continue
            MC.pred_block(grid, ref_imgs, ref_imgi, info, scratch, 0,
                          bx, by, MC.OD_LOG_MVB_DELTA0)
            y0 = by << MC.OD_LOG_MVBSIZE_MIN
            x0 = bx << MC.OD_LOG_MVBSIZE_MIN
            n = D0 << MC.OD_LOG_MVBSIZE_MIN
            ny = min(n, h - y0)
            nx = min(n, w - x0)
            a = cur32[y0:y0 + ny, x0:x0 + nx]
            b = scratch[y0:y0 + ny, x0:x0 + nx].astype(np.int32)
            sad += int(np.abs(a - b).sum())
        return sad

    def affected(vx, vy):
        out = []
        for by in range((max(0, vy - D0) // D0) * D0, min(vy + 1, nv), D0):
            for bx in range((max(0, vx - D0) // D0) * D0,
                            min(vx + 1, nh), D0):
                out.append((bx, by))
        return out

    verts = [(vy, vx) for vy in range(0, nv + 1)
             for vx in range(0, nh + 1) if grid.valid[vy, vx]]
    for _ in range(iters):
        changed = 0
        for vy, vx in verts:
            use1 = grid.ref[vy, vx] == MC.OD_FRAME_NEXT
            mvarr = grid.mv1 if use1 else grid.mv
            cur_mv = (int(mvarr[vy, vx, 0]), int(mvarr[vy, vx, 1]))
            blocks = affected(vx, vy)
            best_sad = eval_blocks(blocks)
            best_mv = cur_mv
            cands = {(0, 0)}
            neigh_cands = set()
            for dy, dx in ((-D0, 0), (D0, 0), (0, -D0), (0, D0)):
                ny_, nx_ = vy + dy, vx + dx
                if 0 <= ny_ <= nv and 0 <= nx_ <= nh \
                        and grid.valid[ny_, nx_]:
                    narr = grid.mv1 if use1 else grid.mv
                    c = (int(narr[ny_, nx_, 0]), int(narr[ny_, nx_, 1]))
                    cands.add(c)
                    neigh_cands.add(c)
            for step in (1, 2):
                for ddy, ddx in ((0, step), (0, -step), (step, 0),
                                 (-step, 0)):
                    cands.add((cur_mv[0] + ddx, cur_mv[1] + ddy))
            cands.discard(cur_mv)
            for cand in cands:
                cx = int(np.clip(cand[0], -clamp, clamp))
                cy = int(np.clip(cand[1], -clamp, clamp))
                mvarr[vy, vx] = (cx, cy)
                sad = eval_blocks(blocks)
                # Require the prediction gain to clear the same RD bar
                # as subdivision (MV-delta bits), with a small bonus for
                # candidates copied from neighbors (cheaper to code and
                # they smooth the field).
                margin = lam_sad
                if cand in neigh_cands:
                    margin = -(lam_sad >> 1)
                if sad + margin < best_sad:
                    best_sad = sad
                    best_mv = (cx, cy)
                    changed += 1
            mvarr[vy, vx] = best_mv
        if not changed:
            break
