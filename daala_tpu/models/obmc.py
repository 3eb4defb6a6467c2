"""Device OBMC prediction engine.

Re-expresses the recursive per-leaf OBMC predictor (codec/mc.py
pred_block / pred_block_from_setup; reference: od_state_pred_block,
src/state.c:628-724, od_mc_predict1fmv8/16, src/mc.c:92-340, blenders
src/mc.c:352-378,1650-1750) TPU-first: the host walks the mesh once and
emits flat per-size-class leaf lists; the device then predicts every
leaf of a class in one batched pass:

  gather (L, 4, n+5, n+5) corner windows from the 4 reference planes
  -> 6-tap horizontal filter (per-corner 1/8-pel phase via table take)
  -> int16 wraparound (the reference's normative od_mc buffer width)
  -> 6-tap vertical filter -> clip
  -> merged-weight blend with a (oc, s) weight-plane table
  -> disjoint scatter into the frame

Two identities make the single code path exact (no per-leaf branching):
a zero fractional phase through the 6-tap path reproduces the whole-pel
copy bit-for-bit, and od_mc_blend_full equals od_mc_blend_full_split
evaluated with the s=3 setup weights (all terms are even, so the extra
bit of shift cancels).  Verified bit-exact against mc.py in
tests/test_obmc_device.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from daala_tpu.codec.mc import (OD_LOG_MVB_DELTA0, OD_MVB_DELTA0,
                                OD_BUFFER_PADDING, OD_VERT_DX, OD_VERT_DY,
                                SUBPEL_FILTER_SET, VERT_SETUP_DX,
                                VERT_SETUP_DY, _setup_s_split, div_pow2_re)


def build_leaf_lists(grid, info, pli):
    """Walk the mesh (pred_block recursion) and emit per-size-class leaf
    arrays for the device pass.

    Returns {log_mvb_sz: dict(pos=(L,2) [y,x] plane px, srcs=(L,4) uint8
    frame slots, mvs=(L,4,2) [mvx,mvy] plane 1/8-pel, ocs=(L,), ss=(L,))}
    in raster-scan leaf order."""
    xdec, ydec = info.plane_dec[pli]
    nh, nv = grid.nhmvbs, grid.nvmvbs
    valid = grid.valid
    ref = grid.ref
    mv = grid.mv
    mv1 = grid.mv1
    out = {}

    def leaf(vx, vy, lms, oc, s):
        dxp = VERT_SETUP_DX[oc][s]
        dyp = VERT_SETUP_DY[oc][s]
        srcs = np.empty(4, np.int32)
        mvs = np.empty((4, 2), np.int32)
        for k in range(4):
            gy = vy + dyp[k] * (1 << lms)
            gx = vx + dxp[k] * (1 << lms)
            r = ref[gy, gx]
            m = mv1 if r == 2 else mv
            srcs[k] = r
            mvs[k, 0] = div_pow2_re(int(m[gy, gx, 0]), xdec)
            mvs[k, 1] = div_pow2_re(int(m[gy, gx, 1]), ydec)
        cls = out.setdefault(lms, {"pos": [], "srcs": [], "mvs": [],
                                   "ocs": [], "ss": []})
        cls["pos"].append((vy << (3 - ydec), vx << (3 - xdec)))
        cls["srcs"].append(srcs)
        cls["mvs"].append(mvs)
        cls["ocs"].append(oc)
        cls["ss"].append(s)

    def rec(vx, vy, lms):
        half = 1 << lms >> 1
        if lms > 0 and valid[vy + half, vx + half]:
            rec(vx, vy, lms - 1)
            rec(vx + half, vy, lms - 1)
            rec(vx, vy + half, lms - 1)
            rec(vx + half, vy + half, lms - 1)
            return
        if lms < OD_LOG_MVB_DELTA0:
            mask = (1 << (lms + 1)) - 1
            oc = 1 if (vx & mask) else 0
            if vy & mask:
                oc = 3 - oc
            s1vx = vx + (OD_VERT_DX[(oc + 1) & 3] << lms)
            s1vy = vy + (OD_VERT_DY[(oc + 1) & 3] << lms)
            s3vx = vx + (OD_VERT_DX[(oc + 3) & 3] << lms)
            s3vy = vy + (OD_VERT_DY[(oc + 3) & 3] << lms)
            s = (int(valid[s1vy, s1vx]) | int(valid[s3vy, s3vx]) << 1)
        else:
            oc, s = 0, 3
        leaf(vx, vy, lms, oc, s)

    for vy in range(0, nv, OD_MVB_DELTA0):
        for vx in range(0, nh, OD_MVB_DELTA0):
            rec(vx, vy, OD_LOG_MVB_DELTA0)
    for lms, cls in out.items():
        cls["pos"] = np.asarray(cls["pos"], np.int32)
        cls["srcs"] = np.stack(cls["srcs"]).astype(np.int32)
        cls["mvs"] = np.stack(cls["mvs"]).astype(np.int32)
        cls["ocs"] = np.asarray(cls["ocs"], np.int32)
        cls["ss"] = np.asarray(cls["ss"], np.int32)
    return out


@functools.lru_cache(maxsize=None)
def _weight_table(log_x, log_y):
    """(4 oc, 4 s, 4 corner, ny, nx) int32 merged blend weight planes
    (mc.py _setup_s_split); the s=3 entry reproduces blend_full."""
    nx, ny = 1 << log_x, 1 << log_y
    i = np.arange(nx)[None, :]
    j = np.arange(ny)[:, None]
    tab = np.zeros((4, 4, 4, ny, nx), np.int32)
    for oc in range(4):
        for s in range(4):
            s0, dsdi, dsdj, dd = _setup_s_split(oc, s, log_x, log_y)
            for k in range(4):
                tab[oc, s, k] = (s0[k] + i * dsdi[k] + j * dsdj[k]
                                 + i * j * dd[k])
    return tab


_SUBPEL = np.asarray(SUBPEL_FILTER_SET, np.int32)


@functools.partial(jax.jit,
                   static_argnames=("log_x", "log_y", "pad", "hi"))
def predict_leaves(planes4, pos, srcs, mvs, ocs, ss, log_x, log_y, pad,
                   hi=False):
    """Predict all leaves of one size class: returns (L, ny, nx) blended
    blocks (uint8, or uint16 when hi)."""
    ny, nx = 1 << log_y, 1 << log_x
    sub = jnp.asarray(_SUBPEL)
    wtab = jnp.asarray(_weight_table(log_x, log_y))
    y = pos[:, 0]
    x = pos[:, 1]
    mvx = mvs[:, :, 0]
    mvy = mvs[:, :, 1]
    sy = pad + y[:, None] + (mvy >> 3) - 2      # (L, 4)
    sx = pad + x[:, None] + (mvx >> 3) - 2
    rows = sy[:, :, None] + jnp.arange(ny + 5)[None, None, :]
    cols = sx[:, :, None] + jnp.arange(nx + 5)[None, None, :]
    win = planes4[srcs[:, :, None, None],
                  rows[:, :, :, None],
                  cols[:, :, None, :]].astype(jnp.int32)  # (L,4,ny+5,nx+5)
    fx = sub[mvx & 7]                            # (L, 4, 6)
    fy = sub[mvy & 7]
    buff = jnp.zeros((win.shape[0], 4, ny + 5, nx), jnp.int32)
    for k in range(6):
        buff = buff + win[:, :, :, k:k + nx] * fx[:, :, k, None, None]
    if hi:
        buff = buff - (128 << 11)
    else:
        buff = buff - (128 << 7)
        buff = buff.astype(jnp.int16).astype(jnp.int32)
    acc = jnp.zeros((win.shape[0], 4, ny, nx), jnp.int32)
    for k in range(6):
        acc = acc + buff[:, :, k:k + ny, :] * fy[:, :, k, None, None]
    if hi:
        preds = jnp.clip(((acc + (1 << 13)) >> 14) + (128 << 4),
                         0, (1 << 12) - 1)
    else:
        preds = jnp.clip((acc + (1 << 13) + (128 << 14)) >> 14, 0, 255)
    # Blend: out = (p0 << (lb2+1) + sum_k (pk - p0) * sw_k + rnd) >> ...
    lb2p1 = log_x + log_y + 1
    sw = wtab[ocs, ss]                           # (L, 4, ny, nx)
    p0 = preds[:, 0]
    accb = (p0 << lb2p1) + (1 << (lb2p1 - 1))
    for k in range(1, 4):
        accb = accb + (preds[:, k] - p0) * sw[:, k]
    out = accb >> lb2p1
    return out.astype(jnp.uint16 if hi else jnp.uint8)


def predict_frame_plane_device(grid, ref_imgs, ref_imgi, info, pli,
                               device_put_fn=None, bucket=True,
                               planes4=None, classes=None,
                               return_device=False):
    """Whole-plane OBMC prediction on the device; returns the (h, w)
    predicted plane as numpy (uint8, or uint16 for FPR references), or
    the device array when return_device (so downstream device consumers
    skip the host round trip).  planes4/classes may be passed
    pre-staged."""
    xdec, ydec = info.plane_dec[pli]
    h = info.frame_height >> ydec
    w = info.frame_width >> xdec
    if planes4 is None:
        planes = []
        for r in range(4):
            idx = ref_imgi[r]
            if idx is None or idx < 0:
                idx = 0
            planes.append(np.asarray(ref_imgs[idx].planes[pli]))
        planes4 = np.stack(planes)
        if device_put_fn is not None:
            planes4 = device_put_fn(planes4, pli)
        planes4 = jnp.asarray(planes4)
    hi = planes4.dtype == jnp.uint16
    pad = OD_BUFFER_PADDING >> xdec
    if classes is None:
        classes = build_leaf_lists(grid, info, pli)
    dst = jnp.zeros((h, w), jnp.uint16 if hi else jnp.uint8)
    for lms, cls in sorted(classes.items()):
        log_x = lms + 3 - xdec
        log_y = lms + 3 - ydec
        pos, srcs, mvs = cls["pos"], cls["srcs"], cls["mvs"]
        ocs, ss = cls["ocs"], cls["ss"]
        L = pos.shape[0]
        if bucket:
            # Pad to the next power of two so jit caches stay warm;
            # padded leaves scatter out of bounds and are dropped.
            cap = 1 << max(0, (L - 1).bit_length())
            if cap > L:
                pad_n = cap - L
                pos = np.concatenate(
                    [pos, np.full((pad_n, 2), 1 << 20, np.int32)])
                srcs = np.concatenate([srcs, np.zeros((pad_n, 4),
                                                      np.int32)])
                mvs = np.concatenate([mvs, np.zeros((pad_n, 4, 2),
                                                    np.int32)])
                ocs = np.concatenate([ocs, np.zeros(pad_n, np.int32)])
                ss = np.concatenate(
                    [ss, np.full(pad_n, 3, np.int32)])
        # Padded leaves gather from (0, 0) (any in-bounds source) but
        # scatter to out-of-bounds rows, where mode="drop" discards them.
        gather_pos = np.where(pos >= (1 << 20), 0, pos)
        blocks = predict_leaves(
            planes4, jnp.asarray(gather_pos),
            jnp.asarray(srcs), jnp.asarray(mvs), jnp.asarray(ocs),
            jnp.asarray(ss), log_x=log_x, log_y=log_y, pad=pad, hi=hi)
        ny, nx = 1 << log_y, 1 << log_x
        rows = pos[:, 0:1] + np.arange(ny)[None, :]
        cols = pos[:, 1:2] + np.arange(nx)[None, :]
        dst = dst.at[jnp.asarray(rows)[:, :, None],
                     jnp.asarray(cols)[:, None, :]].set(
            blocks, mode="drop")
    return dst if return_device else np.asarray(dst)


def stage_planes_i32(planes4_np):
    """Stage the 4 padded reference planes for the Pallas kernels:
    int32, with 128 extra columns so the (8, 128)-aligned window DMAs
    never run off the row ends."""
    p = np.asarray(planes4_np, np.int32)
    return np.pad(p, ((0, 0), (0, 16), (0, 256)))


def pallas_leaf_args(pos, srcs, mvs, ocs, ss, pad):
    """Pack the per-leaf scalar block + tap block for the Pallas OBMC
    kernels (ops/pallas/obmc_kernels.py): scal (L, 16) int32 with
    [0:4]=srcs [4:8]=sy [8:12]=sx [12]=wsel [13]=py [14]=px; taps
    (L, 4, 16) int32 with [:, k, 0:6]/[:, k, 8:14] the horizontal /
    vertical 6-tap filters."""
    L = pos.shape[0]
    mvx = mvs[:, :, 0]
    mvy = mvs[:, :, 1]
    scal = np.zeros((L, 16), np.int32)
    scal[:, 0:4] = srcs
    scal[:, 4:8] = pad + pos[:, 0:1] + (mvy >> 3) - 2
    scal[:, 8:12] = pad + pos[:, 1:2] + (mvx >> 3) - 2
    scal[:, 12] = ocs * 4 + ss
    scal[:, 13] = pos[:, 0]
    scal[:, 14] = pos[:, 1]
    taps = np.zeros((L, 4, 16), np.int32)
    taps[:, :, 0:6] = _SUBPEL[mvx & 7]
    taps[:, :, 8:14] = _SUBPEL[mvy & 7]
    return scal, taps


def wtab64(log_n):
    """(64, n, n) int32 flattened weight-plane table for the kernels."""
    t = _weight_table(log_n, log_n)
    n = 1 << log_n
    return np.ascontiguousarray(t.reshape(64, n, n))


def predict_leaves_pallas(planes_i32, pos, srcs, mvs, ocs, ss, n, pad,
                          hi=False, interpret=False):
    """Pallas-backed equivalent of predict_leaves for square leaves;
    returns (L, n, n) int32 blended predictions.  planes_i32 must come
    from stage_planes_i32 (carries the DMA margins)."""
    from daala_tpu.ops.pallas.obmc_kernels import obmc_blend_pallas
    scal, taps = pallas_leaf_args(pos, srcs, mvs, ocs, ss, pad)
    log_n = n.bit_length() - 1
    return obmc_blend_pallas(
        planes_i32, jnp.asarray(wtab64(log_n)), jnp.asarray(taps),
        jnp.asarray(scal), n=n, hi=hi, interpret=interpret)
