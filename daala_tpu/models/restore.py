"""TPU-side restoration filters (decode-side pipeline).

Jittable formulation of the directional deringing filter
(reference: src/dering.c:54-350), bit-exact with the host implementation
in daala_tpu/ops/dering.py (tests/test_restore.py):

- direction search as an integer projection matmul: the 8 directional
  line sums of every 8x8 block are one einsum against a constant 0/1
  projection tensor, and the cost accumulation uses int32 arithmetic so
  XLA reproduces the reference's int32 wraparound exactly;
- both conditional-replacement passes as per-pixel gathers whose offsets
  are selected by the block's direction, vectorized over the whole
  superblock (int16 arithmetic throughout, as the reference).

This is the decode-side half of the TPU pipeline: together with
models/analysis.py (lapped DCT analysis/synthesis) it lets frame
reconstruction run on the accelerator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from daala_tpu.ops.dering import (DIRECTION_OFFSETS, OD_FILT_BORDER,
                                  _DIV_TABLE, _THRESH_TABLE_Q8)


def _proj_tensor():
    """(8, 15, 8, 8) 0/1 projection: proj[d, l, i, j] = 1 iff pixel
    (i, j) belongs to line l of direction d (reference:
    src/dering.c:54-62)."""
    i = np.arange(8)[:, None] * np.ones((1, 8), np.int64)
    j = np.arange(8)[None, :] * np.ones((8, 1), np.int64)
    i = i.astype(np.int64)
    j = j.astype(np.int64)
    idx = np.stack([i + j, i + j // 2, i, 3 + i - j // 2, 7 + i - j,
                    3 - i // 2 + j, j, i // 2 + j])
    proj = np.zeros((8, 15, 8, 8), np.int32)
    for d in range(8):
        for a in range(8):
            for b in range(8):
                proj[d, idx[d, a, b], a, b] = 1
    return proj


_PROJ = _proj_tensor()

# Per-direction cost weights replicated as dense (8, 15) int32 tables so
# the cost reduction is one weighted square-sum (reference:
# src/dering.c:90-120).
def _cost_weights():
    w = np.zeros((8, 15), np.int32)
    for i in range(8):
        w[2, i] = _DIV_TABLE[8]
        w[6, i] = _DIV_TABLE[8]
    for i in range(7):
        w[0, i] = w[0, 14 - i] = _DIV_TABLE[i + 1]
        w[4, i] = w[4, 14 - i] = _DIV_TABLE[i + 1]
    w[0, 7] = w[4, 7] = _DIV_TABLE[8]
    for d in range(1, 8, 2):
        for j in range(5):
            w[d, 3 + j] = _DIV_TABLE[8]
        for j in range(3):
            w[d, j] = w[d, 10 - j] = _DIV_TABLE[2 * j + 2]
    return w


_COST_W = _cost_weights()

_DIR_DY = np.array([[o[0] for o in DIRECTION_OFFSETS[d]]
                    for d in range(8)], np.int32)  # (8, 3)
_DIR_DX = np.array([[o[1] for o in DIRECTION_OFFSETS[d]]
                    for d in range(8)], np.int32)


@functools.partial(jax.jit, static_argnames=("coeff_shift",))
def compute_dirs_var(x_orig, coeff_shift=4):
    """Vectorized od_dir_find8 over all 8x8 blocks of an (n, n) block.
    Returns (dirs, var) as (n//8, n//8) int32 arrays."""
    import jax.numpy as jnp
    n = x_orig.shape[0]
    nb = n // 8
    x = (x_orig.astype(jnp.int32) >> coeff_shift)
    blocks = x.reshape(nb, 8, nb, 8).transpose(0, 2, 1, 3)
    proj = jnp.asarray(_PROJ)
    # partial[by, bx, d, l]; values fit int32.
    partial = jnp.einsum("dlij,yxij->yxdl", proj, blocks)
    w = jnp.asarray(_COST_W)
    # int32 multiply-accumulate wraps exactly like the reference's
    # int32_t cost math.
    cost = jnp.sum(partial * partial * w[None, None], axis=-1,
                   dtype=jnp.int32)
    best_dir = jnp.argmax(cost, axis=-1).astype(jnp.int32)
    best_cost = jnp.max(cost, axis=-1)
    # The reference's scan starts from best_cost=0/dir=0 and uses strict
    # greater-than, so all-nonpositive costs give dir 0.
    best_dir = jnp.where(best_cost > 0, best_dir, 0)
    best_cost = jnp.maximum(best_cost, 0)
    opp = jnp.take_along_axis(cost, ((best_dir + 4) & 7)[..., None],
                              axis=-1)[..., 0]
    var = (best_cost - opp) >> 10
    return best_dir, var


@functools.partial(jax.jit, static_argnames=("bsize",))
def dering_filter(inb, x_orig, dirs, thresh, bsize=3):
    """Both dering passes over one superblock (jittable).

    inb: (n+6, n+6) int16 bordered input; x_orig: (n, n) int16;
    dirs/thresh: per-8x8-ish block (n>>bsize, n>>bsize) int32.
    Returns the filtered (n, n) int16 block.

    Single-superblock dispatch over the host tunnel is latency-bound;
    for production decode, vmap this over all superblocks of a frame
    (shapes are static) so one launch filters the whole frame."""
    import jax.numpy as jnp
    b = 1 << bsize
    n = x_orig.shape[0]
    nb = n // b
    B = OD_FILT_BORDER
    yy, xx = jnp.mgrid[0:n, 0:n]
    pdir = dirs[yy // b, xx // b]
    pthr = thresh[yy // b, xx // b]
    dy_t = jnp.asarray(_DIR_DY)
    dx_t = jnp.asarray(_DIR_DX)
    x0 = inb[B:B + n, B:B + n]

    def cond_tap(src, dy, dx, base, limit):
        p = (src[B + yy + dy, B + xx + dx].astype(jnp.int32)
             - base.astype(jnp.int32)).astype(jnp.int16)
        return jnp.where(jnp.abs(p.astype(jnp.int32)) < limit, p,
                         jnp.zeros_like(p))

    # Pass 1: 7-tap along the direction (reference: src/dering.c:132-170).
    taps = (3, 2, 1)
    acc = jnp.zeros((n, n), jnp.int16)
    for k in range(3):
        dy = dy_t[pdir, k]
        dx = dx_t[pdir, k]
        for sgn in (1, -1):
            p = cond_tap(inb, sgn * dy, sgn * dx, x0, pthr)
            acc = acc + (jnp.int16(taps[k])
                         * p.astype(jnp.int32)).astype(jnp.int16)
    out1 = (x0.astype(jnp.int32)
            + ((acc.astype(jnp.int32) + 8) >> 4)).astype(jnp.int16)
    # Rebuild the bordered input with pass-1 results inside.
    inb2 = inb.at[B:B + n, B:B + n].set(out1)
    # Pass 2: 4-tap orthogonal with tighter threshold (reference:
    # src/dering.c:172-210).
    horiz = (0 < pdir) & (pdir < 4)
    ody = jnp.where(horiz, 1, 0)
    odx = jnp.where(horiz, 0, 1)
    yv = out1.astype(jnp.int32)
    athr = jnp.minimum(pthr, pthr // 3
                       + jnp.abs(yv - x_orig.astype(jnp.int32)))
    acc2 = jnp.zeros((n, n), jnp.int16)
    for mult in (1, 2, -1, -2):
        p = (inb2[B + yy + ody * mult, B + xx + odx * mult]
             .astype(jnp.int32) - yv).astype(jnp.int16)
        p = jnp.where(jnp.abs(p.astype(jnp.int32)) < athr, p,
                      jnp.zeros_like(p))
        acc2 = acc2 + p
    return (yv + ((3 * acc2.astype(jnp.int32) + 8) >> 4)) \
        .astype(jnp.int16)


def od_dering_jax(plane_i16, sby, sbx, xdec, pli, bskip, threshold, n,
                  dirs=None, coeff_shift=4):
    """Drop-in counterpart of ops.dering.od_dering running the filters
    (and for luma, the direction search) under jit.  Border assembly and
    the skip-window logic stay on the host (tiny, data-dependent)."""
    import jax.numpy as jnp
    from daala_tpu.ops import dering as D
    nhdr = plane_i16.shape[1] >> (6 - xdec)
    nvdr_ = plane_i16.shape[0] >> (6 - xdec)
    bsize = 3 - xdec
    nhb = nvb = n >> bsize
    inb = np.full((n + 2 * OD_FILT_BORDER, n + 2 * OD_FILT_BORDER),
                  D.OD_DERING_VERY_LARGE, np.int16)
    y0 = sby << (6 - xdec)
    x0 = sbx << (6 - xdec)
    i_lo = -OD_FILT_BORDER if sby != 0 else 0
    i_hi = n + (OD_FILT_BORDER if sby != nvdr_ - 1 else 0)
    j_lo = -OD_FILT_BORDER if sbx != 0 else 0
    j_hi = n + (OD_FILT_BORDER if sbx != nhdr - 1 else 0)
    inb[OD_FILT_BORDER + i_lo:OD_FILT_BORDER + i_hi,
        OD_FILT_BORDER + j_lo:OD_FILT_BORDER + j_hi] = \
        plane_i16[y0 + i_lo:y0 + i_hi, x0 + j_lo:x0 + j_hi]
    x_orig = plane_i16[y0:y0 + n, x0:x0 + n]
    if pli == 0:
        dirs_j, var = compute_dirs_var(jnp.asarray(x_orig), coeff_shift)
        dirs = np.asarray(dirs_j)
        v1 = np.minimum(32767, np.asarray(var) >> 6)
        bits = np.zeros_like(v1)
        for p in range(15):
            bits += (v1 >= (1 << p)).astype(np.int32)
        tt = np.asarray(_THRESH_TABLE_Q8, np.int64)
        thresh = ((threshold * tt[bits] + 128) >> 8).astype(np.int32)
        # Wrapped-negative variance -> unfiltered (the reference's
        # OD_ILOG(negative) table read is out of bounds; see
        # ops/dering.py for the emulation rationale).
        thresh = np.where(v1 < 0, 0, thresh).astype(np.int32)
    else:
        assert dirs is not None
        thresh = np.full((nvb, nhb), threshold, np.int32)
    # Skip-window masking (reference: src/dering.c:301-327).
    for by in range(nvb):
        for bx in range(nhb):
            xstart = ystart = 0
            xend = yend = 2 >> xdec
            xstart -= int(sbx != 0)
            ystart -= int(sby != 0)
            xend += int(sbx != nhdr - 1)
            yend += int(sby != nvdr_ - 1)
            skip = 1
            for i in range(ystart, yend):
                for j in range(xstart, xend):
                    yy = (sby << (4 - xdec)) + (by << 1 >> xdec) + i
                    xx = (sbx << (4 - xdec)) + (bx << 1 >> xdec) + j
                    skip = skip and bskip[yy, xx]
            if skip:
                thresh[by, bx] = 0
    out = dering_filter(jnp.asarray(inb), jnp.asarray(x_orig),
                        jnp.asarray(dirs, dtype=np.int32),
                        jnp.asarray(thresh), bsize)
    return np.asarray(out), dirs


def _skip_blocks_luma(bskip0, nvdr, nhdr):
    """Vectorized skip-window mask at 8x8-block granularity for every
    superblock (od_dering's skip-window logic, reference:
    src/dering.c:301-327): an 8px block is skipped when all 4px bskip
    cells in its window are set.  The window extension rows/columns
    (i = -1 and +2) are included per SUPERBLOCK position — every block
    of an edge superblock drops them, even interior blocks whose
    neighbors exist (a reference quirk replicated exactly)."""
    sk = np.asarray(bskip0, np.uint8)
    h4 = nvdr * 16
    w4 = nhdr * 16
    sk = sk[:h4, :w4]
    p = np.ones((h4 + 2, w4 + 2), np.uint8)
    p[1:-1, 1:-1] = sk
    hb, wb = h4 // 2, w4 // 2

    def S(dy, dx):
        return p[dy:dy + h4:2, dx:dx + w4:2][:hb, :wb]

    out = S(1, 1) & S(1, 2) & S(2, 1) & S(2, 2)
    # SB-position row/col inclusion masks for the -1 / +2 extensions.
    brow = np.arange(hb) // 8
    bcol = np.arange(wb) // 8
    top = (brow > 0)[:, None]
    bot = (brow < nvdr - 1)[:, None]
    left = (bcol > 0)[None, :]
    right = (bcol < nhdr - 1)[None, :]
    out &= np.where(top, S(0, 1) & S(0, 2), 1).astype(np.uint8)
    out &= np.where(bot, S(3, 1) & S(3, 2), 1).astype(np.uint8)
    out &= np.where(left, S(1, 0) & S(2, 0), 1).astype(np.uint8)
    out &= np.where(right, S(1, 3) & S(2, 3), 1).astype(np.uint8)
    out &= np.where(top & left, S(0, 0), 1).astype(np.uint8)
    out &= np.where(top & right, S(0, 3), 1).astype(np.uint8)
    out &= np.where(bot & left, S(3, 0), 1).astype(np.uint8)
    out &= np.where(bot & right, S(3, 3), 1).astype(np.uint8)
    return out  # (nvdr*8, nhdr*8)


def dering_candidates_device(luma_i16, bskip0, quantizer, nvdr, nhdr,
                             coeff_shift=4):
    """Batched device dering for the encoder's RDO: all superblocks x
    the 5 gain levels in one vmapped pass.

    Returns (cands, dirs): cands (NSB, 5, 64, 64) int16 filtered
    candidates (NSB = nvdr*nhdr, raster order), dirs (NSB, 8, 8) int32
    luma directions (consumed by the chroma filter of the chosen
    level).  Bit-exact with per-superblock ops.dering.od_dering."""
    import jax.numpy as jnp
    from daala_tpu.ops import dering as D
    B = OD_FILT_BORDER
    h, w = nvdr * 64, nhdr * 64
    plane = np.full((h + 2 * B, w + 2 * B), D.OD_DERING_VERY_LARGE,
                    np.int16)
    plane[B:B + h, B:B + w] = luma_i16[:h, :w]
    # Bordered superblock windows + originals, batched.
    inb = np.empty((nvdr * nhdr, 64 + 2 * B, 64 + 2 * B), np.int16)
    xorig = np.empty((nvdr * nhdr, 64, 64), np.int16)
    for sby in range(nvdr):
        for sbx in range(nhdr):
            i = sby * nhdr + sbx
            inb[i] = plane[sby * 64:sby * 64 + 64 + 2 * B,
                           sbx * 64:sbx * 64 + 64 + 2 * B]
            xorig[i] = luma_i16[sby * 64:(sby + 1) * 64,
                                sbx * 64:(sbx + 1) * 64]
    from daala_tpu.utils import devstats
    skipb = _skip_blocks_luma(bskip0, nvdr, nhdr) \
        .reshape(nvdr, 8, nhdr, 8).transpose(0, 2, 1, 3) \
        .reshape(nvdr * nhdr, 8, 8)
    # Per-gain base thresholds (the only float math; 5 host ints).
    base_threshold = float(quantizer) ** 0.84182
    # t0 * tt[bits] <= ~3900 * 256: comfortably int32.
    t0s = np.array([int(g * base_threshold)
                    for g in (0.5, 0.707, 1, 1.41, 2)], np.int32)
    devstats.dispatch(inb, xorig, skipb, t0s)
    cands, dirs_j = _dering_cands_fused(
        jnp.asarray(inb), jnp.asarray(xorig), jnp.asarray(skipb),
        jnp.asarray(t0s), coeff_shift)
    devstats.prefetch(cands, dirs_j)
    return devstats.fetch(cands), devstats.fetch(dirs_j, np.int32)


@functools.partial(jax.jit, static_argnames=("coeff_shift",))
def _dering_cands_fused(inb, xorig, skipb, t0s, coeff_shift):
    """Direction search + per-block thresholds + all 5 gain-level
    filters as ONE device program: the host threshold math of the
    two-dispatch version (direction fetch, threshold compute, filter
    dispatch) moves on device, so the dering RDO costs one round trip
    and the superblock windows upload once."""
    dirs, var = jax.vmap(
        lambda x: compute_dirs_var(x, coeff_shift))(xorig)
    v1 = jnp.minimum(32767, var >> 6)
    bits = jnp.zeros_like(v1)
    for p in range(15):
        bits += (v1 >= (1 << p)).astype(v1.dtype)
    tt = jnp.asarray(np.asarray(_THRESH_TABLE_Q8, np.int32))
    tb = tt[bits]  # (NSB, 8, 8)
    th = ((t0s[None, :, None, None] * tb[:, None]) + 128) >> 8
    th = th.astype(jnp.int32)
    th = jnp.where((v1 < 0)[:, None], 0, th)
    th = jnp.where((skipb != 0)[:, None], 0, th)

    def per_sb(ib, xo, dd, tt5):
        return jax.vmap(
            lambda t: dering_filter(ib, xo, dd, t, 3))(tt5)
    cands = jax.vmap(per_sb)(inb, xorig, dirs.astype(jnp.int32), th)
    return cands, dirs
