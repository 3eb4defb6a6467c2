"""Device color-sweep MV refinement (Jacobi form of the greedy
coordinate-descent in native/me_enc.inc refine_mvs).

The host Gauss-Seidel loop updates one vertex at a time; its candidate
evaluations depend on the evolving field, which serializes the whole
refinement.  The sweep mode re-poses one pass as per-color Jacobi
sweeps: vertices are 4-colored (by level and lattice parity) so that
same-color vertices share no OBMC leaf; every (vertex, candidate) of a
color is evaluated against the frozen committed field in one batched
device pass (models/obmc.py predict_leaves on the corner-substituted
leaves), and all accepted improvements of the color commit together.

Cost semantics mirror the greedy loop exactly per evaluation:
  cost = (region_sad << 5) + lam * local_rate
with the region/cell SAD bookkeeping of the host FieldCache (the leaf
spans are 8-px-cell aligned, so leaf SADs are sums of cells) and the
exact rate model via the shared native helpers (me_sweep_cands /
me_sweep_rates).  Only the *schedule* differs from the greedy loop, so
streams stay valid and quality is validated by BD-rate instead of a
bit-parity test (tests/test_mesweep.py).
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

import jax
import jax.numpy as jnp

from daala_tpu.codec import mc as MC
from daala_tpu.models import obmc as OB

_CELL = 8


def vertex_level(vx, vy):
    t = ((0, 6, 4, 6, 2, 6, 4, 6), (6, 5, 6, 5, 6, 5, 6, 5),
         (4, 6, 3, 6, 4, 6, 3, 6), (6, 5, 6, 5, 6, 5, 6, 5),
         (2, 6, 4, 6, 1, 6, 4, 6), (6, 5, 6, 5, 6, 5, 6, 5),
         (4, 6, 3, 6, 4, 6, 3, 6), (6, 5, 6, 5, 6, 5, 6, 5))
    return t[vy & 7][vx & 7]


@functools.partial(jax.jit, static_argnames=("vh", "vw"))
def _cells_sad(cur_vis_p, pred_frame, mask, vh, vw):
    """cur: (ch*8, cw*8) padded int16; pred_frame: (H, W) device plane.
    Returns (ch, cw) int32 cell SADs over the visible area."""
    ph, pw = cur_vis_p.shape
    pv = jnp.zeros((ph, pw), jnp.int16)
    pv = pv.at[:vh, :vw].set(pred_frame[:vh, :vw].astype(jnp.int16))
    d = jnp.abs(cur_vis_p - pv) * mask
    ch = ph // _CELL
    cw = pw // _CELL
    return (d.reshape(ch, _CELL, cw * _CELL).sum(1, dtype=jnp.int32)
             .reshape(ch, cw, _CELL).sum(2, dtype=jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("log_x", "log_y", "pad", "vh", "vw"))
def _leaf_sads(planes4, cur_vis, pos, srcs, mvs, ocs, ss, log_x, log_y,
               pad, vh, vw):
    """Predict a batch of (possibly corner-substituted) leaves and
    return each leaf's SAD against the current frame over its visible
    span.  pos rows >= vh are padding rows and return 0."""
    blocks = OB.predict_leaves(planes4, pos, srcs, mvs, ocs, ss,
                               log_x=log_x, log_y=log_y, pad=pad,
                               hi=False)
    ny, nx = 1 << log_y, 1 << log_x
    y = pos[:, 0]
    x = pos[:, 1]
    rows = y[:, None] + jnp.arange(ny)[None, :]
    cols = x[:, None] + jnp.arange(nx)[None, :]
    cur = cur_vis[jnp.clip(rows, 0, vh - 1)[:, :, None],
                  jnp.clip(cols, 0, vw - 1)[:, None, :]]
    vis_m = ((rows < vh)[:, :, None] & (cols < vw)[:, None, :])
    d = jnp.abs(blocks.astype(jnp.int32) - cur.astype(jnp.int32))
    return jnp.where(vis_m, d, 0).sum((1, 2), dtype=jnp.int32)


class SweepState:
    """Per-frame device/host state for the color sweeps."""

    def __init__(self, grid, info, cur_luma, planes4, vis,
                 device_put_fn=None):
        self.grid = grid
        self.info = info
        self.vis_h, self.vis_w = vis
        self.ch = -(-self.vis_h // _CELL)
        self.cw = -(-self.vis_w // _CELL)
        self.pad = MC.OD_BUFFER_PADDING
        p4 = np.stack([np.ascontiguousarray(p, np.uint8)
                       for p in planes4])
        # Pallas path (TPU): int32 planes with DMA margins + padded
        # current plane; XLA path (CPU/CI): uint8 planes.
        self.use_pallas = jax.default_backend() in ("tpu", "axon")
        if self.use_pallas:
            p32 = OB.stage_planes_i32(p4)
            if device_put_fn is not None:
                p32 = device_put_fn(p32, 0)
            self.planes_i32 = jnp.asarray(p32)
            cvh = ((self.vis_h + 7) & ~7) + 64
            cvw = ((self.vis_w + 7) & ~7) + 384
            c32 = np.zeros((cvh, cvw), np.int32)
            c32[:self.vis_h, :self.vis_w] = \
                cur_luma[:self.vis_h, :self.vis_w]
            self.cur_i32 = jnp.asarray(c32)
        if device_put_fn is not None:
            p4 = device_put_fn(p4, 0)
        self.planes4 = jnp.asarray(p4)
        cv = np.zeros((self.ch * _CELL, self.cw * _CELL), np.int16)
        cv[:self.vis_h, :self.vis_w] = \
            cur_luma[:self.vis_h, :self.vis_w]
        self.cur_pad16 = jnp.asarray(cv)
        self.cur_vis = jnp.asarray(
            np.ascontiguousarray(cur_luma[:self.vis_h, :self.vis_w],
                                 np.uint8))
        m = np.zeros((self.ch * _CELL, self.cw * _CELL), np.int16)
        m[:self.vis_h, :self.vis_w] = 1
        self.mask16 = jnp.asarray(m)
        self.nbx = (grid.nhmvbs + 7) // 8
        self.nby = (grid.nvmvbs + 7) // 8
        self.rebuild_leaves()

    def rebuild_leaves(self):
        """(Re)walk the mesh into per-class leaf arrays, corner ids, and
        the affected-leaf instance arrays (vertex id -> leaves)."""
        grid, info = self.grid, self.info
        self.classes = OB.build_leaf_lists(grid, info, 0)
        stride = grid.nhmvbs + 1
        vsdx = np.asarray(MC.VERT_SETUP_DX, np.int64)  # (4, 4, 4)
        vsdy = np.asarray(MC.VERT_SETUP_DY, np.int64)
        self.aff = {}
        for lms, cls in self.classes.items():
            dxp = vsdx[cls["ocs"], cls["ss"]]           # (L, 4)
            dyp = vsdy[cls["ocs"], cls["ss"]]
            vy = (cls["pos"][:, 0] >> 3)[:, None]
            vx = (cls["pos"][:, 1] >> 3)[:, None]
            gy = vy + dyp * (1 << lms)
            gx = vx + dxp * (1 << lms)
            cids = (gy * stride + gx).astype(np.int64)
            cls["cids"] = cids
            L = cids.shape[0]
            leaf_idx = np.repeat(np.arange(L, dtype=np.int64), 4)
            pairs = np.unique(
                np.stack([cids.ravel(), leaf_idx], 1), axis=0)
            self.aff[lms] = (pairs[:, 0], pairs[:, 1])

    def committed_cells(self, pred_frame_dev):
        """Cell SAD grid of the committed prediction (numpy int32);
        pred stays on device."""
        return np.asarray(_cells_sad(self.cur_pad16, pred_frame_dev,
                                     self.mask16, vh=self.vis_h,
                                     vw=self.vis_w))


def _bucket(n):
    return 1 << max(0, (n - 1).bit_length())


def leaf_cells_batch(state, lms, pos, srcs, mvs, ocs, ss):
    """Batched per-8px-cell SADs of one class's (possibly
    corner-substituted) leaves: (L, n/8, n/8) int32."""
    n = 8 << lms
    L = pos.shape[0]
    cap = _bucket(max(L, 1))
    if cap > L:
        padn = cap - L
        # Padded leaves predict leaf 0 again (harmless; sliced off).
        pos = np.concatenate([pos, np.repeat(pos[:1], padn, 0)])
        srcs = np.concatenate([srcs, np.repeat(srcs[:1], padn, 0)])
        mvs = np.concatenate([mvs, np.repeat(mvs[:1], padn, 0)])
        ocs = np.concatenate([ocs, np.repeat(ocs[:1], padn, 0)])
        ss = np.concatenate([ss, np.repeat(ss[:1], padn, 0)])
    if state.use_pallas:
        from daala_tpu.ops.pallas.obmc_kernels import \
            obmc_leaf_cells_pallas
        scal, taps = OB.pallas_leaf_args(pos, srcs, mvs, ocs, ss,
                                         state.pad)
        cells = obmc_leaf_cells_pallas(
            state.planes_i32, state.cur_i32,
            jnp.asarray(OB.wtab64(lms + 3)), jnp.asarray(taps),
            jnp.asarray(scal), n=n, vh=state.vis_h, vw=state.vis_w)
        return np.asarray(cells)[:L]
    blocks = OB.predict_leaves(
        state.planes4, jnp.asarray(pos), jnp.asarray(srcs),
        jnp.asarray(mvs), jnp.asarray(ocs), jnp.asarray(ss),
        log_x=lms + 3, log_y=lms + 3, pad=state.pad, hi=False)
    cells = _leaf_cells_xla(blocks, state.cur_vis, jnp.asarray(pos),
                            n=n, vh=state.vis_h, vw=state.vis_w)
    return np.asarray(cells)[:L]


@functools.partial(jax.jit, static_argnames=("n", "vh", "vw"))
def _leaf_cells_xla(blocks, cur_vis, pos, n, vh, vw):
    L = blocks.shape[0]
    y = pos[:, 0]
    x = pos[:, 1]
    rows = y[:, None] + jnp.arange(n)[None, :]
    cols = x[:, None] + jnp.arange(n)[None, :]
    cur = cur_vis[jnp.clip(rows, 0, vh - 1)[:, :, None],
                  jnp.clip(cols, 0, vw - 1)[:, None, :]]
    vis_m = ((rows < vh)[:, :, None] & (cols < vw)[:, None, :])
    d = jnp.where(vis_m,
                  jnp.abs(blocks.astype(jnp.int32)
                          - cur.astype(jnp.int32)), 0)
    nc = n // 8
    return (d.reshape(L, nc, 8, nc, 8).sum((2, 4)))


def eval_leaf_batch(state, lms, pos, srcs, mvs, ocs, ss):
    """Batched total leaf SADs of one class (visible-clipped)."""
    return leaf_cells_batch(state, lms, pos, srcs, mvs, ocs,
                            ss).sum((1, 2)).astype(np.int64)


def committed_stats(state):
    """Cell SAD grid + per-leaf SADs of the committed field via the
    Pallas cells kernel (no frame assembly)."""
    cells = np.zeros((state.ch, state.cw), np.int64)
    leafsad = {}
    for lms, cls in state.classes.items():
        lc = leaf_cells_batch(state, lms, cls["pos"], cls["srcs"],
                              cls["mvs"], cls["ocs"], cls["ss"])
        leafsad[lms] = lc.sum((1, 2)).astype(np.int64)
        nc = 1 << lms
        cy0 = cls["pos"][:, 0] // 8
        cx0 = cls["pos"][:, 1] // 8
        rows = np.broadcast_to(
            cy0[:, None, None] + np.arange(nc)[None, :, None],
            lc.shape)
        cols = np.broadcast_to(
            cx0[:, None, None] + np.arange(nc)[None, None, :],
            lc.shape)
        m = (rows < state.ch) & (cols < state.cw)
        np.add.at(cells, (rows[m], cols[m]),
                  lc.astype(np.int64)[m])
    return cells, leafsad
