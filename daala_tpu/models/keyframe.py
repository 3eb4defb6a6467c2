"""Device-side keyframe analysis: the encoder's transform front-end as
one jittable, shardable pass per plane.

Re-expresses _compute_dcts (daala_tpu/codec/encoder.py; reference:
src/encode.c:1455-1513) TPU-first: instead of a per-superblock recursion
interleaving split lapped filters and per-leaf DCTs, the whole frame is
processed level-by-level with masked vectorized filter/transform stages:

  pixels -> coefficient lift -> frame lapped prefilter (4-px lap across
  superblock boundaries -> the halo when sharded) -> per-level masked
  split prefilters -> per-size blockwise DCT, mask-combined -> masked
  Haar DC merges (bottom up)

The block-size map is host data, turned into per-level masks
(build_analysis_masks walks the exact recursion), so the jitted function
has static shapes and is `jax.jit`-compatible with any
`jax.sharding.NamedSharding` over the spatial axes: the lapped filters
and DCT gathers near shard edges become XLA-inserted halo collectives.

All arithmetic is int32 lifting — bit-exact with the host path on any
backend; the host EC stage consumes the returned `d` plane unchanged
(encoder.precomputed_d), producing byte-identical packets
(tests/test_device_analysis.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from daala_tpu.models.analysis import (lift_to_coeff, blocks_of, unblocks)
from daala_tpu.ops import _lifting as L
from daala_tpu.ops import dct

OD_NBSIZES = 5


def build_analysis_masks(state, info, pli):
    """Walk the _compute_dcts recursion on the host block-size map and
    emit per-level masks for the device pass.

    Returns a dict with, per node level bsi in 1..4 (plane node size
    n = 4 << (bsi - xdec)):
      split_h[bsi], split_v[bsi]: (nvnodes, nhnodes) uint8 — apply the
          horizontal-midline / vertical-midline lapped filter,
      merge[bsi]: same shape — Haar-merge the node's 4 child DCs,
    and leaf[bs_p] for plane leaf sizes bs_p in 0..4-xdec:
      (nvb, nhb) uint8 — this n x n block is a transform leaf.
    """
    xdec, ydec = info.plane_dec[pli]
    w = state.frame_width >> xdec
    h = state.frame_height >> ydec
    masks = {"split_h": {}, "split_v": {}, "merge": {}, "leaf": {}}
    for bsi in range(1, OD_NBSIZES):
        n = 4 << (bsi - xdec)
        shape = (h // n, w // n)
        masks["split_h"][bsi] = np.zeros(shape, np.uint8)
        masks["split_v"][bsi] = np.zeros(shape, np.uint8)
        masks["merge"][bsi] = np.zeros(shape, np.uint8)
    for bs_p in range(0, OD_NBSIZES - xdec):
        n = 4 << bs_p
        masks["leaf"][bs_p] = np.zeros((h // n, w // n), np.uint8)

    def rec(bx, by, bsi):
        obs = state.bsize4(bx << bsi, by << bsi)
        bs = max(obs, xdec)
        if bs == bsi:
            masks["leaf"][bsi - xdec][by, bx] = 1
            return
        bs_p = bsi - xdec
        hfilter = ((bx + 1) << (2 + bs_p)) <= info.pic_width
        vfilter = ((by + 1) << (2 + bs_p)) <= info.pic_height
        masks["split_h"][bsi][by, bx] = 1 if hfilter else 0
        masks["split_v"][bsi][by, bx] = 1 if vfilter else 0
        masks["merge"][bsi][by, bx] = 1
        for sub in ((0, 0), (1, 0), (0, 1), (1, 1)):
            rec(2 * bx + sub[0], 2 * by + sub[1], bsi - 1)

    for sby in range(state.nvsb):
        for sbx in range(state.nhsb):
            rec(sbx, sby, OD_NBSIZES - 1)
    return masks


def _masked_split_filter(c, hmask, vmask, n):
    """Apply od_prefilter_split midline filters to every split node of
    size n, vectorized: full-width/height 4-px bands filtered once, kept
    only where the node is split (daala_tpu/ops/filter.py
    prefilter_split semantics, rows then cols)."""
    h, w = c.shape
    nby, nbx = h // n, w // n
    half = n // 2
    # Horizontal midlines: rows y0 + half - 2 .. + 2 for each node row.
    rows = jnp.arange(nby) * n + half - 2
    idx = rows[:, None] + jnp.arange(4)[None, :]
    band = c[idx]  # (nby, 4, w)
    out = L.pre_filter4([band[:, k, :] for k in range(4)])
    band_f = jnp.stack(out, axis=1)
    keep = jnp.repeat(hmask.astype(bool), n, axis=1)[:, None, :]
    c = c.at[idx].set(jnp.where(keep, band_f, band))
    # Vertical midlines.
    cols = jnp.arange(nbx) * n + half - 2
    idx = cols[:, None] + jnp.arange(4)[None, :]
    band = c[:, idx]  # (h, nbx, 4)
    out = L.pre_filter4([band[:, :, k] for k in range(4)])
    band_f = jnp.stack(out, axis=2)
    keep = jnp.repeat(vmask.astype(bool), n, axis=0)[:, :, None]
    c = c.at[:, idx].set(jnp.where(keep, band_f, band))
    return c


def _masked_dc_merge(d, mmask, n):
    """Haar-merge the four child DCs of each split node of size n
    (encoder.py _compute_dcts tail; note the b/c swap)."""
    half = n // 2
    a = d[0::n, 0::n]
    b = d[0::n, half::n]
    cc = d[half::n, 0::n]
    dd = d[half::n, half::n]
    # haar_kernel(a, cc, b, dd) -> (k0, k1, k2, k3); writes: (0,0)=k0,
    # (0,half)=k2, (half,0)=k1, (half,half)=k3.
    k0 = a + b
    k3 = dd - cc
    k1 = ((k0 - k3) >> 1) - cc
    k2 = ((k0 - k3) >> 1) - b
    k0 = k0 - k1
    k3 = k3 + k2
    m = mmask.astype(bool)
    d = d.at[0::n, 0::n].set(jnp.where(m, k0, a))
    d = d.at[0::n, half::n].set(jnp.where(m, k2, b))
    d = d.at[half::n, 0::n].set(jnp.where(m, k1, cc))
    d = d.at[half::n, half::n].set(jnp.where(m, k3, dd))
    return d


def _prefilter_frame_dec(c, xdec, ydec, use_pallas=False):
    """Frame lapped prefilter with per-axis superblock sizes
    (filter.py apply_prefilter_frame_sbs for a decimated plane).
    With use_pallas the boundary bands run as Pallas stripe kernels
    (ops/pallas/lap_kernels.py, bit-identical)."""
    if use_pallas:
        from daala_tpu.ops.pallas.lap_kernels import lap_frame_pallas
        return lap_frame_pallas(c, sb_x=64 >> xdec, sb_y=64 >> ydec,
                                forward=True)
    from daala_tpu.models.analysis import _filter_rows_at, _filter_cols_at
    h, w = c.shape
    sb_y = 64 >> ydec
    sb_x = 64 >> xdec
    row_starts = [sby * sb_y - 2 for sby in range(1, h // sb_y)]
    col_starts = [sbx * sb_x - 2 for sbx in range(1, w // sb_x)]
    c = _filter_rows_at(c, row_starts, inv=False)
    c = _filter_cols_at(c, col_starts, inv=False)
    return c


@functools.partial(jax.jit,
                   static_argnames=("xdec", "ydec", "lossless",
                                    "use_pallas"))
def keyframe_analysis_plane(plane_u8, mask_args, xdec=0, ydec=0,
                            lossless=False, use_pallas=False):
    """Device analysis of one keyframe plane: returns the `d` coefficient
    plane exactly as the host _compute_dcts pass produces it (before the
    Haar DC tree quantization, which is host-side sequential coding).

    mask_args: tuple as packed by pack_masks()."""
    (split_h, split_v, merge, leaf) = mask_args
    shift = 0 if lossless else 4
    c = (plane_u8.astype(jnp.int32) - 128) << shift
    c = _prefilter_frame_dec(c, xdec, ydec, use_pallas=use_pallas)
    # Split prefilters, top level down.
    for bsi in range(OD_NBSIZES - 1, 0, -1):
        n = 4 << (bsi - xdec)
        c = _masked_split_filter(c, split_h[bsi], split_v[bsi], n)
    # Per-size leaf DCTs, mask-combined.
    h, w = c.shape
    d = jnp.zeros_like(c)
    for bs_p in sorted(leaf.keys()):
        n = 4 << bs_p
        dn = unblocks(dct.fdct2d(blocks_of(c, n)), h, w)
        m = jnp.repeat(jnp.repeat(leaf[bs_p].astype(bool), n, axis=0),
                       n, axis=1)
        d = jnp.where(m, dn, d)
    # Haar DC merges, bottom up.
    for bsi in range(1, OD_NBSIZES):
        n = 4 << (bsi - xdec)
        d = _masked_dc_merge(d, merge[bsi], n)
    return d


def analyze_keyframe(state, info, padded_planes, lossless,
                     device_put_fn=None):
    """Run the device analysis for every plane of a keyframe; returns the
    list of `d` planes as numpy int32 arrays (host EC consumes them).

    device_put_fn(array, pli) may place inputs on a sharded mesh; by
    default arrays go wherever jax puts them."""
    out = []
    for pli in range(info.nplanes):
        xdec, ydec = info.plane_dec[pli]
        masks = build_analysis_masks(state, info, pli)
        mask_args = ({k: jnp.asarray(v) for k, v in masks["split_h"].items()},
                     {k: jnp.asarray(v) for k, v in masks["split_v"].items()},
                     {k: jnp.asarray(v) for k, v in masks["merge"].items()},
                     {k: jnp.asarray(v) for k, v in masks["leaf"].items()})
        plane = padded_planes[pli]
        if device_put_fn is not None:
            plane = device_put_fn(np.asarray(plane), pli)
        import os
        d = keyframe_analysis_plane(
            plane, mask_args, xdec=xdec, ydec=ydec,
            lossless=bool(lossless),
            use_pallas=os.environ.get("DAALA_TPU_PALLAS", "0") == "1")
        out.append(np.asarray(d, np.int32))
    return out


@functools.partial(jax.jit,
                   static_argnames=("xdec", "ydec", "lossless",
                                    "pic_w", "pic_h", "use_pallas"))
def inter_analysis_plane(plane_u8, mc_plane_u8, mask_args, xdec=0, ydec=0,
                         lossless=False, pic_w=None, pic_h=None,
                         use_pallas=False):
    """Device analysis of one inter-frame plane: (d, md) coefficient
    planes for the input and its OBMC prediction, exactly as the host
    per-block recursion produces them (frame lapped prefilter, input
    padding replaced by the filtered prediction, masked split
    prefilters, per-leaf DCT on both planes; no DC Haar tree on inter
    frames).  The host entropy pass consumes both unchanged
    (reference: od_encode_coefficients inter path,
    src/encode.c:2630-2686)."""
    (split_h, split_v, merge, leaf) = mask_args
    del merge  # inter frames have no DC Haar tree
    shift = 0 if lossless else 4
    c = (plane_u8.astype(jnp.int32) - 128) << shift
    mc = (mc_plane_u8.astype(jnp.int32) - 128) << shift
    c = _prefilter_frame_dec(c, xdec, ydec, use_pallas=use_pallas)
    mc = _prefilter_frame_dec(mc, xdec, ydec, use_pallas=use_pallas)
    h, w = c.shape
    if pic_w is not None and (pic_w < w or pic_h < h):
        # Padding tracks the prediction so no bits are spent there
        # (reference: src/encode.c:2662-2686); the substitution happens
        # in the frame-prefiltered domain, matching the host order.
        col = jnp.arange(w)[None, :] >= pic_w
        row = jnp.arange(h)[:, None] >= pic_h
        c = jnp.where(col | row, mc, c)
    planes = []
    for p in (c, mc):
        z = p
        for bsi in range(OD_NBSIZES - 1, 0, -1):
            n = 4 << (bsi - xdec)
            z = _masked_split_filter(z, split_h[bsi], split_v[bsi], n)
        d = jnp.zeros_like(z)
        for bs_p in sorted(leaf.keys()):
            n = 4 << bs_p
            dn = unblocks(dct.fdct2d(blocks_of(z, n)), h, w)
            m = jnp.repeat(jnp.repeat(leaf[bs_p].astype(bool), n, axis=0),
                           n, axis=1)
            d = jnp.where(m, dn, d)
        planes.append(d)
    return planes[0], planes[1]


def analyze_inter(state, info, padded_planes, mc_planes, lossless,
                  device_put_fn=None):
    """Device (d, md) analysis for every plane of an inter frame; the
    prediction planes come from the OBMC stage (OD_FRAME_SELF)."""
    import os
    use_pallas = os.environ.get("DAALA_TPU_PALLAS", "0") == "1"
    d_out, md_out = [], []
    for pli in range(info.nplanes):
        xdec, ydec = info.plane_dec[pli]
        masks = build_analysis_masks(state, info, pli)
        mask_args = ({k: jnp.asarray(v) for k, v in masks["split_h"].items()},
                     {k: jnp.asarray(v) for k, v in masks["split_v"].items()},
                     {k: jnp.asarray(v) for k, v in masks["merge"].items()},
                     {k: jnp.asarray(v) for k, v in masks["leaf"].items()})
        plane = np.asarray(padded_planes[pli])
        mc = np.asarray(mc_planes[pli])
        if device_put_fn is not None:
            plane = device_put_fn(plane, pli)
            mc = device_put_fn(mc, pli)
        pic_w = (info.pic_width + (1 << xdec) - 1) >> xdec
        pic_h = (info.pic_height + (1 << ydec) - 1) >> ydec
        d, md = inter_analysis_plane(plane, mc, mask_args, xdec=xdec,
                                     ydec=ydec, lossless=bool(lossless),
                                     pic_w=pic_w, pic_h=pic_h,
                                     use_pallas=use_pallas)
        d_out.append(np.asarray(d, np.int32))
        md_out.append(np.asarray(md, np.int32))
    return d_out, md_out
