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


def _lift_input(plane, fpr_mode, lossless):
    """Input lift to the coefficient domain (od_ref_buf_to_coeff,
    reference: src/state.c:1219-1256): 8-bit is (x - 128) << 4 (<< 0
    lossless); full-precision 12-bit buffers recenter on 2048, with the
    lossless shift running at the input depth."""
    x = plane.astype(jnp.int32)
    if fpr_mode:
        s = (4 - 2 * (fpr_mode - 1)) if lossless else 0
        return (x - 2048 + (1 << s >> 1)) >> s
    return (x - 128) << (0 if lossless else 4)


@functools.partial(jax.jit,
                   static_argnames=("xdec", "ydec", "lossless",
                                    "fpr_mode", "use_pallas"))
def keyframe_analysis_plane(plane_u8, mask_args, xdec=0, ydec=0,
                            lossless=False, fpr_mode=0, use_pallas=False):
    """Device analysis of one keyframe plane: returns the `d` coefficient
    plane exactly as the host _compute_dcts pass produces it (before the
    Haar DC tree quantization, which is host-side sequential coding).

    mask_args: tuple as packed by pack_masks()."""
    (split_h, split_v, merge, leaf) = mask_args
    c = _lift_input(plane_u8, fpr_mode, lossless)
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
                     device_put_fn=None, defer=False):
    """Run the device analysis for every plane of a keyframe; returns the
    list of `d` planes as numpy int32 arrays (host EC consumes them).

    device_put_fn(array, pli) may place inputs on a sharded mesh; by
    default arrays go wherever jax puts them.  defer=True returns
    (d_dev, finish) — the device arrays plus a finish() fetching the
    numpy planes (see analyze_inter)."""
    dev = []
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
        fpr_mode = (info.bitdepth_mode
                    if np.asarray(padded_planes[pli]).dtype == np.uint16
                    else 0)
        from daala_tpu.utils import devstats
        devstats.dispatch(plane)
        d = keyframe_analysis_plane(
            plane, mask_args, xdec=xdec, ydec=ydec,
            lossless=bool(lossless), fpr_mode=fpr_mode,
            use_pallas=os.environ.get("DAALA_TPU_PALLAS", "0") == "1")
        if defer:
            dev.append(d)
        else:
            out.append(devstats.fetch(d, np.int32))
    if defer:
        from daala_tpu.utils import devstats as _ds

        def finish():
            _ds.prefetch(*dev)
            return [_ds.fetch(d, np.int32) for d in dev]
        return dev, finish
    return out


@functools.partial(jax.jit,
                   static_argnames=("xdec", "ydec", "lossless",
                                    "fpr_mode", "mc_fpr_mode",
                                    "pic_w", "pic_h", "use_pallas"))
def inter_analysis_plane(plane_u8, mc_plane_u8, mask_args, xdec=0, ydec=0,
                         lossless=False, fpr_mode=0, mc_fpr_mode=0,
                         pic_w=None, pic_h=None, use_pallas=False):
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
    c = _lift_input(plane_u8, fpr_mode, lossless)
    mc = _lift_input(mc_plane_u8, mc_fpr_mode, lossless)
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
                  device_put_fn=None, defer=False):
    """Device (d, md) analysis for every plane of an inter frame; the
    prediction planes come from the OBMC stage (OD_FRAME_SELF).

    defer=True returns (d_dev, md_dev, finish): the per-plane device
    arrays (for downstream device consumers like the PVQ band search)
    plus a zero-argument finish() that fetches the numpy planes — so
    the caller can issue dependent device work before paying the
    device->host transfer."""
    import os
    use_pallas = os.environ.get("DAALA_TPU_PALLAS", "0") == "1"
    d_dev, md_dev = [], []
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
        fpr_mode = (info.bitdepth_mode
                    if np.asarray(padded_planes[pli]).dtype == np.uint16
                    else 0)
        mc_fpr_mode = (info.bitdepth_mode
                       if info.full_precision_references else 0)
        from daala_tpu.utils import devstats
        devstats.dispatch(plane, mc)
        d, md = inter_analysis_plane(plane, mc, mask_args, xdec=xdec,
                                     ydec=ydec, lossless=bool(lossless),
                                     fpr_mode=fpr_mode,
                                     mc_fpr_mode=mc_fpr_mode,
                                     pic_w=pic_w, pic_h=pic_h,
                                     use_pallas=use_pallas)
        if defer:
            d_dev.append(d)
            md_dev.append(md)
        else:
            d_out.append(devstats.fetch(d, np.int32))
            md_out.append(devstats.fetch(md, np.int32))
    if defer:
        from daala_tpu.utils import devstats

        def finish():
            devstats.prefetch(*(d_dev + md_dev))
            return ([devstats.fetch(d, np.int32) for d in d_dev],
                    [devstats.fetch(md, np.int32) for md in md_dev])
        return d_dev, md_dev, finish
    return d_out, md_out


# ---------------------------------------------------------------------------
# Block-size-RDO transform pyramid.
#
# During the trial-encode RDO pass (reference: od_encode_recursive with
# rdo_only, src/encode.c:1660-1850) every node of the luma block tree is
# evaluated: the "nosplit" hypothesis transforms the node span *before*
# its own split prefilter is applied, and the recursion always applies
# the split prefilter and descends.  Reconstruction writes only propagate
# upward, so the forward-transform input of every hypothesis is fully
# determined by the original frame and the fixed all-split lapping
# structure.  That makes the whole pyramid precomputable in one device
# pass: level l's tensor is the blockwise (4 << l)-point DCT of the frame
# after the frame prefilter and the split prefilters of all levels > l.
# The host trial pass consumes the tensors instead of re-running fdcts
# (native/frame_enc.inc block_encode_impl).


def _rdo_level_masks(state, info):
    """Full (all-split) hfilter/vfilter masks per luma level 1..4, with
    the reference's picture-edge conditions (src/encode.c:1760-1763)."""
    w = state.frame_width
    h = state.frame_height
    out = {}
    for bsi in range(1, OD_NBSIZES):
        n = 4 << bsi
        nby, nbx = h // n, w // n
        bxs = np.arange(nbx)[None, :]
        bys = np.arange(nby)[:, None]
        hm = ((bxs + 1) << (2 + bsi)) <= info.pic_width
        vm = ((bys + 1) << (2 + bsi)) <= info.pic_height
        out[bsi] = (np.broadcast_to(hm, (nby, nbx)).astype(np.uint8),
                    np.broadcast_to(vm, (nby, nbx)).astype(np.uint8))
    return out


def _pyramid_levels(c, level_masks, use_pallas):
    """Emit the per-level DCT tensors top-down while applying the
    all-split prefilters; level_masks[bsi] = (hmask, vmask) jnp arrays."""
    h, w = c.shape
    out = {}
    for bsi in range(OD_NBSIZES - 1, -1, -1):
        n = 4 << bsi
        out[bsi] = unblocks(dct.fdct2d(blocks_of(c, n)), h, w)
        if bsi > 0:
            hm, vm = level_masks[bsi]
            c = _masked_split_filter(c, hm, vm, n)
    return out, c


def _allsplit_haar_merge(d):
    """Haar-merge the DC tree of an all-split 4x4 DCT plane bottom-up
    (the keyframe rdo pass's compute_dcts output; every node merges)."""
    h, w = d.shape
    for bsi in range(1, OD_NBSIZES):
        n = 4 << bsi
        ones = jnp.ones((h // n, w // n), jnp.uint8)
        d = _masked_dc_merge(d, ones, n)
    return d


@functools.partial(jax.jit,
                   static_argnames=("lossless", "fpr_mode", "is_keyframe",
                                    "mc_fpr_mode", "pic_w", "pic_h",
                                    "use_pallas"))
def rdo_pyramid_luma(plane, mc_plane, level_mask_args, lossless=False,
                     fpr_mode=0, mc_fpr_mode=0, is_keyframe=True,
                     pic_w=None, pic_h=None, use_pallas=False):
    """Device RDO pyramid for the luma plane.

    Returns (d_levels, md_levels, d_rdo_merged):
      d_levels[l], l=0..4: blockwise (4 << l) DCT of the input after the
          frame prefilter and the all-split prefilters of levels > l;
      md_levels: same for the OBMC prediction (inter frames; else None);
      d_rdo_merged: keyframes only — level-0 tensor with the full DC
          Haar merge tree applied (what compute_dcts produces on the
          all-4x4 map for the haar-DC quantization prep)."""
    c = _lift_input(plane, fpr_mode, lossless)
    c = _prefilter_frame_dec(c, 0, 0, use_pallas=use_pallas)
    if is_keyframe:
        d_levels, _ = _pyramid_levels(c, level_mask_args, use_pallas)
        return d_levels, None, _allsplit_haar_merge(d_levels[0])
    mc = _lift_input(mc_plane, mc_fpr_mode, lossless)
    mc = _prefilter_frame_dec(mc, 0, 0, use_pallas=use_pallas)
    h, w = c.shape
    if pic_w is not None and (pic_w < w or pic_h < h):
        col = jnp.arange(w)[None, :] >= pic_w
        row = jnp.arange(h)[:, None] >= pic_h
        c = jnp.where(col | row, mc, c)
    d_levels, _ = _pyramid_levels(c, level_mask_args, use_pallas)
    md_levels, _ = _pyramid_levels(mc, level_mask_args, use_pallas)
    return d_levels, md_levels, None


def analyze_rdo_pyramid(state, info, padded_planes, mc_planes, lossless,
                        device_put_fn=None):
    """Run the device RDO pyramid for luma; returns
    (d_levels, md_levels_or_None, d_rdo_merged_or_None) as numpy int32
    dicts keyed by level."""
    import os
    use_pallas = os.environ.get("DAALA_TPU_PALLAS", "0") == "1"
    is_keyframe = mc_planes is None
    lm = _rdo_level_masks(state, info)
    level_mask_args = {k: (jnp.asarray(h), jnp.asarray(v))
                       for k, (h, v) in lm.items()}
    plane = np.asarray(padded_planes[0])
    fpr_mode = info.bitdepth_mode if plane.dtype == np.uint16 else 0
    mc = None
    mc_fpr_mode = 0
    if not is_keyframe:
        mc = np.asarray(mc_planes[0])
        mc_fpr_mode = (info.bitdepth_mode
                       if info.full_precision_references else 0)
    if device_put_fn is not None:
        plane = device_put_fn(plane, 0)
        if mc is not None:
            mc = device_put_fn(mc, 0)
    from daala_tpu.utils import devstats
    devstats.dispatch(plane, mc)
    d_l, md_l, d_m = rdo_pyramid_luma(
        plane, mc if mc is not None else plane, level_mask_args,
        lossless=bool(lossless), fpr_mode=fpr_mode,
        mc_fpr_mode=mc_fpr_mode, is_keyframe=is_keyframe,
        pic_w=info.pic_width, pic_h=info.pic_height,
        use_pallas=use_pallas)
    devstats.prefetch(*(list(d_l.values())
                        + (list(md_l.values()) if md_l else [])
                        + ([d_m] if d_m is not None else [])))
    d_out = {k: devstats.fetch(v, np.int32) for k, v in d_l.items()}
    md_out = (None if md_l is None
              else {k: devstats.fetch(v, np.int32)
                    for k, v in md_l.items()})
    dm_out = None if d_m is None else devstats.fetch(d_m, np.int32)
    return d_out, md_out, dm_out
