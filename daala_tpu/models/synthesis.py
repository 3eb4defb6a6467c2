"""Device-side frame synthesis: the decoder's reconstruction back-end as
one jittable, shardable pass per plane.

Mirror of daala_tpu/models/keyframe.py (the encoder's device analysis):
re-expresses the per-block IDCT + recursive split postfilters + frame
lapped postfilter (decoder.py _block_decode / _decode_recursive /
_decode_coefficients tails; reference: src/decode.c:482-598 block
synthesis, src/filter.c:1486-1610 postfilters) TPU-first:

  leaf coefficients `d` -> per-size masked blockwise IDCT
    -> masked split postfilters (bottom-up: children before parents,
       vertical midlines before horizontal, matching od_postfilter_split)
    -> frame lapped postfilter (vertical superblock edges then
       horizontal)

The host entropy decoder produces the leaf `d` plane and the block-size
map; everything after that is pure signal processing with static shapes,
so the whole pass jits and shards (the 4-pixel lap at shard edges
becomes an XLA halo exchange).  All arithmetic is int32 lifting —
bit-exact with the host reconstruction on any backend
(tests/test_device_synthesis.py), and composes with the jittable
deringing filter (daala_tpu/models/restore.py) for a full device decode
back-end.  Works for intra and inter frames alike: both reconstruct as
IDCT of the final leaf coefficients (inter leaves hold prediction +
residual by the time decode finishes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from daala_tpu.models.analysis import (_filter_rows_at, _filter_cols_at,
                                       blocks_of, unblocks)
from daala_tpu.models.keyframe import build_analysis_masks
from daala_tpu.ops import _lifting as L
from daala_tpu.ops import dct

OD_NBSIZES = 5


def _masked_split_postfilter(c, hmask, vmask, n):
    """od_postfilter_split for every split node of size n, vectorized
    and masked (inverse of keyframe._masked_split_filter): vertical
    midlines first, then horizontal."""
    h, w = c.shape
    nby, nbx = h // n, w // n
    half = n // 2
    # Vertical midlines (cols), gated by vmask.
    cols = jnp.arange(nbx) * n + half - 2
    idx = cols[:, None] + jnp.arange(4)[None, :]
    band = c[:, idx]  # (h, nbx, 4)
    out = L.post_filter4([band[:, :, k] for k in range(4)])
    band_f = jnp.stack(out, axis=2)
    keep = jnp.repeat(vmask.astype(bool), n, axis=0)[:, :, None]
    c = c.at[:, idx].set(jnp.where(keep, band_f, band))
    # Horizontal midlines (rows), gated by hmask.
    rows = jnp.arange(nby) * n + half - 2
    idx = rows[:, None] + jnp.arange(4)[None, :]
    band = c[idx]  # (nby, 4, w)
    out = L.post_filter4([band[:, k, :] for k in range(4)])
    band_f = jnp.stack(out, axis=1)
    keep = jnp.repeat(hmask.astype(bool), n, axis=1)[:, None, :]
    c = c.at[idx].set(jnp.where(keep, band_f, band))
    return c


def _postfilter_frame_dec(c, xdec, ydec, use_pallas=False):
    """Frame lapped postfilter (filter.py apply_postfilter_frame_sbs):
    vertical superblock edges first, then horizontal.  With use_pallas
    the bands run as Pallas stripe kernels (bit-identical)."""
    if use_pallas:
        from daala_tpu.ops.pallas.lap_kernels import lap_frame_pallas
        return lap_frame_pallas(c, sb_x=64 >> xdec, sb_y=64 >> ydec,
                                forward=False)
    h, w = c.shape
    sb_y = 64 >> ydec
    sb_x = 64 >> xdec
    col_starts = [sbx * sb_x - 2 for sbx in range(1, w // sb_x)]
    row_starts = [sby * sb_y - 2 for sby in range(1, h // sb_y)]
    c = _filter_cols_at(c, col_starts, inv=True)
    c = _filter_rows_at(c, row_starts, inv=True)
    return c


@functools.partial(jax.jit,
                   static_argnames=("xdec", "ydec", "use_pallas"))
def synthesis_plane(d, mask_args, xdec=0, ydec=0, use_pallas=False):
    """Device synthesis of one plane: leaf coefficient plane `d` (int32,
    as the host entropy decode leaves it) -> reconstructed coefficient
    plane `c` (int32, pre-dering), bit-exact with the host path.

    mask_args: (split_h, split_v, merge, leaf) dicts as produced by
    keyframe.build_analysis_masks (merge is unused here: the decoder
    un-merges the DC tree during symbol decode)."""
    (split_h, split_v, _merge, leaf) = mask_args
    h, w = d.shape
    # Per-size leaf IDCTs, mask-combined.
    c = jnp.zeros_like(d)
    for bs_p in sorted(leaf.keys()):
        n = 4 << bs_p
        cn = unblocks(dct.idct2d(blocks_of(d, n)), h, w)
        m = jnp.repeat(jnp.repeat(leaf[bs_p].astype(bool), n, axis=0),
                       n, axis=1)
        c = jnp.where(m, cn, c)
    # Split postfilters, bottom level up (children before parents).
    for bsi in range(1, OD_NBSIZES):
        n = 4 << (bsi - xdec)
        c = _masked_split_postfilter(c, split_h[bsi], split_v[bsi], n)
    return _postfilter_frame_dec(c, xdec, ydec, use_pallas=use_pallas)


def synthesize_frame(state, info, d_planes, device_put_fn=None):
    """Run the device synthesis for every plane; returns the
    reconstructed (pre-dering) coefficient planes as numpy int32."""
    out = []
    for pli in range(info.nplanes):
        xdec, ydec = info.plane_dec[pli]
        masks = build_analysis_masks(state, info, pli)
        mask_args = (
            {k: jnp.asarray(v) for k, v in masks["split_h"].items()},
            {k: jnp.asarray(v) for k, v in masks["split_v"].items()},
            {k: jnp.asarray(v) for k, v in masks["merge"].items()},
            {k: jnp.asarray(v) for k, v in masks["leaf"].items()})
        d = d_planes[pli]
        if device_put_fn is not None:
            d = device_put_fn(np.asarray(d), pli)
        import os
        c = synthesis_plane(
            jnp.asarray(d), mask_args, xdec=xdec, ydec=ydec,
            use_pallas=os.environ.get("DAALA_TPU_PALLAS", "0") == "1")
        # Writable copy: the caller's dering stage mutates the plane.
        out.append(np.array(c, np.int32))
    return out
