#!/usr/bin/env python3
"""Bitstream analyzer (terminal edition).

Console/JSON counterpart of the reference's wxWidgets analyzer
(reference: examples/analyzer.cc): per-frame block-size maps, motion
vector mesh, dering levels, skip maps, and per-symbol-class bit
accounting from the decoder's accounting hook (reference:
src/accounting.c, include/daala/daaladec.h:54-90).

Usage:
  python tools/analyze.py stream.ogv                 # summary per frame
  python tools/analyze.py stream.ogv --bsize --mv    # ASCII overlays
  python tools/analyze.py stream.ogv --json out.json # machine-readable
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.utils.ogg import read_ogg_packets


BS_CHARS = "48ABC"  # 4x4, 8x8, 16x16(A), 32x32(B), 64x64(C)


def bsize_ascii(st, info):
    h8 = info.frame_height >> 3
    w8 = info.frame_width >> 3
    m = st.bsize[:h8, :w8]
    return "\n".join("".join(BS_CHARS[min(int(v), 4)] for v in row)
                     for row in m)


def mv_ascii(grid):
    """One char per level-0 vertex: direction arrow of its MV."""
    arrows = "·→↗↑↖←↙↓↘"
    out = []
    for vy in range(0, grid.nvmvbs + 1, 8):
        row = []
        for vx in range(0, grid.nhmvbs + 1, 8):
            if not grid.valid[vy, vx]:
                row.append(" ")
                continue
            mvx, mvy = grid.mv_for(vy, vx) if hasattr(grid, "mv_for") \
                else (int(grid.mv[vy, vx, 0]), int(grid.mv[vy, vx, 1]))
            if mvx == 0 and mvy == 0:
                row.append("·")
            else:
                ang = int(round(np.arctan2(-mvy, mvx) / (np.pi / 4))) % 8
                row.append(arrows[1 + ang])
        out.append("".join(row))
    return "\n".join(out)


def _write_heatmap(prefix, frame_no, heat, info):
    """Render the per-location accounting as a bits-per-4x4-block image
    (8-bit PGM, log scale) plus the raw Q3 counts as text."""
    h4 = info.pic_height + 3 >> 2
    w4 = info.pic_width + 3 >> 2
    m = heat[:h4, :w4].astype(np.float64)
    with open("%s_%04d.txt" % (prefix, frame_no), "w") as f:
        for row in m.astype(np.int64):
            f.write(" ".join(str(int(v)) for v in row) + "\n")
    img = np.zeros((h4, w4), np.uint8)
    nz = m > 0
    if nz.any():
        lg = np.log2(1.0 + m)
        img = np.clip(255.0 * lg / max(1e-9, lg.max()), 0,
                      255).astype(np.uint8)
    with open("%s_%04d.pgm" % (prefix, frame_no), "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w4, h4))
        f.write(img.tobytes())


def _html_frame(dec, info, rec, heat):
    """Collect one frame's HTML-analyzer payload (image + overlays)."""
    from daala_tpu.utils.png import png_bytes
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert import ycbcr_to_rgb
    st = dec.state
    planes = [np.asarray(p) for p in dec.last_recon]
    if planes and planes[0].dtype != np.uint8:
        # High-depth recon: shadow down to 8 bits for display.
        shift = 2 * (info.bitdepth_mode - 1)
        planes = [np.clip((p.astype(np.int32) + (1 << shift >> 1))
                          >> shift, 0, 255).astype(np.uint8)
                  for p in planes]
    rgb = ycbcr_to_rgb(planes)
    h8, w8 = info.frame_height >> 3, info.frame_width >> 3
    h4, w4 = (info.pic_height + 3) >> 2, (info.pic_width + 3) >> 2
    mv = []
    if st.frame_type != 0:
        g = dec.mv_grid
        for vy in range(g.nvmvbs + 1):
            for vx in range(g.nhmvbs + 1):
                if not g.valid[vy, vx]:
                    continue
                mvx, mvy = int(g.mv[vy, vx, 0]), int(g.mv[vy, vx, 1])
                if mvx or mvy:
                    mv.append([vx, vy, mvx, mvy, int(g.ref[vy, vx])])
    nhsb = info.frame_width >> 6
    dering = [[int(v) for v in row] for row in
              np.asarray(st.dering_level).reshape(-1, nhsb)]
    skip = [[int(v) for v in row]
            for row in np.asarray(st.bskip[0])[:h4, :w4]]
    return {
        "img": png_bytes(rgb[:info.pic_height, :info.pic_width]),
        "meta": rec if "dering_levels" not in rec else
                {k: v for k, v in rec.items() if k != "dering_levels"},
        "bsize": [[int(v) for v in row]
                  for row in st.bsize[:h8, :w8]],
        "mv": mv, "mvsp": 8, "skip": skip, "dering": dering,
        "heat": [[int(v) for v in row] for row in heat[:h4, :w4]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", help=".ogv input")
    ap.add_argument("--bsize", action="store_true",
                    help="print block-size map per frame")
    ap.add_argument("--mv", action="store_true",
                    help="print MV direction map per frame")
    ap.add_argument("--dering", action="store_true",
                    help="print dering levels per superblock")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--json", metavar="FILE", default=None)
    ap.add_argument("--heatmap", metavar="PREFIX", default=None,
                    help="write per-frame bits-per-4x4-block heatmaps "
                         "(PREFIX_NNNN.pgm + gnuplot-able .txt), built "
                         "from the per-location accounting records "
                         "(reference: examples/analyzer.cc:353-366)")
    ap.add_argument("--html", metavar="FILE", default=None,
                    help="write a self-contained interactive HTML "
                         "analyzer (zoom, frame navigation, block-size/"
                         "MV/skip/dering/bit-heatmap overlays) — the "
                         "GUI counterpart of the reference's wx "
                         "analyzer (examples/analyzer.cc:115)")
    args = ap.parse_args()

    with open(args.stream, "rb") as f:
        pkts = [p[0] if isinstance(p, tuple) else p
                for p in read_ogg_packets(f)]
    info = None
    video_pkts = []
    for p in pkts:
        if p and (p[0] & 0x80):
            info, _ = H.decode_header(p, info)
        elif p:
            video_pkts.append(p)
    dec = Decoder(info)
    dec.accounting_enabled = True
    results = []
    html_frames = []
    n = 0
    for pkt in video_pkts:
        dec.decode_packet(pkt)
        st = dec.state
        acct = defaultdict(int)
        heat = np.zeros(((info.frame_height >> 2) + 1,
                         (info.frame_width >> 2) + 1), np.int64)
        for name, bits_q3, x, y, layer, level in (dec.accounting or []):
            acct[name] += bits_q3
            if x >= 0 and layer >= 0:
                # Chroma locations are in the decimated 4x4 grid; scale
                # to luma-grid positions like the analyzer heatmap.
                sh = 0 if layer == 0 else 1
                hy = min(y << sh, heat.shape[0] - 1)
                hx = min(x << sh, heat.shape[1] - 1)
                heat[hy, hx] += bits_q3
        h8 = info.frame_height >> 3
        w8 = info.frame_width >> 3
        bs_hist = np.bincount(st.bsize[:h8, :w8].reshape(-1),
                              minlength=5)[:5]
        nverts = int(dec.mv_grid.valid.sum()) if st.frame_type != 0 else 0
        rec = {
            "frame": n,
            "bytes": len(pkt),
            "frame_type": "IPB"[st.frame_type],
            "quantizer": int(st.quantizer),
            "bsize_histogram_8x8units": {
                "4x4": int(bs_hist[0]), "8x8": int(bs_hist[1]),
                "16x16": int(bs_hist[2]), "32x32": int(bs_hist[3]),
                "64x64": int(bs_hist[4])},
            "mv_vertices": nverts,
            "dering_levels": [int(v) for v in
                              np.asarray(st.dering_level).reshape(-1)],
            "bits_by_symbol_class_q3": dict(sorted(acct.items())),
            "bits_total_q3": int(sum(acct.values())),
        }
        results.append(rec)
        if not args.json:
            print("frame %d (%s) %dB q=%d verts=%d  bits/8 by class: %s"
                  % (n, rec["frame_type"], len(pkt), st.quantizer, nverts,
                     " ".join("%s=%d" % kv
                              for kv in sorted(acct.items(),
                                               key=lambda kv: -kv[1])[:5])))
            if args.bsize:
                print(bsize_ascii(st, info))
            if args.mv and st.frame_type != 0:
                print(mv_ascii(dec.mv_grid))
            if args.dering:
                nhdr = info.frame_width >> 6
                lv = np.array(rec["dering_levels"]).reshape(-1, nhdr)
                print("\n".join("".join(str(int(v)) for v in row)
                                for row in lv))
        if args.heatmap:
            _write_heatmap(args.heatmap, n, heat, info)
        if args.html:
            html_frames.append(_html_frame(dec, info, rec, heat))
        n += 1
        if args.limit and n >= args.limit:
            break
    if args.html:
        from analyzer_html import write_html
        write_html(args.html, html_frames, info.pic_width,
                   info.pic_height)
        print("wrote %s (%d frames)" % (args.html, len(html_frames)))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote %s (%d frames)" % (args.json, n))


if __name__ == "__main__":
    main()
