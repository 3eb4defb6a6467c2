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
    n = 0
    for pkt in video_pkts:
        dec.decode_packet(pkt)
        st = dec.state
        acct = defaultdict(int)
        for name, bits_q3 in (dec.accounting or []):
            acct[name] += bits_q3
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
        n += 1
        if args.limit and n >= args.limit:
            break
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote %s (%d frames)" % (args.json, n))


if __name__ == "__main__":
    main()
