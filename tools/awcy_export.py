#!/usr/bin/env python3
"""Export rd_collect.py results as AWCY-format .out files.

The reference submits encoder runs to arewecompressedyet.com
(reference: tools/submit_awcy.py); the site's rd_tool stores one
whitespace-separated .out file per clip with a row per operating point.
This tool produces that artifact offline from one or more
`tools/rd_collect.py` JSON outputs, so a run can be uploaded or diffed
against AWCY anchors without network access.

Row format (one per quantizer, ascending):
  quantizer  pixels  bytes  psnr  psnrhvs  ssim  msssim  ciede2000

Missing metrics (e.g. MS-SSIM on small clips) are written as 0, which
AWCY's plotter treats as absent.
"""

import argparse
import json
import os
import sys


def load_points(path):
    pts = []
    with open(path) as f:
        txt = f.read()
    for line in txt.splitlines():
        line = line.strip()
        if not line:
            continue
        pts.append(json.loads(line))
    pts.sort(key=lambda p: p["quant"])
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+",
                    help="rd_collect .rd.json files (one per clip)")
    ap.add_argument("-o", "--outdir", default="awcy_out",
                    help="output directory for the .out files")
    ap.add_argument("--suffix", default="-daala",
                    help="clip filename suffix (AWCY convention)")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    for path in args.inputs:
        pts = load_points(path)
        clip = os.path.basename(path)
        for ext in (".rd.json", ".json", ".y4m"):
            if clip.endswith(ext):
                clip = clip[:-len(ext)]
        out = os.path.join(args.outdir, clip + args.suffix + ".out")
        with open(out, "w") as f:
            for p in pts:
                npix = int(round(p["bytes"] * 8.0
                                 / max(p["bits_per_pixel"], 1e-12)))
                row = [p["quant"], npix, p["bytes"]]
                for k in ("psnr", "psnrhvs", "ssim", "msssim",
                          "ciede2000"):
                    v = p.get(k)
                    row.append(0 if v is None else v)
                f.write(" ".join(str(v) for v in row) + "\n")
        print("wrote %s (%d points)" % (out, len(pts)), file=sys.stderr)


if __name__ == "__main__":
    main()
