#!/usr/bin/env python3
"""Quality metrics between two y4m files.

One tool covering the reference's dump_psnr, dump_psnrhvs, dump_ssim and
dump_msssim (reference: tools/dump_psnr.c, tools/dump_psnrhvs.c,
tools/dump_ssim.c, tools/dump_msssim.c, tools/dump_fastssim.c):
per-frame and aggregate values
per plane, same frame-skipping/limit conventions.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.utils import metrics as M
from daala_tpu.utils.y4m import Y4MReader

METRICS = {
    "psnr": M.psnr,
    "psnrhvs": M.psnr_hvs,
    "ssim": M.ssim,
    "msssim": M.ms_ssim,
    "fastssim": M.fast_ssim,
    "ciede2000": None,  # full-frame color metric, special-cased below
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reference", help="original .y4m")
    ap.add_argument("test", help="distorted .y4m")
    ap.add_argument("-m", "--metric", default="psnr",
                    choices=sorted(METRICS))
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--luma-only", action="store_true")
    ap.add_argument("--frames", action="store_true",
                    help="print per-frame values")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    fn = METRICS[args.metric]
    ra = Y4MReader(args.reference)
    rb = Y4MReader(args.test)
    if (ra.width, ra.height) != (rb.width, rb.height):
        sys.exit("error: resolution mismatch")
    per_frame = []
    n = 0
    for fa, fb in zip(ra, rb):
        if args.metric == "ciede2000":
            if min(len(fa), len(fb)) < 3:
                sys.exit("error: ciede2000 needs 3 planes")
            vals = [M.ciede2000(fa, fb)]
        else:
            nplanes = 1 if args.luma_only else min(len(fa), len(fb))
            vals = [float(fn(fa[p].astype(np.float64),
                             fb[p].astype(np.float64)))
                    for p in range(nplanes)]
        per_frame.append(vals)
        if args.frames and not args.json:
            print("%d: %s" % (n, " ".join("%.4f" % v for v in vals)))
        n += 1
        if args.limit and n >= args.limit:
            break
    if not per_frame:
        sys.exit("error: no frames")
    agg = np.mean(np.array([f + [f[0]] * (3 - len(f)) for f in per_frame])
                  [:, :len(per_frame[0])], axis=0)
    if args.json:
        print(json.dumps({"metric": args.metric, "frames": n,
                          "mean": [round(float(v), 6) for v in agg],
                          "per_frame": per_frame if args.frames else None}))
    else:
        names = (["frame"] if args.metric == "ciede2000"
                 else ["Y", "Cb", "Cr"])[:len(per_frame[0])]
        print("%s over %d frames: %s" % (
            args.metric.upper(), n,
            "  ".join("%s %.4f" % (nm, v) for nm, v in zip(names, agg))))


if __name__ == "__main__":
    main()
