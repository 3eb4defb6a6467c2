#!/usr/bin/env python3
"""Bjøntegaard-delta rate between two rd_collect.py result files.

Counterpart of the reference's tools/bd_rate.sh + bjontegaard.c: reports
the average bitrate change (%) at equal quality over the overlapping
quality interval, per metric.  Negative means file2 needs fewer bits
than file1.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.utils.metrics import bd_rate


def load(path):
    pts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                pts.append(json.loads(line))
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="rd_collect output (anchor)")
    ap.add_argument("test", help="rd_collect output (candidate)")
    ap.add_argument("-m", "--metrics", default="psnr,psnrhvs,ssim,msssim")
    args = ap.parse_args()
    a = load(args.baseline)
    b = load(args.test)
    for metric in args.metrics.split(","):
        da = [(p["bits_per_pixel"], p.get(metric)) for p in a
              if p.get(metric) is not None]
        db = [(p["bits_per_pixel"], p.get(metric)) for p in b
              if p.get(metric) is not None]
        if len(da) < 4 or len(db) < 4:
            print("%-8s: n/a (need >=4 points)" % metric)
            continue
        v = bd_rate([r for r, _ in da], [d for _, d in da],
                    [r for r, _ in db], [d for _, d in db])
        print("%-8s: %+0.2f%%" % (metric, v))


if __name__ == "__main__":
    main()
