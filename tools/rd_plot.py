#!/usr/bin/env python3
"""Plot RD curves (rate/quality) from rd_collect JSONL files.

Equivalent of the reference's tools/rd_plot.sh (gnuplot): one PNG per
metric, log-x bits/pixel, one labeled curve per input file.
"""

import argparse
import json
import os


def load(path):
    pts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                pts.append(json.loads(line))
    pts.sort(key=lambda p: p["bits_per_pixel"] or 0)
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="*.rd.json files")
    ap.add_argument("-m", "--metrics", default="psnr,psnrhvs,ssim",
                    help="comma-separated metric keys to plot")
    ap.add_argument("-p", "--prefix", default="rd",
                    help="output file prefix (<prefix>-<metric>.png)")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = [(os.path.basename(p).replace(".rd.json", ""), load(p))
              for p in args.inputs]
    for metric in args.metrics.split(","):
        metric = metric.strip()
        fig, ax = plt.subplots(figsize=(10.24, 7.68))
        drew = False
        for label, pts in curves:
            xs = [p["bits_per_pixel"] for p in pts
                  if p.get(metric) is not None]
            ys = [p[metric] for p in pts if p.get(metric) is not None]
            if xs:
                ax.plot(xs, ys, marker="o", label=label)
                drew = True
        if not drew:
            plt.close(fig)
            print("skipping %s: no data" % metric)
            continue
        ax.set_xscale("log")
        ax.set_xlabel("Bits/Pixel")
        ax.set_ylabel({"ssim": "SSIM", "msssim": "MS-SSIM"}.get(
            metric, metric.upper() + " (dB)"))
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
        out = "%s-%s.png" % (args.prefix, metric)
        fig.savefig(out, dpi=100)
        plt.close(fig)
        print("wrote %s" % out)


if __name__ == "__main__":
    main()
