#!/usr/bin/env python3
"""Average RD curves from several clips into one curve.

Equivalent of the reference's tools/rd_average.sh: group points by
quantizer, sum sizes/bytes, and average each quality metric weighted by
pixel count, so larger clips contribute proportionally.  Input files are
the JSONL outputs of tools/rd_collect.py.
"""

import argparse
import json
import sys


def load_points(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="*.rd.json files")
    ap.add_argument("-o", "--output", default="total.rd.json")
    args = ap.parse_args()

    groups = {}
    for path in args.inputs:
        if path == args.output:
            sys.exit("error: %s is also the output; remove it first"
                     % path)
        for p in load_points(path):
            q = p["quant"]
            g = groups.setdefault(q, {"quant": q, "bytes": 0, "npix": 0,
                                      "frames": 0, "metrics": {}})
            npix = int(round(p["bytes"] * 8.0 / p["bits_per_pixel"])) \
                if p.get("bits_per_pixel") else 0
            g["bytes"] += p["bytes"]
            g["npix"] += npix
            g["frames"] += p.get("frames", 0)
            for k, v in p.items():
                if k in ("quant", "bytes", "frames", "bits_per_pixel"):
                    continue
                if v is None:
                    continue
                acc = g["metrics"].setdefault(k, [0.0, 0])
                acc[0] += v * npix
                acc[1] += npix
    out = []
    for q in sorted(groups):
        g = groups[q]
        point = {"quant": q, "bytes": g["bytes"], "frames": g["frames"],
                 "bits_per_pixel": round(g["bytes"] * 8.0 / g["npix"], 6)
                 if g["npix"] else None}
        for k, (s, w) in sorted(g["metrics"].items()):
            point[k] = round(s / w, 6) if w else None
        out.append(point)
    with open(args.output, "w") as f:
        for p in out:
            f.write(json.dumps(p) + "\n")
            print(json.dumps(p))
    print("wrote %s (%d clips, %d points)"
          % (args.output, len(args.inputs), len(out)), file=sys.stderr)


if __name__ == "__main__":
    main()
