#!/usr/bin/env python3
"""RD-curve collection harness.

Python counterpart of the reference's tools/rd_collect.sh +
rd_collect_daala.sh: encode a clip across a quantizer sweep, decode,
measure quality, and emit one JSON line per point:
  {"quant": Q, "bytes": N, "bits_per_pixel": ..., "psnr": ...,
   "psnrhvs": ..., "ssim": ..., "msssim": ...}

Compare two runs with tools/bd_rate.py.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.utils import metrics as M
from daala_tpu.utils.y4m import Y4MReader

DEFAULT_QUANTS = [5, 8, 12, 18, 27, 40, 60, 90]


def _encode_ref(inp, out_y4m, quant, limit, b_frames):
    """Anchor curve: encode + decode with the reference C codec via the
    test oracle; returns the total packet bytes."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    import codec_oracle as co
    from daala_tpu.utils.y4m import Y4MWriter
    rd = Y4MReader(inp)
    enc = co.RefEncoder(rd.width, rd.height, quant=quant,
                        keyframe_rate=256, b_frames=b_frames or None)
    headers = enc.flush_headers()
    frames = []
    for planes in rd:
        frames.append(planes)
        if limit and len(frames) >= limit:
            break
    pkts = []
    for i, planes in enumerate(frames):
        pkts.extend(enc.encode_frame(planes, last=(i == len(frames) - 1)))
    nbytes = sum(len(p[0]) for p in pkts)
    dec = co.RefDecoder(headers)
    wr = Y4MWriter(out_y4m, rd.width, rd.height, fps=rd.fps,
                   chroma="420")
    for p, _gp in pkts:
        for fr in dec.decode_packet(p):
            wr.write_frame(fr)
    wr.close()
    return nbytes


def measure(orig, recon, limit):
    ra = Y4MReader(orig)
    rb = Y4MReader(recon)
    acc = {"psnr": [], "psnrhvs": [], "ssim": [], "msssim": [],
           "ciede2000": []}
    n = 0
    npix = 0
    for fa, fb in zip(ra, rb):
        a = fa[0].astype(np.float64)
        b = fb[0].astype(np.float64)
        acc["psnr"].append(M.psnr(a, b))
        acc["psnrhvs"].append(M.psnr_hvs(a, b))
        acc["ssim"].append(M.ssim(a, b))
        if min(len(fa), len(fb)) >= 3:
            acc["ciede2000"].append(M.ciede2000(fa, fb))
        if min(a.shape) >= 176:
            acc["msssim"].append(M.ms_ssim(a, b))
        npix += a.size
        n += 1
        if limit and n >= limit:
            break
    return {k: round(float(np.mean(v)), 6) if v else None
            for k, v in acc.items()}, n, npix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=None,
                    help="input .y4m (or --all for every clip in "
                         "$DAALA_CLIPS)")
    ap.add_argument("--all", action="store_true",
                    help="collect over every clip in $DAALA_CLIPS")
    ap.add_argument("-o", "--output", default=None,
                    help="output .json (default: <input>.rd.json)")
    ap.add_argument("-q", "--quants", default=None,
                    help="comma-separated -v values")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("-b", "--b-frames", type=int, default=0)
    ap.add_argument("--extra", default="",
                    help="extra args passed to tools/encode.py")
    ap.add_argument("--codec", default="daala_tpu",
                    choices=["daala_tpu", "ref"],
                    help="'ref' encodes with the reference C encoder "
                         "(compiled oracle) for anchor curves")
    args = ap.parse_args()

    quants = ([int(q) for q in args.quants.split(",")] if args.quants
              else DEFAULT_QUANTS)
    here = os.path.dirname(os.path.abspath(__file__))
    if args.all:
        sys.path.insert(0, os.path.dirname(here))
        from daala_tpu.utils import clips
        inputs = clips.find_clips()
        if not inputs:
            print("rd_collect: SKIP — " + clips.skip_reason())
            return
    elif args.input:
        inputs = [args.input]
    else:
        ap.error("give an input .y4m or --all (with $DAALA_CLIPS set)")
    for inp in inputs:
        out_path = (args.output if args.output and len(inputs) == 1
                    else inp + ".rd.json")
        results = []
        with tempfile.TemporaryDirectory() as td:
            for q in quants:
                ogv = os.path.join(td, "q%d.ogv" % q)
                y4m = os.path.join(td, "q%d.y4m" % q)
                if args.codec == "ref":
                    nbytes = _encode_ref(inp, y4m, q, args.limit,
                                         args.b_frames)
                else:
                    cmd = [sys.executable,
                           os.path.join(here, "encode.py"),
                           inp, ogv, "-v", str(q), "-b",
                           str(args.b_frames)]
                    if args.limit:
                        cmd += ["--limit", str(args.limit)]
                    cmd += [a for a in args.extra.split() if a]
                    subprocess.run(cmd, check=True, capture_output=True)
                    subprocess.run([sys.executable,
                                    os.path.join(here, "decode.py"),
                                    ogv, y4m],
                                   check=True, capture_output=True)
                    # Count video packet payloads only, matching what
                    # the reference anchor counts (no Ogg container
                    # overhead, no header packets).
                    from daala_tpu.utils.ogg import read_ogg_packets
                    with open(ogv, "rb") as f:
                        nbytes = sum(len(p)
                                     for p, _g in read_ogg_packets(f)
                                     if p and not (p[0] & 0x80))
                vals, n, npix = measure(inp, y4m, args.limit)
                point = {"quant": q, "bytes": nbytes, "frames": n,
                         "bits_per_pixel": round(nbytes * 8.0 / npix, 6)}
                point.update(vals)
                results.append(point)
                print(json.dumps(point))
        with open(out_path, "w") as f:
            for p in results:
                f.write(json.dumps(p) + "\n")
        print("wrote %s" % out_path, file=sys.stderr)


if __name__ == "__main__":
    main()
