#!/usr/bin/env python3
"""BD-rate of this encoder vs the reference C encoder on the synthetic
content classes (tests/content.py): smooth / texture / mixed.

Counterpart of running the reference's rd_collect.sh on both encoders and
diffing with bd_rate.sh.  Negative = we need fewer bits at equal PSNR.

Usage: python tools/rd_compare.py [--size WxH] [--frames N] [--quants ...]
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(HERE), os.path.join(os.path.dirname(HERE),
                                                    "tests")]


def make_class(kind, w, h, n, seed=1):
    import content
    rng = np.random.default_rng(seed)
    pad = 64
    yy, xx = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad]
    if kind == "smooth":
        base = (110 + 70 * np.sin(xx / 97.0) + 50 * np.cos(yy / 83.0)
                + 20 * np.sin((xx + yy) / 151.0))
    elif kind == "texture":
        base = 128 + content._lowpass(rng.normal(0, 55, yy.shape), 3) \
            + content._lowpass(rng.normal(0, 40, yy.shape), 9)
    elif kind == "natural":
        # Natural-statistics class: octave texture + parallax occluder
        # + film grain (tests/content.py make_natural_clip).
        return content.make_natural_clip(w, h, n, seed=seed)
    else:
        return content.make_clip(w, h, n, seed=seed)
    frames = []
    for t in range(n):
        ox, oy = pad + int(round(1.3 * t)), pad + int(round(0.6 * t))
        y = base[oy:oy + h, ox:ox + w].clip(0, 255).astype(np.uint8)
        cb = (128 + 24 * np.sin((xx[oy:oy + h:2, ox:ox + w:2]) / 67.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 + 24 * np.cos((yy[oy:oy + h:2, ox:ox + w:2]) / 71.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cr])
    return frames


def run_ours(frames, w, h, q, complexity, mv_max_level=None,
             mv_iters=None, lam_sad_scale=None, mv_decimate=0,
             mv_sel_gate=0, mv_sel_disp=0):
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.encoder import Encoder
    from daala_tpu.codec.decoder import Decoder
    info = H.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=q, complexity=complexity)
    if mv_max_level is not None:
        enc.mv_max_level = mv_max_level
    if mv_iters is not None:
        enc.mv_refine_iters = mv_iters
    if lam_sad_scale is not None:
        enc.lam_sad_scale = lam_sad_scale
    if mv_decimate:
        enc.mv_decimate = mv_decimate
    if mv_sel_gate:
        enc.mv_sel_gate = mv_sel_gate
    if mv_sel_disp:
        enc.mv_sel_disp = mv_sel_disp
    enc.keyframe_rate = 256
    pkts = list(enc.flush_headers())
    nb = 0
    for fr in frames:
        for p in enc.encode_frame(fr):
            nb += len(p)
            pkts.append(p)
    for p in enc.flush():
        nb += len(p)
        pkts.append(p)
    dec = Decoder(info)
    outs = []
    for p in pkts[3:]:
        outs.extend(dec.decode_packet(p))
    return nb, outs


def run_ref(frames, w, h, q, complexity):
    import codec_oracle as co
    enc = co.RefEncoder(w, h, quant=q, complexity=complexity,
                        keyframe_rate=256)
    hdrs = enc.flush_headers()
    pkts = []
    nb = 0
    for i, fr in enumerate(frames):
        for p, _ in enc.encode_frame(fr, last=(i == len(frames) - 1)):
            nb += len(p)
            pkts.append(p)
    dec = co.RefDecoder(hdrs)
    outs = []
    for p in pkts:
        outs.extend(dec.decode_packet(p))
    return nb, outs


def mean_psnr(frames, outs):
    from daala_tpu.utils.metrics import psnr
    vals = []
    for a, b in zip(frames, outs):
        vals.append(psnr(a[0].astype(np.float64), b[0].astype(np.float64)))
    return float(np.mean(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--complexity", type=int, default=7)
    ap.add_argument("--quants", type=int, nargs="*",
                    default=[10, 18, 30, 50, 80])
    ap.add_argument("--classes", nargs="*",
                    default=["smooth", "texture", "mixed", "natural"])
    ap.add_argument("--mv-max-level", type=int, default=None)
    ap.add_argument("--mv-iters", type=int, default=None)
    ap.add_argument("--lam-sad-scale", type=float, default=None)
    ap.add_argument("--mv-decimate", type=int, default=0)
    ap.add_argument("--mv-sel-gate", type=int, default=0)
    ap.add_argument("--mv-sel-disp", type=int, default=0)
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    from daala_tpu.utils.metrics import bd_rate
    for kind in args.classes:
        frames = make_class(kind, w, h, args.frames)
        r_our, d_our, r_ref, d_ref = [], [], [], []
        for q in args.quants:
            nb_o, out_o = run_ours(frames, w, h, q, args.complexity,
                                   args.mv_max_level, args.mv_iters,
                                   args.lam_sad_scale, args.mv_decimate,
                                   args.mv_sel_gate, args.mv_sel_disp)
            nb_r, out_r = run_ref(frames, w, h, q, args.complexity)
            r_our.append(nb_o)
            d_our.append(mean_psnr(frames, out_o))
            r_ref.append(nb_r)
            d_ref.append(mean_psnr(frames, out_r))
        bd = bd_rate(r_ref, d_ref, r_our, d_our)
        print("%-8s BD-rate vs reference: %+.2f%%   "
              "(ours bits %s, ref bits %s)"
              % (kind, bd, r_our, r_ref))


if __name__ == "__main__":
    main()
