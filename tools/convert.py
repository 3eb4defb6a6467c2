#!/usr/bin/env python3
"""Format converters.

One multi-tool covering the reference's converter suite (reference:
tools/png2y4m.c, tools/y4m2png.c, tools/y4m2yuv.c, tools/yuv2yuv4mpeg.c,
tools/to_monochrome.c, tools/downsample.c, tools/upsample.c):

  python tools/convert.py png2y4m frame%03d.png out.y4m [--fps 30:1]
  python tools/convert.py y4m2png in.y4m out%03d.png [--limit N]
  python tools/convert.py y4m2yuv in.y4m out.yuv
  python tools/convert.py yuv2y4m in.yuv out.y4m -s WxH [--fps N:D]
  python tools/convert.py mono in.y4m out.y4m
  python tools/convert.py downsample in.y4m out.y4m
  python tools/convert.py upsample in.y4m out.y4m

RGB<->Y'CbCr uses BT.601 full-swing like the reference converters.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.utils import png as PNG
from daala_tpu.utils.y4m import Y4MReader, Y4MWriter


def rgb_to_ycbcr420(rgb):
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 16 + (65.481 * r + 128.553 * g + 24.966 * b) / 255
    cb = 128 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255
    cr = 128 + (112.0 * r - 93.786 * g - 18.214 * b) / 255
    h, w = y.shape
    h2, w2 = h - h % 2, w - w % 2
    cb = cb[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    cr = cr[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)
    return [clip(y), clip(cb), clip(cr)]


def ycbcr_to_rgb(planes):
    y = planes[0].astype(np.float64)
    h, w = y.shape
    if len(planes) >= 3:
        cb = planes[1].astype(np.float64)
        cr = planes[2].astype(np.float64)
        if cb.shape != y.shape:
            cb = cb.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
            cr = cr.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
    else:
        cb = cr = np.full((h, w), 128.0)
    yy = (y - 16) * 255 / 219
    u = (cb - 128) * 255 / 224
    v = (cr - 128) * 255 / 224
    r = yy + 1.402 * v
    g = yy - 0.344136 * u - 0.714136 * v
    b = yy + 1.772 * u
    return np.clip(np.round(np.stack([r, g, b], -1)), 0,
                   255).astype(np.uint8)


def parse_fps(s):
    n, _, d = s.partition(":")
    return (int(n), int(d or "1"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["png2y4m", "y4m2png", "y4m2yuv",
                                     "yuv2y4m", "mono", "downsample",
                                     "upsample"])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--fps", default="30:1")
    ap.add_argument("-s", "--size", default=None, help="WxH for yuv2y4m")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()
    fps = parse_fps(args.fps)

    if args.mode == "png2y4m":
        frames = []
        if "%" in args.input:
            i = 0
            while True:
                p = args.input % i
                if not os.path.exists(p):
                    if i > 0:
                        break
                    i += 1
                    continue
                frames.append(p)
                i += 1
                if args.limit and len(frames) >= args.limit:
                    break
        else:
            frames = [args.input]
        if not frames:
            sys.exit("no input frames")
        first = PNG.read_png(frames[0])
        h, w = first.shape[:2]
        wr = Y4MWriter(args.output, w, h, fps=fps, chroma="420")
        for p in frames:
            img = PNG.read_png(p)
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            wr.write_frame(rgb_to_ycbcr420(img))
        wr.close()
        print("wrote %d frames" % len(frames))
    elif args.mode == "y4m2png":
        rd = Y4MReader(args.input)
        n = 0
        for planes in rd:
            path = args.output % n if "%" in args.output else args.output
            PNG.write_png(path, ycbcr_to_rgb(planes))
            n += 1
            if (args.limit and n >= args.limit) or "%" not in args.output:
                break
        print("wrote %d PNGs" % n)
    elif args.mode == "y4m2yuv":
        rd = Y4MReader(args.input)
        n = 0
        with open(args.output, "wb") as f:
            for planes in rd:
                for p in planes:
                    f.write(p.tobytes())
                n += 1
                if args.limit and n >= args.limit:
                    break
        print("wrote %d raw frames" % n)
    elif args.mode == "yuv2y4m":
        if not args.size:
            sys.exit("-s WxH required")
        w, h = (int(v) for v in args.size.split("x"))
        fsz = w * h * 3 // 2
        wr = Y4MWriter(args.output, w, h, fps=fps, chroma="420")
        n = 0
        with open(args.input, "rb") as f:
            while True:
                buf = f.read(fsz)
                if len(buf) < fsz:
                    break
                y = np.frombuffer(buf[:w * h], np.uint8).reshape(h, w)
                cb = np.frombuffer(buf[w * h:w * h * 5 // 4],
                                   np.uint8).reshape(h // 2, w // 2)
                cr = np.frombuffer(buf[w * h * 5 // 4:],
                                   np.uint8).reshape(h // 2, w // 2)
                wr.write_frame([y, cb, cr])
                n += 1
                if args.limit and n >= args.limit:
                    break
        wr.close()
        print("wrote %d frames" % n)
    else:  # mono / downsample / upsample
        rd = Y4MReader(args.input)
        n = 0
        wr = None
        for planes in rd:
            if args.mode == "mono":
                out = [planes[0],
                       np.full(planes[1].shape, 128, np.uint8),
                       np.full(planes[2].shape, 128, np.uint8)] \
                    if len(planes) >= 3 else [planes[0]]
                dims = planes[0].shape
            elif args.mode == "downsample":
                out = []
                for p in planes:
                    h2, w2 = p.shape[0] - p.shape[0] % 2, \
                        p.shape[1] - p.shape[1] % 2
                    out.append(np.round(
                        p[:h2, :w2].astype(np.float64)
                        .reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3)))
                        .astype(np.uint8))
                dims = out[0].shape
            else:  # upsample (point, x2 like the reference's default)
                out = [p.repeat(2, 0).repeat(2, 1) for p in planes]
                dims = out[0].shape
            if wr is None:
                chroma = "420"
                if len(out) >= 2 and out[1].shape == out[0].shape:
                    chroma = "444"
                elif len(out) == 1:
                    chroma = "mono"
                wr = Y4MWriter(args.output, dims[1], dims[0], fps=rd.fps,
                               chroma=chroma)
            wr.write_frame(out)
            n += 1
            if args.limit and n >= args.limit:
                break
        wr.close()
        print("wrote %d frames" % n)


if __name__ == "__main__":
    main()
