#!/usr/bin/env python3
"""Terminal video player for Ogg/Daala streams.

Counterpart of the reference's SDL player (reference:
examples/player_example.c) for environments without a display: decodes
and renders frames as ANSI truecolor half-blocks (two pixels per
character cell), paced to the stream's frame rate.

  python tools/play.py stream.ogv [--width 96] [--fps 0=as-fast-as-possible]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.utils.ogg import read_ogg_packets


def to_rgb(planes):
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
    rgb = np.stack([yy + 1.402 * v,
                    yy - 0.344136 * u - 0.714136 * v,
                    yy + 1.772 * u], -1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def render(rgb, cols):
    """Downsample to `cols` columns and render with half-block glyphs."""
    h, w = rgb.shape[:2]
    cols = min(cols, w)
    rows = max(2, int(h * cols / w / 1.0)) & ~1
    ys = (np.arange(rows) * h // rows)
    xs = (np.arange(cols) * w // cols)
    img = rgb[ys][:, xs]
    out = []
    for r in range(0, rows - 1, 2):
        line = []
        for c in range(cols):
            tr, tg, tb = img[r, c]
            br, bg, bb = img[r + 1, c]
            line.append("\x1b[38;2;%d;%d;%dm\x1b[48;2;%d;%d;%dm▀"
                        % (tr, tg, tb, br, bg, bb))
        out.append("".join(line) + "\x1b[0m")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream")
    ap.add_argument("--width", type=int, default=96,
                    help="terminal columns to use")
    ap.add_argument("--fps", type=float, default=-1,
                    help="playback rate (-1 = stream rate, 0 = max)")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--once", action="store_true",
                    help="no cursor tricks; print frames sequentially")
    args = ap.parse_args()

    info = None
    dec = None
    n = 0
    t_start = None
    with open(args.stream, "rb") as f:
        for data, gp in read_ogg_packets(f):
            if data and (data[0] & 0x80):
                info, kind = H.decode_header(data, info)
                if kind == "setup":
                    dec = Decoder(info)
                    rate = (info.timebase_numerator /
                            max(1, info.timebase_denominator))
                    if args.fps >= 0:
                        rate = args.fps
                continue
            for planes in dec.decode_packet(data):
                frame = render(to_rgb(planes), args.width)
                if n == 0:
                    t_start = time.time()
                    if not args.once:
                        sys.stdout.write("\x1b[2J")
                if rate > 0 and t_start is not None:
                    due = t_start + n / rate
                    delay = due - time.time()
                    if delay > 0:
                        time.sleep(delay)
                if not args.once:
                    sys.stdout.write("\x1b[H")
                sys.stdout.write(frame + "\n")
                sys.stdout.flush()
                n += 1
                if args.limit and n >= args.limit:
                    print("played %d frames" % n)
                    return
    print("played %d frames" % n)


if __name__ == "__main__":
    main()
