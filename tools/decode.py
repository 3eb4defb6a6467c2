#!/usr/bin/env python3
"""CLI decoder: Ogg/Daala -> y4m (equivalent of the reference's
dump_video, reference: examples/dump_video.c)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.codec import headers as H
from daala_tpu.codec.decoder import Decoder
from daala_tpu.utils.ogg import read_ogg_packets
from daala_tpu.utils.y4m import Y4MWriter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="input .ogv")
    ap.add_argument("output", help="output .y4m")
    args = ap.parse_args()

    info = None
    dec = None
    wr = None
    n = 0
    t0 = time.time()
    with open(args.input, "rb") as f:
        for data, gp in read_ogg_packets(f):
            # Header packets have the MSB of the first byte set; the first
            # coded bit of every video packet is 0 (reference:
            # src/internal.c:662 daala_packet_isheader).
            if data and (data[0] & 0x80):
                info, kind = H.decode_header(data, info)
                if kind == "setup":
                    dec = Decoder(info)
                    chroma = "420"
                    if info.nplanes >= 2 and info.plane_dec[1] == (0, 0):
                        chroma = "444"
                    elif info.nplanes == 1:
                        chroma = "mono"
                    wr = Y4MWriter(args.output, info.pic_width,
                                   info.pic_height,
                                   fps=(info.timebase_numerator,
                                        info.timebase_denominator),
                                   chroma=chroma)
                continue
            for planes in dec.decode_packet(data):
                wr.write_frame(planes)
                n += 1
    wr.close()
    dt = time.time() - t0
    print("decoded %d frames in %.2fs (%.2f fps)" % (n, dt, n / dt))


if __name__ == "__main__":
    main()
