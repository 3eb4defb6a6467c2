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
    ap.add_argument("--seek", type=float, default=None, metavar="T",
                    help="start decoding at the keyframe preceding time "
                         "T seconds (uses the keyframe-shift granulepos "
                         "packing, reference: src/state.c:1010-1040)")
    args = ap.parse_args()

    from daala_tpu.utils import granule as G
    info = None
    dec = None
    wr = None
    n = 0
    start_index = 0   # first video packet to feed the decoder
    emit_from = 0     # first display frame to write
    if args.seek is not None:
        # Pass 1: locate the target frame and its preceding keyframe from
        # the granule positions (keyframe id lives in the high bits).
        tmp_info = None
        vidx = 0
        key_of_target = 0
        target = None
        with open(args.input, "rb") as f:
            for data, gp in read_ogg_packets(f):
                if data and (data[0] & 0x80):
                    tmp_info, _ = H.decode_header(data, tmp_info)
                    continue
                if target is None and gp >= 0 \
                        and G.granule_time(tmp_info, gp) >= args.seek:
                    target = G.granule_basetime(tmp_info, gp)
                    key_of_target = G.granule_keytime(tmp_info, gp)
                    break
                vidx += 1
        if target is None:
            target = vidx
            key_of_target = 0
        start_index = key_of_target
        emit_from = target - key_of_target
    vcount = 0
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
                                   chroma=chroma,
                                   aspect=(info.pixel_aspect_numerator,
                                           info.pixel_aspect_denominator),
                                   depth=8 + 2 * (info.bitdepth_mode - 1))
                continue
            vcount += 1
            if vcount - 1 < start_index:
                continue
            if args.seek is not None and vcount - 1 == start_index:
                dec.sync_to_packet(data)
            for planes in dec.decode_packet(data):
                if emit_from > 0:
                    emit_from -= 1
                    continue
                wr.write_frame(planes)
                n += 1
    wr.close()
    dt = time.time() - t0
    print("decoded %d frames in %.2fs (%.2f fps)" % (n, dt, n / dt))


if __name__ == "__main__":
    main()
