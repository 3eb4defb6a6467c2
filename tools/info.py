#!/usr/bin/env python3
"""Stream inspector: headers, per-frame packet info, stream totals.

Equivalent of the reference's tools/daalainfo.c: parses the Ogg
container and the Daala header packets, prints version/geometry/rate
info, then (with -f) one line per video packet with its frame type and
size, and closing totals.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.codec import headers as H
from daala_tpu.entropy import ec as ec_mod
from daala_tpu.utils.ogg import read_ogg_packets

OD_MAX_CODED_REFS = 2
OD_MAX_REORDER = 16

FRAME_NAMES = {0: "I", 1: "P", 2: "B"}


def parse_frame_header(pkt):
    """Decode just the uncompressed-ish frame header prefix of a video
    packet (reference: src/decode.c:1113-1172): type, refs, number and
    the per-frame flags."""
    dec = ec_mod.Decoder(pkt)
    if dec.decode_bool_q15(16384):
        return None
    is_keyframe = dec.decode_bool_q15(16384)
    if is_keyframe:
        ftype = 0
    else:
        ftype = 2 if dec.decode_bool_q15(16384) else 1
    num_refs = dec.decode_uint(OD_MAX_CODED_REFS) + 1 if ftype else 0
    number = dec.decode_uint(OD_MAX_REORDER)
    activity = dec.decode_bool_q15(16384)
    qm = dec.decode_bool_q15(16384)
    haar = dec.decode_bool_q15(16384)
    golden = dec.decode_bool_q15(16384)
    return {"type": ftype, "refs": num_refs, "number": number,
            "activity": activity, "qm": qm, "haar": haar,
            "golden": golden}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help=".ogv stream")
    ap.add_argument("-f", "--frames", action="store_true",
                    help="print one line per video packet")
    args = ap.parse_args()

    info = None
    nheaders = 0
    nframes = 0
    counts = {0: 0, 1: 0, 2: 0}
    video_bytes = 0
    last_gp = -1
    with open(args.input, "rb") as f:
        for pkt, gp in read_ogg_packets(f):
            if pkt and pkt[0] & 0x80:
                info, kind = H.decode_header(pkt, info)
                nheaders += 1
                if kind == "info":
                    print("Daala headers parsed: version %d.%d.%d"
                          % (info.version_major, info.version_minor,
                             info.version_sub))
                    print("Width: %d" % info.pic_width)
                    print("Height: %d" % info.pic_height)
                    fps = (info.timebase_numerator
                           / max(1, info.timebase_denominator
                                 * max(1, info.frame_duration)))
                    print("Framerate %d/%d (%.02f fps)"
                          % (info.timebase_numerator,
                             info.timebase_denominator, fps))
                    if info.pixel_aspect_numerator == 0 \
                            or info.pixel_aspect_denominator == 0:
                        print("Aspect ratio undefined")
                    else:
                        print("Pixel aspect ratio %d:%d"
                              % (info.pixel_aspect_numerator,
                                 info.pixel_aspect_denominator))
                    print("Planes: %d  Keyframe rate: %d"
                          % (info.nplanes, info.keyframe_rate))
                continue
            hdr = parse_frame_header(pkt)
            if hdr is None:
                print("WARNING: undecodable packet at frame %d" % nframes,
                      file=sys.stderr)
                continue
            counts[hdr["type"]] += 1
            video_bytes += len(pkt)
            if gp >= 0:
                if gp < last_gp:
                    print("WARNING: granulepos decreases from %d to %d"
                          % (last_gp, gp), file=sys.stderr)
                last_gp = gp
            if args.frames:
                from daala_tpu.utils.granule import (granule_basetime,
                                                     granule_keytime,
                                                     granule_time)
                flags = "".join(n for n, v in (
                    ("g", hdr["golden"]), ("h", hdr["haar"]),
                    ("a", hdr["activity"]), ("q", hdr["qm"])) if v)
                gstr = ""
                if gp >= 0 and info is not None:
                    gstr = " gp=%d (base %d, key %d, %.3fs)" % (
                        gp, granule_basetime(info, gp),
                        granule_keytime(info, gp),
                        granule_time(info, gp))
                print("frame %4d: %s refs=%d num=%d bytes=%d %s%s"
                      % (nframes, FRAME_NAMES[hdr["type"]], hdr["refs"],
                         hdr["number"], len(pkt), flags, gstr))
            nframes += 1
    if info is None:
        sys.exit("error: no daala stream found")
    print("Video: %d frames (%d I, %d P, %d B), %d header packets"
          % (nframes, counts[0], counts[1], counts[2], nheaders))
    fps = (info.timebase_numerator
           / max(1, info.timebase_denominator * max(1, info.frame_duration)))
    dur = nframes / fps if fps else 0.0
    rate = video_bytes * 8.0 * fps / max(1, nframes) / 1000.0
    print("Payload: %d bytes, %.2fs, %.1f kbps" % (video_bytes, dur, rate))


if __name__ == "__main__":
    main()
