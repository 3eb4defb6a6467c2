#!/usr/bin/env python3
"""CLI encoder: y4m -> Ogg/Daala (equivalent of the reference's
encoder_example, reference: examples/encoder_example.c)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from daala_tpu.codec import headers as H
from daala_tpu.codec.encoder import Encoder
from daala_tpu.utils.granule import GranuleTracker
from daala_tpu.utils.ogg import OggPageWriter
from daala_tpu.utils.y4m import Y4MReader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="input .y4m")
    ap.add_argument("output", help="output .ogv")
    ap.add_argument("-v", "--video-quality", type=int, default=10,
                    help="0 = lossless, 1..511 coarser (like the "
                         "reference's -v)")
    ap.add_argument("-k", "--keyframe-rate", type=int, default=256)
    ap.add_argument("--limit", type=int, default=0,
                    help="max frames to encode (0 = all)")
    ap.add_argument("--no-dering", action="store_true")
    ap.add_argument("-b", "--b-frames", type=int, default=0,
                    help="number of B-frames between P-frames (0..4)")
    ap.add_argument("--bitrate", type=int, default=0,
                    help="target bitrate in bits/s (enables CBR)")
    ap.add_argument("--check", action="store_true",
                    help="re-decode every packet with an embedded decoder "
                         "and verify the reconstruction matches "
                         "(like the reference's --enable-encoder-check)")
    ap.add_argument("-z", "--complexity", type=int, default=7,
                    help="encoder complexity 0..10 (like the reference's "
                         "-z; gates block-size RDO and the ME stages)")
    ap.add_argument("--qm", type=int, choices=(0, 1), default=1,
                    help="quantization matrix: 0 = flat, 1 = HVS "
                         "(reference's --qm)")
    ap.add_argument("--fast-trial", action="store_true", default=True,
                    help="fast block-size RDO trial pass (speed=2 "
                         "projection-only PVQ candidates + closed-form "
                         "rates; BD-neutral, final pass stays exact). "
                         "ON by default — the production preset bench.py "
                         "measures; --exact-trial restores the "
                         "reference-identical trial pass")
    ap.add_argument("--exact-trial", dest="fast_trial",
                    action="store_false",
                    help="exact (reference-identical) block-size RDO "
                         "trial pass instead of the fast preset")
    ap.add_argument("--trial-prune-boost", type=float, default=3.0,
                    help="with --fast-trial: scale on the fitted "
                         "subtree-prune envelopes, rate-gated to "
                         "mostly-skip nodes (tools/sweep_trial.py "
                         "picks the production value; 1.0 disables)")
    ap.add_argument("--no-activity-masking", action="store_true",
                    help="disable perceptual activity masking "
                         "(reference's --activity-masking 0)")
    ap.add_argument("--mv-level-max", type=int, default=None,
                    help="maximum MV mesh subdivision level (0..6)")
    ap.add_argument("--mv-level-min", type=int, default=0,
                    help="minimum (forced) MV mesh subdivision level "
                         "(reference's OD_SET_MV_LEVEL_MIN)")
    ap.add_argument("--mv-res-min", type=int, default=0,
                    choices=(0, 1, 2),
                    help="minimum (coarsest-allowed bound on) MV "
                         "resolution: 0 = 1/8 pel .. 2 = 1/2 pel "
                         "(reference's OD_SET_MV_RES_MIN)")
    ap.add_argument("--mv-pipeline", type=int, default=None,
                    choices=(0, 1, 2, 3, 5),
                    help="MV mesh pipeline override (mv_decimate knob): "
                         "0 greedy split, 1 optimistic split + "
                         "decimate, 5 subdivide-all -> refine -> "
                         "decimate -> refine (default: 5 at complexity "
                         ">= 8, else 0)")
    ap.add_argument("--mv-satd", action="store_true",
                    help="Hadamard SATD cells in the MV refinement "
                         "objective (reference's OD_ENC_USE_SATD)")
    ap.add_argument("--two-pass", metavar="STATS", default=None,
                    help="two-pass rate control: first run (stats file "
                         "absent) records per-frame metrics to STATS; "
                         "second run (file present, with --bitrate) "
                         "allocates bits using them. The reference "
                         "only stubs this API.")
    ap.add_argument("--workers", type=int, default=0,
                    help="encode keyframe-aligned segments in N parallel "
                         "processes (keyframe rate is capped to the "
                         "segment length, a multiple of 16)")
    args = ap.parse_args()

    rd = Y4MReader(args.input)
    dec = tuple(rd.dec) + (((0, 0),) if rd.nplanes == 3 else ())
    # The daala format supports only square chroma decimation (the
    # reference decoder asserts xdec == ydec, src/decode.c:617,734).
    # Convert 4:2:2 input to 4:2:0 by averaging chroma row pairs, like
    # running the clip through a format converter first.
    if any(d[0] != d[1] for d in dec[:rd.nplanes]):
        print("input is 4:2:2; converting chroma to 4:2:0 "
              "(the daala format supports 4:2:0/4:4:4 only)",
              file=sys.stderr)
        dec = ((0, 0),) + ((1, 1),) * (rd.nplanes - 1)
        if rd.nplanes == 3:
            dec = dec + ((0, 0),)
        _inner_rd = rd

        class _To420:
            width = rd.width
            height = rd.height
            nplanes = rd.nplanes
            fps = rd.fps
            aspect = rd.aspect
            depth = rd.depth

            def __iter__(self):
                for planes in _inner_rd:
                    out = [planes[0]]
                    for p in planes[1:]:
                        p16 = p.astype(np.uint16)
                        if len(p16) & 1:  # odd height: repeat last row
                            p16 = np.vstack([p16, p16[-1:]])
                        out.append(((p16[0::2] + p16[1::2] + 1)
                                    >> 1).astype(p.dtype))
                    yield out

        rd = _To420()
    depth = getattr(rd, "depth", 8)
    if depth not in (8, 10, 12):
        sys.exit("unsupported input bit depth %d (the daala format "
                 "codes 8/10/12-bit, reference: "
                 "include/daala/codec.h:196-200)" % depth)
    info = H.Info(pic_width=rd.width, pic_height=rd.height,
                  nplanes=rd.nplanes, plane_dec=dec,
                  keyframe_rate=args.keyframe_rate,
                  timebase_numerator=rd.fps[0],
                  timebase_denominator=rd.fps[1],
                  pixel_aspect_numerator=rd.aspect[0],
                  pixel_aspect_denominator=rd.aspect[1],
                  bitdepth_mode=1 + (depth - 8) // 2,
                  # High depth requires full-precision references
                  # (reference: src/state.c:370-373).
                  full_precision_references=1 if depth > 8 else 0)
    if args.workers > 1:
        # Segment-parallel: read the clip, fan segments out to processes
        # (daala_tpu/parallel/mesh.py), then mux in order.
        from daala_tpu.parallel.mesh import encode_clip_parallel
        seg = max(16, min(args.keyframe_rate, 64) // 16 * 16)
        info_kwargs = dict(pic_width=rd.width, pic_height=rd.height,
                           nplanes=rd.nplanes, plane_dec=dec,
                           keyframe_rate=min(args.keyframe_rate, seg),
                           timebase_numerator=rd.fps[0],
                           timebase_denominator=rd.fps[1],
                           pixel_aspect_numerator=rd.aspect[0],
                           pixel_aspect_denominator=rd.aspect[1])
        frames = []
        for planes in rd:
            frames.append(planes)
            if args.limit and len(frames) >= args.limit:
                break
        t0 = time.time()
        pkts = encode_clip_parallel(
            frames, info_kwargs,
            dict(quant=args.video_quality,
                 use_dering=not args.no_dering, bitrate=args.bitrate,
                 trial_rate_approx=args.fast_trial,
                 trial_prune_boost=args.trial_prune_boost),
            b_frames=args.b_frames, segment_len=seg,
            workers=args.workers)
        enc = Encoder(H.Info(**info_kwargs), quant=args.video_quality)
        with open(args.output, "wb") as f:
            ogg = OggPageWriter(f, serial=0x0da1a)
            for hpkt in enc.flush_headers():
                ogg.add_packet(hpkt, 0, flush=True)
            gt = GranuleTracker(info)
            for pkt in pkts:
                ogg.add_packet(pkt, gt.stamp(pkt), flush=True)
            ogg.close()
        n = len(frames)
        dt = time.time() - t0
        print("encoded %d frames in %.2fs (%.2f fps, %.3f Mpix/s)"
              % (n, dt, n / dt, n * rd.width * rd.height / dt / 1e6))
        return
    two_pass_writing = False
    if args.two_pass and os.path.exists(args.two_pass):
        if not args.bitrate:
            sys.exit("--two-pass second run requires --bitrate")
    elif args.two_pass:
        two_pass_writing = True
    enc = Encoder(info, quant=args.video_quality,
                  complexity=args.complexity, qm=args.qm,
                  use_activity_masking=not args.no_activity_masking,
                  use_dering=not args.no_dering,
                  bitrate=args.bitrate if not two_pass_writing else 0,
                  trial_rate_approx=args.fast_trial,
                  trial_prune_boost=args.trial_prune_boost)
    enc.b_frames = args.b_frames
    if args.mv_level_max is not None:
        enc.mv_max_level = args.mv_level_max
    enc.mv_res_min = args.mv_res_min
    enc.mv_level_min = args.mv_level_min
    if args.mv_pipeline is not None:
        enc.mv_decimate = args.mv_pipeline
    if args.mv_satd:
        enc.mv_satd = 1
    enc.enable_encoder_check = args.check
    if args.two_pass and not two_pass_writing:
        with open(args.two_pass, "rb") as f:
            enc.rc.twopass_in(f.read())
    elif two_pass_writing:
        enc.record_pass1 = True
    with open(args.output, "wb") as f:
        ogg = OggPageWriter(f, serial=0x0da1a)
        for hpkt in enc.flush_headers():
            ogg.add_packet(hpkt, 0, flush=True)
        gt = GranuleTracker(info)
        n = 0
        t0 = time.time()
        for planes in rd:
            for pkt in enc.encode_frame(planes):
                ogg.add_packet(pkt, gt.stamp(pkt), flush=True)
            n += 1
            if args.limit and n >= args.limit:
                break
        for pkt in enc.flush():
            ogg.add_packet(pkt, gt.stamp(pkt), flush=True)
        ogg.close()
    if two_pass_writing:
        with open(args.two_pass, "wb") as f:
            f.write(enc.rc.twopass_out())
        print("wrote first-pass stats to %s" % args.two_pass)
    dt = time.time() - t0
    print("encoded %d frames in %.2fs (%.2f fps, %.3f Mpix/s)"
          % (n, dt, n / dt, n * rd.width * rd.height / dt / 1e6))


if __name__ == "__main__":
    main()
