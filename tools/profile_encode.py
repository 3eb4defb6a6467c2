#!/usr/bin/env python3
"""Stage-profile the production encoder (native FC_PROF timers).

Builds a profiling copy of the native engine (-DFC_PROF=1) to a scratch
path, encodes a synthetic clip with the production preset, and prints
the per-frame stage timer table (fc_get_prof counters) — the tool
behind ROADMAP.md's "where the remaining gap lives" tables.

Usage: python tools/profile_encode.py [--size WxH] [--frames N]
                                      [--quant Q] [--exact-trial]
"""

import argparse
import ctypes
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [HERE, os.path.join(HERE, "tests")]

PROF_FIELDS = [
    "pvq", "rate", "snap", "dct", "dering", "dist", "filt",
    "me_glob", "me_full", "me_mesh", "me_refine", "me_pred", "me_sad",
    "pvq_search", "pvq_rate", "blk", "haardc", "reorder",
]


def build_prof_lib():
    src = os.path.join(HERE, "daala_tpu", "native", "ec_core.cc")
    out = os.path.join(tempfile.gettempdir(),
                       "libdaala_tpu_prof_%d.so" % os.getuid())
    if (os.path.exists(out)
            and os.path.getmtime(out) >= max(
                os.path.getmtime(src),
                *(os.path.getmtime(os.path.join(
                    HERE, "daala_tpu", "native", n))
                  for n in ("frame_enc.inc", "me_enc.inc",
                            "frame_dec.inc", "bs_enc.inc",
                            "lifting_gen.inc")))):
        return out
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fwrapv", "-ffp-contract=off",
         "-fno-math-errno", "-std=c++17", "-shared", "-fPIC",
         "-DFC_PROF=1", src, "-o", out], check=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--quant", type=int, default=25)
    ap.add_argument("--complexity", type=int, default=7)
    ap.add_argument("--exact-trial", action="store_true",
                    help="profile the exact trial pass instead of the "
                         "fast production preset")
    args = ap.parse_args()

    os.environ["DAALA_TPU_NATIVE_LIB"] = build_prof_lib()
    from daala_tpu import native as N
    lib = N.get_lib()
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.encoder import Encoder
    import bench

    w, h = map(int, args.size.split("x"))
    bench.W, bench.H, bench.NFRAMES = w, h, args.frames
    frames = bench.make_clip()
    info = H.Info(pic_width=w, pic_height=h)
    kw = {} if args.exact_trial else dict(
        trial_rate_approx=True, trial_prune_boost=3.0,
        trial_prune_rate_gate=0.5)
    enc = Encoder(info, quant=args.quant, complexity=args.complexity,
                  **kw)
    enc.keyframe_rate = 256
    buf = (ctypes.c_double * len(PROF_FIELDS))()
    lib.fc_get_prof(buf)  # reset
    for i, fr in enumerate(frames):
        t0 = time.perf_counter()
        enc.encode_frame(fr)
        dt = time.perf_counter() - t0
        lib.fc_get_prof(buf)
        stages = {k: round(buf[j], 4) for j, k in
                  enumerate(PROF_FIELDS) if buf[j] > 0.0005}
        print(json.dumps({
            "frame": i, "type": "KP"[min(i, 1)], "wall_s": round(dt, 3),
            "native_stages_s": dict(sorted(stages.items(),
                                           key=lambda kv: -kv[1])),
            "native_total_s": round(sum(buf[j] for j in
                                        range(len(PROF_FIELDS))), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
