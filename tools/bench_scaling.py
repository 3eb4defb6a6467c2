#!/usr/bin/env python3
"""Config-5 scaling measurement: N-clip batched encode vs serial.

Measures clips/sec for the batched multi-clip encoder
(daala_tpu/parallel/mesh.py encode_clips_batched) under its two
schedules on whatever devices are attached:

  serial    — single host thread, clips round-robin per frame; only
              XLA's async dispatch overlaps device work.
  threaded  — one host thread per clip: clip B's device dispatches are
              issued while clip A's host entropy runs (ctypes native
              engines + blocking device reads release the GIL).

Packets are byte-identical across schedules and to a plain serial
encode (pinned by tests/test_parallel.py); this harness only measures
wall clock.  Run with --host to measure the host-only path (no device
stages — isolates the threading overlap of the native engines alone).

Reference analogue: none — the reference encoder is strictly
single-threaded single-stream (SURVEY.md section 2.6).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [HERE, os.path.join(HERE, "tests")]


def make_clips(n, w, h, nframes):
    import content
    return [content.make_clip(w, h, nframes, seed=10 + c)
            for c in range(n)]


def run(clips, w, h, mesh, device, threads, quant, complexity):
    from daala_tpu.parallel import mesh as PM
    enc_kwargs = dict(trial_rate_approx=True, trial_prune_boost=3.0,
                      trial_prune_rate_gate=0.5)
    if not device:
        # Host-only: encode on threads without any device stage.
        from daala_tpu.codec import headers as H
        from daala_tpu.codec.encoder import Encoder
        import threading
        outs = [[] for _ in clips]

        def one(ci):
            info = H.Info(pic_width=w, pic_height=h)
            e = Encoder(info, quant=quant, complexity=complexity,
                        **enc_kwargs)
            for fr in clips[ci]:
                outs[ci].extend(e.encode_frame(fr))
            outs[ci].extend(e.flush())

        t0 = time.perf_counter()
        if threads:
            ws = [threading.Thread(target=one, args=(ci,))
                  for ci in range(len(clips))]
            for t in ws:
                t.start()
            for t in ws:
                t.join()
        else:
            for ci in range(len(clips)):
                one(ci)
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        PM.encode_clips_batched(
            clips, dict(pic_width=w, pic_height=h), mesh, quant=quant,
            complexity=complexity,
            enc_kwargs=enc_kwargs, threads=threads)
        dt = time.perf_counter() - t0
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--quant", type=int, default=25)
    ap.add_argument("--complexity", type=int, default=7)
    ap.add_argument("--host", action="store_true",
                    help="host-only path (no device stages)")
    args = ap.parse_args()

    clips = make_clips(args.clips, args.width, args.height, args.frames)
    mesh = None
    if not args.host:
        from daala_tpu.parallel import mesh as PM
        mesh = PM.make_mesh(dp=1)
    # Warm both schedules (XLA compiles, native engine build), then
    # measure alternating pairs.
    for threads in (False, True):
        run(clips, args.width, args.height, mesh, not args.host,
            threads, args.quant, args.complexity)
    t_serial = min(run(clips, args.width, args.height, mesh,
                       not args.host, False, args.quant,
                       args.complexity) for _ in range(2))
    t_thread = min(run(clips, args.width, args.height, mesh,
                       not args.host, True, args.quant,
                       args.complexity) for _ in range(2))
    total = args.clips * args.frames
    print(json.dumps({
        "metric": "config5_batched_encode_scaling",
        "clips": args.clips, "w": args.width, "h": args.height,
        "frames_per_clip": args.frames,
        "device": not args.host,
        "serial_s": round(t_serial, 3),
        "threaded_s": round(t_thread, 3),
        "serial_fps": round(total / t_serial, 3),
        "threaded_fps": round(total / t_thread, 3),
        "speedup": round(t_serial / t_thread, 3),
    }))


if __name__ == "__main__":
    main()
