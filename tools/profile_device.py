#!/usr/bin/env python3
"""Instrumented device-path encode: counts XLA compiles, dispatches,
host<->device bytes and per-stage wall time for the TPU front-ends.

Usage: python tools/profile_device.py [--w W] [--h H] [--frames N]
                                      [--no-pvq] [--small]
Prints one JSON blob at the end.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [HERE, os.path.join(HERE, "tests")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--no-pvq", action="store_true")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    import jax
    if not args.no_cache:
        import platform
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".cache",
                                       "jax-" + platform.node()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    jax.config.update("jax_log_compiles", True)

    import logging
    compiles = []

    class _H(logging.Handler):
        def emit(self, rec):
            msg = rec.getMessage()
            if "Finished XLA compilation" in msg:
                compiles.append((time.perf_counter(), msg))
                sys.stderr.write("[compile] %s\n" % msg)
                sys.stderr.flush()

    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
                 "jax"):
        lg = logging.getLogger(name)
        lg.addHandler(_H())
        lg.setLevel(logging.DEBUG)

    W, H = args.w, args.h
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 50 * np.sin(xx / 17.0) + 35 * np.cos(yy / 23.0)
            + 20 * np.sin((xx + yy) / 9.0))
    noise = rng.normal(0, 5, (H, W))
    frames = []
    for t in range(args.frames):
        y = (np.roll(base, (2 * t, 3 * t), (0, 1)) + noise) \
            .clip(0, 255).astype(np.uint8)
        cb = (128 + 25 * np.sin((xx[::2, ::2] + 5 * t) / 19.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 + 25 * np.cos((yy[::2, ::2] + 4 * t) / 21.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cr])

    from daala_tpu.codec import headers
    from daala_tpu.codec.encoder import Encoder
    info = headers.Info(pic_width=W, pic_height=H)
    enc = Encoder(info, quant=25, complexity=7,
                  trial_rate_approx=True, trial_prune_boost=3.0,
                  trial_prune_rate_gate=0.5)
    enc.keyframe_rate = 256
    enc.use_device_analysis = True
    enc.use_device_pvq = not args.no_pvq

    from daala_tpu.utils import devstats
    t0 = time.perf_counter()
    per_frame = []
    for i, fr in enumerate(frames):
        tf0 = time.perf_counter()
        nc0 = len(compiles)
        devstats.reset()
        for _ in enc.encode_frame(fr):
            pass
        dt = time.perf_counter() - tf0
        per_frame.append({"frame": i, "wall_s": round(dt, 2),
                          "compiles": len(compiles) - nc0,
                          "dev": devstats.snapshot()})
        sys.stderr.write("[frame %d] %.1fs, %d compiles %s\n"
                         % (i, dt, len(compiles) - nc0,
                            json.dumps(devstats.snapshot())))
        sys.stderr.flush()
    total = time.perf_counter() - t0
    print(json.dumps({
        "w": W, "h": H, "frames": args.frames,
        "total_wall_s": round(total, 2),
        "mpix_s": round(args.frames * W * H / total / 1e6, 4),
        "n_compiles": len(compiles),
        "per_frame": per_frame,
    }))


if __name__ == "__main__":
    main()
