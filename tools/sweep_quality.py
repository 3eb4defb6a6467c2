#!/usr/bin/env python3
"""Quality-evidence harness: BD-rate tables with per-seed spread.

Sweeps named encoder configurations against their anchors across the
synthetic corpus classes, >=5 quantizers spanning the useful range, and
multiple seeds, reporting mean/min/max BD-rate per class so claims come
with confidence bounds instead of single-point checks.  Also measures
CBR rate-control accuracy (actual/target bitrate) across rates.

Configurations (--configs):
  fast_trial   fast trial pass + boosted prune (production preset)
               vs the exact trial anchor
  mv_sweep     device Jacobi color-sweep MV refinement vs the greedy
               host refinement loop (both at complexity 7)
  thorough_me  complexity-8 thorough ME pipeline vs complexity 7
  device_pvq   whole-frame device PVQ band search replay vs the host
               search (needs a reachable jax device; slow over a
               tunnel — sized down with --pvq-size)
  rc           CBR rate control accuracy: actual vs target bitrate

Counterpart of the reference's tools/rd_collect.sh + tools/bd_rate.sh
flow (no AWCY/network in this environment).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [HERE, os.path.join(HERE, "tests")]

import content  # noqa: E402
from daala_tpu.codec import headers as H  # noqa: E402
from daala_tpu.codec.decoder import Decoder  # noqa: E402
from daala_tpu.codec.encoder import Encoder  # noqa: E402
from daala_tpu.utils.metrics import bd_rate  # noqa: E402

from sweep_trial import make_smooth_clip  # noqa: E402


def run_encode(frames, w, h, quant, setup, complexity=7):
    """Encode + decode; returns (bytes, luma PSNR, wall seconds)."""
    info = H.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=quant, complexity=complexity)
    enc.keyframe_rate = 256
    setup(enc)
    pkts = list(enc.flush_headers())
    t0 = time.perf_counter()
    for fr in frames:
        pkts += enc.encode_frame(fr)
    pkts += enc.flush()
    dt = time.perf_counter() - t0
    nbytes = sum(len(p) for p in pkts[3:])
    dec = Decoder(H.Info(pic_width=w, pic_height=h))
    outs = [f for p in pkts[3:] for f in dec.decode_packet(p)]
    mse = np.mean([
        np.mean((np.asarray(a[0]).astype(np.float64)
                 - np.asarray(b[0]).astype(np.float64)) ** 2)
        for a, b in zip(frames, outs)])
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    return nbytes, psnr, dt


CONFIGS = {
    # name: (anchor setup, candidate setup, anchor cx, candidate cx)
    "fast_trial": (
        lambda e: None,
        lambda e: (setattr(e, "trial_rate_approx", True),
                   setattr(e, "trial_prune_boost", 3.0),
                   setattr(e, "trial_prune_rate_gate", 0.5)),
        7, 7),
    "mv_sweep": (
        lambda e: None,
        lambda e: setattr(e, "mv_refine_mode", "sweep"),
        7, 7),
    "thorough_me": (lambda e: None, lambda e: None, 7, 8),
    "device_pvq": (
        lambda e: setattr(e, "use_device_analysis", True),
        lambda e: (setattr(e, "use_device_analysis", True),
                   setattr(e, "use_device_pvq", True)),
        7, 7),
}


def sweep_bd(name, classes, seeds, quants, w, h, nframes):
    a_setup, c_setup, a_cx, c_cx = CONFIGS[name]
    makers = {"smooth": make_smooth_clip, "mixed": content.make_clip,
              "natural": content.make_natural_clip}
    rows = []
    for cls in classes:
        bds = []
        tratio = []
        for seed in seeds:
            frames = makers[cls](w, h, nframes, seed=seed)
            anchor, cand = [], []
            ta = tc = 0.0
            for q in quants:
                nb, ps, dt = run_encode(frames, w, h, q, a_setup, a_cx)
                anchor.append((nb, ps))
                ta += dt
                nb, ps, dt = run_encode(frames, w, h, q, c_setup, c_cx)
                cand.append((nb, ps))
                tc += dt
            bd = bd_rate([r for r, _ in anchor], [d for _, d in anchor],
                         [r for r, _ in cand], [d for _, d in cand])
            bds.append(bd)
            tratio.append(tc / max(ta, 1e-9))
            print(json.dumps({
                "config": name, "class": cls, "seed": seed,
                "bd_rate_pct": round(bd, 3),
                "time_vs_anchor": round(tc / max(ta, 1e-9), 3)}),
                flush=True)
        rows.append({
            "config": name, "class": cls, "n_seeds": len(seeds),
            "quants": quants, "size": "%dx%d" % (w, h),
            "frames": nframes,
            "bd_rate_mean_pct": round(float(np.mean(bds)), 3),
            "bd_rate_min_pct": round(float(np.min(bds)), 3),
            "bd_rate_max_pct": round(float(np.max(bds)), 3),
            "time_vs_anchor_mean": round(float(np.mean(tratio)), 3)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def sweep_rc(classes, seeds, w, h, nframes, bitrates, fps=30):
    """CBR accuracy: encode at target bitrates, report actual/target."""
    makers = {"smooth": make_smooth_clip, "mixed": content.make_clip,
              "natural": content.make_natural_clip}
    rows = []
    for cls in classes:
        for br in bitrates:
            ratios = []
            for seed in seeds:
                frames = makers[cls](w, h, nframes, seed=seed)
                info = H.Info(pic_width=w, pic_height=h,
                              timebase_numerator=fps,
                              timebase_denominator=1)
                enc = Encoder(info, quant=10, complexity=7,
                              bitrate=br)
                enc.keyframe_rate = 64
                pkts = list(enc.flush_headers())
                for fr in frames:
                    pkts += enc.encode_frame(fr)
                pkts += enc.flush()
                nbits = 8 * sum(len(p) for p in pkts[3:])
                actual = nbits * fps / nframes
                ratios.append(actual / br)
            rows.append({
                "config": "rc", "class": cls, "target_bps": br,
                "actual_over_target_mean": round(float(np.mean(ratios)),
                                                 4),
                "actual_over_target_min": round(float(np.min(ratios)),
                                                4),
                "actual_over_target_max": round(float(np.max(ratios)),
                                                4)})
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="fast_trial,mv_sweep,thorough_me,rc")
    ap.add_argument("--size", default="832x480")
    ap.add_argument("--pvq-size", default="320x192",
                    help="smaller size for the device_pvq sweep")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--quants", default="8,12,18,25,40,60")
    ap.add_argument("--classes", default="smooth,mixed,natural")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--bitrates", default="400000,1500000,6000000")
    ap.add_argument("--out", default=None, help="write summary JSON")
    ap.add_argument("--cpu", action="store_true",
                    help="force jax onto CPU (tunnel-attached TPUs "
                         "make the device-path configs latency-bound; "
                         "decisions are identical on any backend)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    try:
        import platform
        import jax
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            HERE, ".cache", "jax-" + platform.node()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    w, h = map(int, args.size.split("x"))
    pw, ph = map(int, args.pvq_size.split("x"))
    quants = [int(q) for q in args.quants.split(",")]
    classes = args.classes.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    summary = []
    for name in args.configs.split(","):
        if name == "rc":
            summary += sweep_rc(
                classes, seeds, w, h, max(args.frames, 16),
                [int(b) for b in args.bitrates.split(",")])
        elif name == "device_pvq":
            summary += sweep_bd(name, classes, seeds, quants, pw, ph,
                                args.frames)
        else:
            summary += sweep_bd(name, classes, seeds, quants, w, h,
                                args.frames)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print("wrote %s" % args.out)


if __name__ == "__main__":
    main()
