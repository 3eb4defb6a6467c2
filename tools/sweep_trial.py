#!/usr/bin/env python3
"""BD-rate / speed sweep for the fast-trial-pass configurations.

Measures, over the synthetic corpus classes (smooth / mixed / natural),
the BD-rate of the fast block-size-RDO trial pass (trial_rate_approx)
at several subtree-prune boosts (Encoder.trial_prune_boost) against the
exact-trial anchor, together with encode wall time.  This is the tool
that picks the production speed preset used by bench.py (the reference
has no equivalent single tool; its counterpart flow is
tools/rd_collect.sh + tools/bd_rate.sh over AWCY clips).

Usage: python tools/sweep_trial.py [--size WxH] [--frames N]
                                   [--quants a,b,c] [--boosts a,b,c]
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


def make_smooth_clip(w, h, nframes, seed=0):
    """Smooth gradients + gentle pan (the easy class)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 50 * np.sin(xx / 17.0) + 35 * np.cos(yy / 23.0)
            + 20 * np.sin((xx + yy) / 9.0))
    # Light noise only: heavy static grain puts a PSNR floor under the
    # whole curve (quality stops varying with quantizer) and the BD fit
    # degenerates.
    noise = rng.normal(0, 1.5, (h, w))
    frames = []
    for t in range(nframes):
        y = (np.roll(base, (2 * t, 3 * t), (0, 1)) + noise) \
            .clip(0, 255).astype(np.uint8)
        cb = (128 + 25 * np.sin((xx[::2, ::2] + 5 * t) / 19.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 + 25 * np.cos((yy[::2, ::2] + 4 * t) / 21.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append([y, cb, cr])
    return frames


def encode_decode(frames, w, h, quant, fast, boost, complexity=7,
                  rate_gate=0.5, kf_gate=None):
    info = H.Info(pic_width=w, pic_height=h)
    enc = Encoder(info, quant=quant, complexity=complexity,
                  trial_rate_approx=fast)
    enc.trial_prune_boost = boost
    enc.trial_prune_rate_gate = rate_gate
    if kf_gate is not None:
        enc.trial_prune_gate_kf = kf_gate
    enc.keyframe_rate = 256
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="640x384")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--quants", default="8,12,18,25,40,60")
    ap.add_argument("--boosts", default="1,2,3,4")
    ap.add_argument("--rate-gates", default="0.5")
    ap.add_argument("--classes", default="smooth,mixed,natural")
    ap.add_argument("--complexity", type=int, default=7)
    ap.add_argument("--seeds", default="0")
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    quants = [int(q) for q in args.quants.split(",")]
    boosts = [float(b) for b in args.boosts.split(",")]
    gates = [float(g) for g in args.rate_gates.split(",")]
    makers = {"smooth": make_smooth_clip,
              "mixed": content.make_clip,
              "natural": content.make_natural_clip}
    results = {}
    for cls in args.classes.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            frames = makers[cls](w, h, args.frames, seed=seed)
            # Anchor: exact trial pass.
            anchor = []
            t_anchor = 0.0
            for q in quants:
                nb, ps, dt = encode_decode(frames, w, h, q, False, 1.0,
                                           args.complexity)
                anchor.append((nb, ps))
                t_anchor += dt
            for boost in boosts:
                for gate in (gates if boost > 1.0 else gates[:1]):
                    pts = []
                    t_c = 0.0
                    for q in quants:
                        nb, ps, dt = encode_decode(
                            frames, w, h, q, True, boost,
                            args.complexity, rate_gate=gate)
                        pts.append((nb, ps))
                        t_c += dt
                    bd = bd_rate([r for r, _ in anchor],
                                 [d for _, d in anchor],
                                 [r for r, _ in pts],
                                 [d for _, d in pts])
                    key = (cls, seed, boost, gate)
                    results[key] = (bd, t_c / t_anchor)
                    print(json.dumps({
                        "class": cls, "seed": seed, "boost": boost,
                        "rate_gate": gate,
                        "bd_rate_vs_exact_pct": round(bd, 3),
                        "time_vs_exact": round(t_c / t_anchor, 3)}),
                        flush=True)
    # Summary per (boost, gate).
    seen = []
    for k in results:
        bg = (k[2], k[3])
        if bg not in seen:
            seen.append(bg)
    for boost, gate in seen:
        bds = [v[0] for k, v in results.items()
               if (k[2], k[3]) == (boost, gate)]
        ts = [v[1] for k, v in results.items()
              if (k[2], k[3]) == (boost, gate)]
        print(json.dumps({
            "boost": boost, "rate_gate": gate,
            "bd_rate_mean_pct": round(float(np.mean(bds)), 3),
            "bd_rate_worst_pct": round(float(np.max(bds)), 3),
            "time_vs_exact_mean": round(float(np.mean(ts)), 3)}),
            flush=True)


if __name__ == "__main__":
    main()
