#!/usr/bin/env python3
"""Benchmark: REAL end-to-end 1080p encode throughput.

Times the production encoder (daala_tpu.codec.encoder.Encoder — native
frame-coefficient and motion-estimation engines, the same path
tools/encode.py uses) on TWO synthetic 1080p clips at complexity 7 —
a global-translation clip the redesigned ME solves nearly for free,
and a natural-statistics clip (multi-octave texture, parallax
occlusion, film grain; tests/content.py make_natural_clip) that it
can't — and the reference C encoder (compiled from /root/reference as
a test oracle) on the identical clips/settings as the baseline.

Prints one JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N, "config": {...}}.  value / vs_baseline are the
COMBINED throughput/ratio over both clips; config.per_content carries
the per-clip ratios so the headline can't hide behind easy content.
vs_baseline > 1 means faster than the reference C encoder on this
host; null when the oracle is unavailable.  config.probe carries the
device-path instrumentation (dispatches, host<->device bytes, compile
totals) captured by daala_tpu.utils.devstats.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [HERE, os.path.join(HERE, "tests")]

W, H, NFRAMES = 1920, 1080, 4
QUANT, COMPLEXITY = 25, 7
CONTENTS = ("translation", "natural")


def _setup_jax_cache():
    """Persistent XLA compile cache (hostname-keyed): the device-path
    probe compiles a handful of band_search/analysis programs, and over
    a tunnel-attached chip each compile is a remote round trip — cache
    them across runs so only the first probe pays."""
    try:
        import platform
        import jax
        cache_dir = os.path.join(HERE, ".cache",
                                 "jax-" + platform.node())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass


def make_clip(content="translation", nframes=NFRAMES):
    if content == "natural":
        import content as C
        return C.make_natural_clip(W, H, nframes, seed=3)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 50 * np.sin(xx / 17.0) + 35 * np.cos(yy / 23.0)
            + 20 * np.sin((xx + yy) / 9.0))
    noise = rng.normal(0, 5, (H, W))
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


def bench_ours(frames, device=False, sweep=False):
    from daala_tpu.codec import headers
    from daala_tpu.codec.encoder import Encoder
    info = headers.Info(pic_width=W, pic_height=H)
    # Production speed preset == tools/encode.py defaults: fast
    # block-size RDO trial pass (speed=2 projection-only PVQ candidates
    # + closed-form rates) with the boosted, rate-gated subtree prune
    # (BD-rate +0.0..+0.4% over the plain fast trial across the corpus
    # classes, tools/sweep_trial.py).  Reference-decodable
    # (tests/test_fast_trial.py); the final pass still searches and
    # codes exactly.
    enc = Encoder(info, quant=QUANT, complexity=COMPLEXITY,
                  trial_rate_approx=True, trial_prune_boost=3.0,
                  trial_prune_rate_gate=0.5)
    enc.keyframe_rate = 256
    if device:
        # LEAN TPU search offload: BMA SAD fields (models/mefield.py,
        # exact lookups) + the whole-frame PVQ band RDO
        # (models/pvqsearch.py, BD-rate-neutral) searched against
        # device-resident transforms; only compact decision tables come
        # back (~2-8 MB/frame vs the 25-84 MB/frame the full
        # plane-fetching tier moved — measured with devstats, see
        # README).  The byte-identical full-analysis tier stays the
        # conformance path (use_device_analysis).
        enc.use_device_pvq = True
    if sweep:
        # TPU MV refinement (Jacobi color sweeps, models/mesweep.py);
        # BD-rate neutral vs the greedy host loop.
        enc.mv_refine_mode = "sweep"
    t0 = time.perf_counter()
    nbytes = 0
    kf_wall = 0.0
    for i, fr in enumerate(frames):
        tf = time.perf_counter()
        for p in enc.encode_frame(fr):
            nbytes += len(p)
        if i == 0:
            kf_wall = time.perf_counter() - tf
    for p in enc.flush():
        nbytes += len(p)
    dt = time.perf_counter() - t0
    return len(frames) * W * H / dt / 1e6, nbytes, kf_wall, dt


def probe_device_mode():
    """Pick the fastest encoder configuration for this machine: the TPU
    paths win when a chip is attached locally (PCIe-class transfers) and
    lose through high-latency tunnels, so measure instead of guessing.
    Returns (device, sweep, probe_results)."""
    # Backend detection runs in a subprocess with a hard timeout: when
    # the TPU plugin is installed but the chip is unreachable (dead
    # tunnel), jax's backend init can block for many minutes and would
    # stall the whole benchmark.
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=180)
        backend = probe.stdout.strip().splitlines()[-1] \
            if probe.returncode == 0 and probe.stdout.strip() else ""
    except subprocess.TimeoutExpired:
        return False, False, {"error": "backend probe timed out"}
    if backend not in ("tpu", "axon"):
        return False, False, {"backend": backend or "unavailable"}
    results = {}
    # Each probe config runs in its own subprocess with a hard wall
    # deadline: a device config whose compiles/dispatches stall on a
    # slow or dead tunnel must not hang the whole benchmark — it just
    # loses the probe (the compile cache means a healthy device path
    # only pays the compiles once, in the first probe ever run here).
    for name in ("host", "device", "device+sweep"):
        budget = 240 if name == "host" else 900
        if name == "device+sweep":
            # The sweep config is a strict superset of the device
            # config's chip usage: if plain device failed, timed out,
            # or already lost to the host, don't spend another budget
            # discovering the same thing.
            d = results.get("device")
            if not isinstance(d, dict):
                results[name] = "skipped (device failed)"
                continue
            h = results.get("host")
            if isinstance(h, dict) and d["mpix_s"] < h["mpix_s"]:
                results[name] = "skipped (device < host)"
                continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--probe-one", name],
                capture_output=True, text=True, timeout=budget)
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("{")]
            if r.returncode == 0 and line:
                results[name] = json.loads(line[-1])
            else:
                results[name] = "error: rc=%d %s" % (
                    r.returncode, r.stderr.strip()[-120:])
        except subprocess.TimeoutExpired:
            results[name] = "error: timed out (%ds)" % budget
    floats = [(v["mpix_s"], n) for n, v in results.items()
              if isinstance(v, dict)]
    if not floats:
        return False, False, results
    best = max(floats)[1]
    dev = best.startswith("device")
    sw = best == "device+sweep"
    return dev, sw, results


def bench_reference_c(frames):
    try:
        import codec_oracle as co
        co.get_lib()
    except Exception:
        return None
    enc = co.RefEncoder(W, H, quant=QUANT, complexity=COMPLEXITY,
                        keyframe_rate=256)
    enc.flush_headers()
    t0 = time.perf_counter()
    for i, fr in enumerate(frames):
        enc.encode_frame(fr, last=(i == len(frames) - 1))
    dt = time.perf_counter() - t0
    return len(frames) * W * H / dt / 1e6


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--probe-one":
        # Subprocess mode: warm + measure one configuration on a short
        # clip, print one JSON line (consumed by probe_device_mode)
        # including the device-path instrumentation of the measured
        # run (dispatch counts, host<->device bytes, compile totals —
        # the warm run's compiles are reported separately).
        name = sys.argv[2]
        _setup_jax_cache()
        from daala_tpu.utils import devstats
        short = make_clip()[:2]
        dev = name.startswith("device")
        sw = name == "device+sweep"
        devstats.reset()
        bench_ours(short, device=dev, sweep=sw)
        warm = devstats.snapshot()
        devstats.reset()
        v, _, kf_wall, dt = bench_ours(short, device=dev, sweep=sw)
        stats = devstats.snapshot()
        print(json.dumps({
            "config": name, "mpix_s": round(v, 4),
            "kf_wall_s": round(kf_wall, 2),
            "inter_wall_s": round(dt - kf_wall, 2),
            "dev": stats,
            "warm_compiles": warm["compiles"],
            "warm_compile_s": warm["compile_s"]}))
        return
    _setup_jax_cache()
    device, sweep, probe = probe_device_mode()
    from daala_tpu.utils import devstats
    per_content = {}
    tot_pix = tot_ours_s = tot_ref_s = 0.0
    have_ref = True
    for content in CONTENTS:
        frames = make_clip(content)
        # Alternating pairs damp shared-host drift (single runs on this
        # class of host swing by tens of percent); best-of-2 per side.
        devstats.reset()
        value, nbytes, kf_wall, dt = bench_ours(frames, device=device,
                                                sweep=sweep)
        stats = devstats.snapshot()
        baseline = bench_reference_c(frames)
        v2, _, _, dt2 = bench_ours(frames, device=device, sweep=sweep)
        b2 = bench_reference_c(frames)
        value = max(value, v2)
        dt = min(dt, dt2)
        if baseline and b2:
            baseline = max(baseline, b2)
        pix = len(frames) * W * H
        tot_pix += pix
        tot_ours_s += dt
        entry = {"ours_mpix_s": round(value, 4),
                 "kf_wall_s": round(kf_wall, 2)}
        if device:
            entry["dev"] = stats
        if baseline:
            tot_ref_s += pix / (baseline * 1e6)
            entry["ref_mpix_s"] = round(baseline, 4)
            entry["ratio"] = round(value / baseline, 3)
        else:
            have_ref = False
        per_content[content] = entry
    value = tot_pix / tot_ours_s / 1e6
    vs = (tot_ref_s / tot_ours_s) if have_ref and tot_ref_s else None
    print(json.dumps({
        "metric": "1080p_e2e_encode_throughput",
        "value": round(value, 4),
        "unit": "Mpixels/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "config": {"device_analysis": device, "mv_sweep": sweep,
                   "per_content": per_content, "probe": probe},
    }))


if __name__ == "__main__":
    main()
