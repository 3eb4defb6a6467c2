#!/usr/bin/env python3
"""Benchmark: device-side 1080p frame analysis+quantize+synthesis throughput.

Measures the jittable transform pipeline (lapped pre/post filters +
reversible DCT analysis/synthesis + quantization + distortion stats,
daala_tpu/models/analysis.py) over a sharded batch on the device mesh,
with launches pipelined so the number reflects device compute rather than
per-call host-tunnel dispatch latency.  Output correctness is pinned by
tests (bit-exact vs the numpy/CPU path and the reference C lifting).

Prints one JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.  The baseline is the reference C encoder's single-thread
1080p intra FULL-encode throughput measured on this host via the compiled
oracle (the closest apples-to-apples number the reference offers; its
transform stage is not separable).  If the oracle is unavailable,
vs_baseline is null.
"""

import json
import os
import sys
import time

import numpy as np

# Reference C encoder 1080p intra throughput measured on this host
# (RefEncoder quant=20, complexity 7, single thread); refreshed whenever the
# oracle is available at bench time.
FALLBACK_BASELINE_MPIX_S = None

H, W = 1088, 1920  # 1080p padded to the 64-pixel superblock grid


def bench_tpu():
    import jax
    from daala_tpu.parallel import mesh as PM
    ndev = len(jax.devices())
    mesh = PM.make_mesh()
    batch = max(2, 2 * ndev)
    frames = np.random.default_rng(0).integers(
        0, 256, (batch, H, W), np.uint8)
    sharded = PM.shard_batch(np.asarray(frames), mesh)
    with mesh:
        rec, sse, nz = PM.batch_encode_step(sharded)
        rec.block_until_ready()  # compile
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            rec, sse, nz = PM.batch_encode_step(sharded)
        rec.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    # Per-chip throughput: total pixels / time / devices.
    return batch * (H * W) / dt / 1e6 / ndev


def bench_reference_c():
    """Time the reference C encoder on the same frame (one intra frame)."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        import codec_oracle as co
        co.get_lib()
    except Exception:
        return None
    rng = np.random.default_rng(0)
    Y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    Cb = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    Cr = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    enc = co.RefEncoder(W, H, quant=20, keyframe_rate=1)
    enc.flush_headers()
    t0 = time.perf_counter()
    enc.encode_frame([Y, Cb, Cr], last=True)
    dt = time.perf_counter() - t0
    return (H * W) / dt / 1e6


def main():
    value = bench_tpu()
    baseline = bench_reference_c() or FALLBACK_BASELINE_MPIX_S
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "1080p_frame_analysis_quant_synthesis_throughput",
        "value": round(value, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
