"""Multi-chip scaling utilities.

Two independent axes of parallelism, reflecting the codec's structure
(SURVEY.md section 7: the only irreducibly sequential parts are the range
coder and cross-block adaptation; everything else batches):

1. **Device mesh (dp, sp)** for the jittable transform pipeline
   (daala_tpu/models/analysis.py): clips/frames shard over `dp`, frame
   columns over `sp`, with XLA inserting the halo collectives.  This is
   the TPU-parallel front-end used by bench.py and __graft_entry__.

2. **Host segment parallelism** for full conformant encodes: the
   bitstream resets all adaptation at keyframes, so a clip split at
   keyframe boundaries encodes in fully independent processes and the
   packets concatenate exactly (the standard production pattern for
   non-parallel codecs; the reference has no equivalent, it is strictly
   single-threaded, SURVEY.md section 2.6).
"""

from __future__ import annotations

import os

import numpy as np


# -- 1. device mesh ---------------------------------------------------------

def make_mesh(n_devices=None, dp=None):
    """Build a (dp, sp) jax Mesh over the available devices."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if dp is None:
        dp = 2 if n % 2 == 0 else 1
    sp = n // dp
    return Mesh(devs[:dp * sp].reshape(dp, sp), ("dp", "sp"))


def shard_batch(frames_u8, mesh):
    """Place a (B, H, W) uint8 batch on the mesh: batch over dp, columns
    over sp."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PS
    return jax.device_put(frames_u8,
                          NamedSharding(mesh, PS("dp", None, "sp")))


_STEP_CACHE = {}


def batch_encode_step(frames, bs=1, quant=3840):
    """Jitted, vmapped device-side analysis+quantize+synthesis over a
    (B, H, W) batch; shard the input with shard_batch first and run under
    the mesh to scale across chips.  The jitted step is cached per
    (bs, quant) so repeated calls don't retrace."""
    key = (bs, quant)
    step = _STEP_CACHE.get(key)
    if step is None:
        import jax
        import jax.numpy as jnp
        from daala_tpu.models.analysis import encode_step

        @jax.jit
        def step(fs):
            rec, sse, nz = jax.vmap(
                lambda f: encode_step(f, bs=bs, quant=quant))(fs)
            return rec, jnp.sum(sse), jnp.sum(nz)

        _STEP_CACHE[key] = step
    return step(frames)


# -- 2. host segment parallelism --------------------------------------------

def _encode_segment(args):
    (frames, info_kwargs, enc_kwargs, b_frames) = args
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.encoder import Encoder
    info = H.Info(**info_kwargs)
    enc = Encoder(info, **enc_kwargs)
    enc.b_frames = b_frames
    packets = []
    for planes in frames:
        packets.extend(enc.encode_frame(planes))
    packets.extend(enc.flush())
    return packets


def encode_clip_parallel(frames, info_kwargs, enc_kwargs=None, b_frames=0,
                         segment_len=32, workers=None):
    """Encode a clip with keyframe-aligned segments in parallel processes.

    frames: list of per-frame plane lists.  Each segment starts with a
    keyframe (adaptation and reference state fully reset), so packets
    from consecutive segments concatenate into a conformant stream.
    segment_len must be a multiple of 16 (OD_MAX_REORDER) so the coded
    display numbering stays aligned across segment boundaries.
    Returns the flat packet list in display order."""
    assert segment_len % 16 == 0
    enc_kwargs = dict(enc_kwargs or {})
    segs = [frames[i:i + segment_len]
            for i in range(0, len(frames), segment_len)]
    # Force a keyframe at each segment start by capping keyframe_rate.
    info_kwargs = dict(info_kwargs)
    info_kwargs.setdefault("keyframe_rate", segment_len)
    args = [(seg, info_kwargs, enc_kwargs, b_frames) for seg in segs]
    if len(segs) == 1 or (workers is not None and workers <= 1):
        out = [_encode_segment(a) for a in args]
    else:
        import multiprocessing as mp
        nproc = workers or min(len(segs), os.cpu_count() or 1)
        ctx = mp.get_context("fork")
        with ctx.Pool(nproc) as pool:
            out = pool.map(_encode_segment, args)
    packets = []
    for seg_pkts in out:
        packets.extend(seg_pkts)
    return packets


# -- 3. batched multi-clip encode over the device mesh ----------------------

def encode_clips_batched(clips, info_kwargs, mesh, quant=18, complexity=7,
                         enc_kwargs=None, threads=None):
    """BASELINE.json config 5: N clips encoded by the REAL production
    encoder (trial-encode RDO, full entropy stage) with every device
    stage — BMA SAD fields, RDO transform pyramids, final analysis —
    running on the (dp, sp) mesh: clips map onto dp rows, each clip's
    planes shard over that row's sp columns.

    With threads (the default for >1 clip) each clip encodes on its own
    host thread: clip B's device dispatches are issued while clip A's
    host entropy stage runs, because both the ctypes calls into the
    native frame/ME engines and the blocking device-result reads
    release the GIL (the native engines' persistent scratch is
    thread_local).  threads=False keeps the round-robin single-thread
    schedule, where only XLA's async dispatch overlaps.

    Packets are byte-identical to a serial single-device encode either
    way (the device stages are exact and the clips are independent;
    tests/test_parallel.py pins both schedules).  Returns a list of
    per-clip packet lists."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
    from daala_tpu.codec import headers as H
    from daala_tpu.codec.encoder import Encoder
    enc_kwargs = dict(enc_kwargs or {})
    dp, sp = mesh.devices.shape
    encs = []
    outs = []
    for ci, frames in enumerate(clips):
        row = mesh.devices[ci % dp]          # (sp,) devices
        row_mesh = Mesh(row.reshape(1, sp), ("dp", "sp"))

        def put(arr, pli, _m=row_mesh):
            import numpy as np
            a = np.asarray(arr)
            # Spatial column sharding for 2-D planes; replicate small
            # or oddly-shaped auxiliaries on the row.
            if a.ndim == 2 and a.shape[-1] % sp == 0:
                return jax.device_put(a, NamedSharding(_m, PS(None,
                                                              "sp")))
            if a.ndim == 3 and a.shape[-1] % sp == 0:
                return jax.device_put(
                    a, NamedSharding(_m, PS(None, None, "sp")))
            return jax.device_put(a, NamedSharding(_m, PS()))

        info = H.Info(**info_kwargs)
        enc = Encoder(info, quant=quant, complexity=complexity,
                      **enc_kwargs)
        enc.use_device_analysis = True
        enc.device_put_fn = put
        encs.append(enc)
        outs.append([])
    if threads is None:
        threads = len(clips) > 1
    if threads:
        import threading
        errs = [None] * len(clips)

        def run_clip(ci):
            try:
                # The mesh context stack is thread-local: each worker
                # enters it for its own trace/dispatch calls.
                with mesh:
                    for fr in clips[ci]:
                        outs[ci].extend(encs[ci].encode_frame(fr))
                    outs[ci].extend(encs[ci].flush())
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errs[ci] = e

        workers = [threading.Thread(target=run_clip, args=(ci,))
                   for ci in range(len(clips))]
        for t in workers:
            t.start()
        for t in workers:
            t.join()
        for e in errs:
            if e is not None:
                raise e
        return outs
    nfr = max(len(c) for c in clips)
    with mesh:
        for t in range(nfr):
            for ci, frames in enumerate(clips):
                if t < len(frames):
                    outs[ci].extend(encs[ci].encode_frame(frames[t]))
        for ci in range(len(clips)):
            outs[ci].extend(encs[ci].flush())
    return outs
