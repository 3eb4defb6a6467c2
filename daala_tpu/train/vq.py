"""Gain-shape VQ codebook training (spherical k-means).

Re-implements the reference's vq_train tool
(reference: tools/vq_train.c:119-161 `vq_train`): sign-invariant
spherical k-means over unit vectors, with the option of excluding
training vectors that the K=2 PVQ codebook already represents better
than the trained codebook (reference: tools/vq_train.c:60-78
`pvq_dist_k2`).

Where the reference is an OpenMP scalar loop, the hot step here is a
single (vectors, dims) x (dims, entries) matmul per iteration -- the
shape the TPU MXU is built for -- jitted with jax when available and
falling back to numpy otherwise.
"""

from __future__ import annotations

import numpy as np

_SQRT1_2 = 0.7071067811865476


def _normalize(x, axis=-1):
    n = np.sqrt((x * x).sum(axis=axis, keepdims=True)) + 1e-30
    return x / n


def pvq_dist_k2(data: np.ndarray) -> np.ndarray:
    """Distance of each unit row to its best K=2 PVQ codeword: both
    pulses on the largest-magnitude dim, or one on each of the two
    largest (reference: tools/vq_train.c:60-78)."""
    a = np.abs(data)
    top2 = np.partition(a, -2, axis=1)[:, -2:]
    x2, x1 = top2[:, 0], top2[:, 1]
    return 2 - 2 * np.maximum(x1, _SQRT1_2 * (x1 + x2))


def _step_np(data, codebook, exclude_pvq):
    corr = data @ codebook.T
    best = np.argmax(np.abs(corr), axis=1)
    bc = corr[np.arange(len(data)), best]
    sign = np.where(bc > 0, 1.0, -1.0)
    err = 2 - 2 * np.abs(bc)
    if exclude_pvq:
        keep = err < pvq_dist_k2(data)
    else:
        keep = np.ones(len(data), bool)
    acc = np.zeros_like(codebook)
    w = np.where(keep, sign, 0.0)
    np.add.at(acc, best, w[:, None] * data)
    rms = float(np.sqrt(
        (np.where(keep, err, pvq_dist_k2(data))).mean()))
    return _normalize(acc), rms


def _make_step_jax(exclude_pvq):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(data, codebook):
        corr = data @ codebook.T                       # MXU matmul
        best = jnp.argmax(jnp.abs(corr), axis=1)
        bc = jnp.take_along_axis(corr, best[:, None], axis=1)[:, 0]
        sign = jnp.where(bc > 0, 1.0, -1.0)
        err = 2 - 2 * jnp.abs(bc)
        a = jnp.abs(data)
        top2 = jax.lax.top_k(a, 2)[0]
        pvq_err = 2 - 2 * jnp.maximum(
            top2[:, 0], _SQRT1_2 * (top2[:, 0] + top2[:, 1]))
        keep = (err < pvq_err) if exclude_pvq else jnp.ones_like(err, bool)
        w = jnp.where(keep, sign, 0.0)
        acc = jnp.zeros_like(codebook).at[best].add(w[:, None] * data)
        norm = jnp.sqrt((acc * acc).sum(-1, keepdims=True)) + 1e-30
        rms = jnp.sqrt(jnp.where(keep, err, pvq_err).mean())
        return acc / norm, rms

    return step


def train(data: np.ndarray, nb_entries: int, nb_iter: int = 100,
          exclude_pvq: bool = True, seed: int = 0, backend: str = "auto"):
    """(codebook, rms_history).  `data` is (vectors, dims); rows are
    normalized.  Initial codebook is randomly drawn rows plus noise
    (reference: tools/vq_train.c:104-117)."""
    rng = np.random.default_rng(seed)
    data = _normalize(np.asarray(data, np.float64))
    ids = rng.integers(0, len(data), nb_entries)
    codebook = _normalize(
        data[ids] + 0.01 * rng.integers(-1, 2, (nb_entries, data.shape[1])))
    step = None
    if backend in ("auto", "jax"):
        try:
            step_jax = _make_step_jax(exclude_pvq)
            d32, c32 = data.astype(np.float32), codebook.astype(np.float32)

            def step(d, c):
                c2, rms = step_jax(d32, c.astype(np.float32))
                return np.asarray(c2, np.float64), float(rms)
        except Exception:
            if backend == "jax":
                raise
            step = None
    if step is None:
        def step(d, c):
            return _step_np(d, c, exclude_pvq)
    hist = []
    for _ in range(nb_iter):
        codebook, rms = step(data, codebook)
        hist.append(rms)
    return codebook, hist


def main(argv=None):
    import argparse
    import sys
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dims", type=int)
    ap.add_argument("max_vectors", type=int)
    ap.add_argument("bits", type=int)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--keep-pvq", action="store_true",
                    help="do not exclude PVQ-K2-covered vectors")
    args = ap.parse_args(argv)
    rows = []
    for line in sys.stdin:
        vals = [float(v) for v in line.split()]
        if len(vals) == args.dims:
            rows.append(vals)
        if len(rows) >= args.max_vectors:
            break
    data = np.array(rows)
    cb, hist = train(data, 1 << args.bits, args.iters,
                     exclude_pvq=not args.keep_pvq)
    print("/* Trained by daala_tpu.train.vq; final RMS %f. */" % hist[-1])
    for row in cb:
        print(", ".join("%f" % v for v in row) + ",")


if __name__ == "__main__":
    main()
