"""Lapped-transform coding gain: measurement and filter search.

Re-implements the reference's transform-design tools
(reference: tools/trans.c:54-200 `coding_gain_search`,
tools/trans_gain.c:1149-1215 `cg_1d`): the 1-D coding gain of the
lapped DCT on an AR(rho) process is

    cg = -(10/N) * sum_j log10( (G R G^T)_jj * ||H_j||^2 )

where G/H are the analysis/synthesis operators including the boundary
pre/post filters, and R is the source autocorrelation over the lapped
support (reference: tools/trans_gain.c:25-80).

The lapped filters are modeled as *continuous* lifting matrices in the
reference's Q6 parameter space (scales + lifting steps; the structure
of src/filter.c:137-232), so the whole objective is differentiable:
`search` runs optax gradient ascent on TPU/CPU followed by an integer
polish in the Q6 lattice, reproducing the search capability of
trans.c's exhaustive/simplex loops as a jax program.  The shipped
`OD_FILTER_PARAMS4 = (85, 75, -15, 33)` sit within a few hundredths of
a dB of the unconstrained optimum found this way (tests/test_train.py).
"""

from __future__ import annotations

import numpy as np

#: Shipped integer filter parameters (reference: src/filter.c:137-144
#: OD_FILTER_PARAMS4, :234-260 OD_FILTER_PARAMS8).
PARAMS4 = (85, 75, -15, 33)
PARAMS8 = (93, 72, 73, 78, -10, 23, -23, 37, -28, 50)


def _filter_matrix(params, n, xp=np):
    """(2n, 2n) pre-filter matrix for the n-point boundary filter with
    continuous Q6 `params`: scales s[0..n/2) (innermost first) then
    lifting pairs (p, q) from the outermost coefficient pair inward
    (the dataflow of src/filter.c:146-232 with exact arithmetic)."""
    m = n // 2
    s = [xp.asarray(p) / 64.0 for p in params[:m]]
    pq = [xp.asarray(p) / 64.0 for p in params[m:]]
    eye = np.eye(2 * m)
    x = [xp.asarray(eye[i]) for i in range(2 * m)]
    # Butterflies: t[m+k] = x[k] - x[2m-1-k]; t[k] = x[k] - t[m+k]/2.
    t = list(x)
    for k in range(m):
        t[m + (m - 1 - k)] = x[k] - x[2 * m - 1 - k]
    for k in range(m):
        t[k] = x[k] - t[m + (m - 1 - k)] * 0.5
    # Scales: innermost difference (index m) scaled by s[0], outermost
    # (index 2m-1) by s[m-1].
    for k in range(m):
        t[m + k] = t[m + k] * s[k]
    # Lifting pairs, outermost inward: (t[2m-1] += p*t[2m-2];
    # t[2m-2] += q*t[2m-1]), then the next pair, ...
    for i, k in enumerate(range(2 * m - 1, m, -1)):
        t[k] = t[k] + pq[2 * i] * t[k - 1]
        t[k - 1] = t[k - 1] + pq[2 * i + 1] * t[k]
    # Inverse butterflies.
    out = [None] * (2 * m)
    for k in range(m):
        t[k] = t[k] + t[m + (m - 1 - k)] * 0.5
        out[k] = t[k]
        out[2 * m - 1 - k] = t[k] - t[m + (m - 1 - k)]
    return xp.stack(out)


def dct_matrix(n, xp=np):
    """Orthonormal DCT-II."""
    k = np.arange(n)
    mat = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0] *= np.sqrt(0.5)
    return xp.asarray(mat)


def ar_autocorrelation(support, rho=0.95, xp=np):
    i = np.arange(support)
    return xp.asarray(rho ** np.abs(i[None, :] - i[:, None]))


def coding_gain_1d(params, n=4, filt_n=4, rho=0.95, xp=np):
    """Coding gain (dB) of the n-point lapped DCT whose boundaries use
    the filt_n-point filter with `params`, on an AR(rho) source."""
    f = filt_n // 2
    support = n + 2 * filt_n
    # Analysis operator: pre-filter at both block edges, then DCT on
    # the center block.
    a = xp.asarray(np.eye(support))
    pf = _filter_matrix(params, filt_n, xp)

    def apply_at(mat, op, pos):
        block = op @ mat[pos:pos + 2 * f]
        return xp.concatenate([mat[:pos], block, mat[pos + 2 * f:]])

    a = apply_at(a, pf, filt_n - f)
    a = apply_at(a, pf, filt_n + n - f)
    d = dct_matrix(n, xp)
    g = d @ a[filt_n:filt_n + n]
    # Synthesis operator: transpose flow with the inverse filter.
    if xp is np:
        pfi = np.linalg.inv(pf)
    else:
        pfi = xp.asarray(xp.linalg.inv(pf))
    s = xp.asarray(np.eye(support))[:, filt_n:filt_n + n] @ d.T
    h = xp.concatenate([
        s[:filt_n - f],
        pfi @ s[filt_n - f:filt_n + f],
        s[filt_n + f:filt_n + n - f],
        pfi @ s[filt_n + n - f:filt_n + n + f],
        s[filt_n + n + f:]])
    r = ar_autocorrelation(support, rho, xp)
    var = xp.diagonal(g @ r @ g.T)
    hnorm = (h * h).sum(axis=0)
    if xp is np:
        return float(-10.0 * np.mean(np.log10(var * hnorm)))
    return -10.0 * xp.mean(xp.log10(var * hnorm))


def search(n=4, filt_n=4, rho=0.95, steps=400, lr=0.3, seed=0,
           init=None, polish_radius=1):
    """Gradient-ascend the coding gain over continuous Q6 filter
    params with optax, then polish on the integer lattice.  Returns
    (best_int_params, best_cg, float_cg)."""
    import jax
    import jax.numpy as jnp
    import optax

    if init is None:
        init = PARAMS4 if filt_n == 4 else PARAMS8
    theta0 = jnp.asarray(np.array(init, np.float64))

    def neg_cg(theta):
        return -coding_gain_1d(theta, n, filt_n, rho, jnp)

    opt = optax.adam(lr)
    state = opt.init(theta0)
    theta = theta0
    val_grad = jax.jit(jax.value_and_grad(neg_cg))
    for _ in range(steps):
        v, grad = val_grad(theta)
        updates, state = opt.update(grad, state)
        theta = optax.apply_updates(theta, updates)
    float_cg = float(-neg_cg(theta))
    # Integer polish: greedy +-polish_radius sweeps until fixed point.
    best = tuple(int(round(float(t))) for t in theta)
    best_cg = coding_gain_1d(best, n, filt_n, rho)
    improved = True
    while improved:
        improved = False
        for i in range(len(best)):
            for d in range(-polish_radius, polish_radius + 1):
                if d == 0:
                    continue
                cand = best[:i] + (best[i] + d,) + best[i + 1:]
                cg = coding_gain_1d(cand, n, filt_n, rho)
                if cg > best_cg:
                    best, best_cg, improved = cand, cg, True
    return best, best_cg, float_cg


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--filt", type=int, default=4, choices=[4, 8])
    ap.add_argument("--rho", type=float, default=0.95)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--search", action="store_true")
    args = ap.parse_args(argv)
    shipped = PARAMS4 if args.filt == 4 else PARAMS8
    print("shipped params %s: cg = %.4f dB"
          % (shipped, coding_gain_1d(shipped, args.n, args.filt, args.rho)))
    m = args.filt // 2
    ident = (64,) * m + (0,) * (2 * (m - 1))
    print("unlapped DCT: cg = %.4f dB"
          % coding_gain_1d(ident, args.n, args.filt, args.rho))
    if args.search:
        best, cg, fcg = search(args.n, args.filt, args.rho, args.steps)
        print("searched params %s: cg = %.4f dB (float optimum %.4f)"
              % (best, cg, fcg))


if __name__ == "__main__":
    main()
