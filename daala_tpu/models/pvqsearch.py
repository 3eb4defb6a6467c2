"""Device PVQ band search: the per-band gain/theta/codeword RDO batched
over every band of an inter frame as one jitted pass per bucket.

The reference's per-band search (od_pvq_encode -> pvq_theta,
/root/reference/src/pvq_encoder.c:333-636) is embarrassingly parallel
across the bands of a frame: with the reference's own fast rate model
(the `speed > 0` branch of od_pvq_rate, src/pvq_encoder.c:247-262) the
search depends only on the input coefficients, the MC-prediction
coefficients, the frame quantizer and the QM tables — none of the
sequentially-adapted entropy state.  So for inter frames the whole
search batches on the TPU; the host entropy pass replays the decisions
through the exact normative tail (skip logic + synthesis) in
pvq_codec.pvq_theta(forced=...).

Bucketing: bands group by (plane-class, block size, band index) — each
bucket has a single band length n in {15, 8, 32, 128}, one beta, one
per-band quantizer, and constant QM slices, so every bucket is one
fixed-shape jitted call vectorized over its m bands.

Decision parity: the integer stages (gains, companding, Householder,
k) follow the reference's fixed-point semantics exactly; the float RDO
(distortions, pulse search, rate model) runs in f32 with fresh
per-candidate pulse searches and the fast rate model, so a small
fraction of near-tie decisions differ from the host's f64 exact-rate
search.  The streams stay valid and BD-rate-neutral (measured in
tests/test_pvqsearch.py); the host falls back to its own search for
any band the device marks invalid (pulse budget overflow).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from daala_tpu.ops import pvq as P

_GAIN_WEIGHT = 1.4
_CGSCALE = float(P.OD_CGAIN_SCALE)

# ---------------------------------------------------------------------------
# Vectorized fixed-point helpers (int32 semantics of ops/pvq.py).
# ---------------------------------------------------------------------------


def _i64(x):
    return jnp.asarray(x, jnp.int64)


def _ilog(x):
    """OD_ILOG for non-negative x (bit length); 0 -> 0."""
    x = x.astype(jnp.uint32)
    return jnp.where(x == 0, 0, 32 - jax.lax.clz(x).astype(jnp.int32))


def _ilog_c(x):
    """OD_ILOG via CLZ: negative 32-bit inputs yield 32."""
    return jnp.where(x < 0, 32, _ilog(jnp.maximum(x, 0)))


def _shl32(a, s):
    """32-bit wrapping left shift (scalar shift)."""
    v = (_i64(a) << s) & 0xFFFFFFFF
    return jnp.where(v >= (1 << 31), v - (1 << 32), v)


def _wrap16(v):
    return ((v + 32768) & 65535) - 32768


def _shr_round(x, s):
    return (x + (1 << s >> 1)) >> s


def _vshr(x, s):
    """Variable shift; negative s = wrapping left shift."""
    return jnp.where(s > 0, _i64(x) >> jnp.maximum(s, 0),
                     _shl32(x, jnp.maximum(-s, 0)))


def _vshr_round(x, s):
    sp = jnp.maximum(s, 0)
    return jnp.where(s > 0, (_i64(x) + (_i64(1) << sp >> 1)) >> sp,
                     _shl32(x, jnp.maximum(-s, 0)))


def _mult16_16_q15(a, b):
    return (_i64(a) * _i64(b)) >> 15


def _mult16_16_q16(a, b):
    return (_i64(a) * _i64(b)) >> 16


def _mult16_32_qbeta(a, b):
    return (_i64(a) * _i64(b)) >> P.OD_BETA_SHIFT


def _od_rcp(x):
    i = _ilog_c(x) - 1
    n = _wrap16(_vshr_round(x, i - P.OD_RCP_INSHIFT)
                - (1 << P.OD_RCP_INSHIFT))
    r = _wrap16(30840 + _mult16_16_q15(-15420, n))
    r = _wrap16(r - _mult16_16_q15(r, _mult16_16_q15(r, n) + r - 32768))
    r = _wrap16(r - (1 + _mult16_16_q15(r, _mult16_16_q15(r, n) + r
                                        - 32768)))
    return _wrap16(_vshr_round(r, i - P.OD_RCP_OUTSHIFT))


def _rsqrt_norm(t):
    n = _i64(t) - 32768
    r = 23565 + _mult16_16_q15(n, -13481 + _mult16_16_q15(n, 6711))
    r2 = r * r
    y = (((r2 >> 15) * n + r2) >> 12) - 131077
    ry = r * y
    return r + ((((ry >> 16) * (3 * y) >> 3) - ry) >> 18)


def _od_rsqrt(x):
    k = (_ilog(x) - 1) >> 1
    s = 2 * k - (P.OD_RSQRT_INSHIFT - 2)
    t = _vshr(x, s)
    shift = P.OD_RSQRT_OUTSHIFT + ((s + P.OD_RSQRT_INSHIFT) >> 1)
    return _rsqrt_norm(t), shift


def _sqrt_norm(x):
    return jnp.minimum(_shr_round(x * _rsqrt_norm(x), P.OD_SQRT_OUTSHIFT),
                       32767)


def _od_sqrt(x):
    """(sqrt_norm, shift); x == 0 -> (0, 0)."""
    k = (_ilog(x) - 1) >> 1
    s = 2 * k - (P.OD_SQRT_INSHIFT - 2)
    t = _vshr(x, s)
    shift = P.OD_SQRT_OUTSHIFT - ((s + P.OD_SQRT_INSHIFT) >> 1)
    zero = x == 0
    return jnp.where(zero, 0, _sqrt_norm(t)), jnp.where(zero, 0, shift)


_EXP2_C = (32768, 22709, 7913, 1704, 443)


def _od_exp2(x):
    integer = _i64(x) >> P.OD_EXP2_INSHIFT
    xf = _i64(x) - _shl32(integer, P.OD_EXP2_INSHIFT)
    frac = _mult16_16_q15(
        xf, _EXP2_C[1] + _mult16_16_q15(
            xf, _EXP2_C[2] + _mult16_16_q15(
                xf, _EXP2_C[3] + _mult16_16_q15(xf, _EXP2_C[4]))))
    out = _vshr_round(_EXP2_C[0] + frac, -integer.astype(jnp.int32)) + 1
    out = jnp.where(integer > 14, 0x7F000000, out)
    out = jnp.where(integer < -15, 0, out)
    return out


def _od_log2(x):
    return _i64(x) + _mult16_16_q15(
        x, 14482 + _mult16_16_q15(
            x, -23234 + _mult16_16_q15(
                x, 13643 + _mult16_16_q15(
                    x, -6403 + _mult16_16_q15(x, 1515)))))


def _od_pow(x, beta):
    """x**beta (beta a host int scalar, Q12); x vector."""
    log2_x = _ilog(x) - 1
    xshift = log2_x - P.OD_LOG2_INSHIFT
    t = _vshr(x, xshift) - (1 << P.OD_LOG2_INSHIFT)
    logr = _od_log2(t) + (_i64(log2_x) - P.OD_COMPAND_SHIFT) \
        * P.OD_LOG2_OUTSCALE
    logr = _mult16_32_qbeta(beta, logr)
    return jnp.where(x == 0, 0, _od_exp2(logr))


def _gain_compand(g, q0, beta):
    """beta is a static host int."""
    if beta == P.BETA_1:
        return (P.OD_CGAIN_SCALE * _i64(g) + (_i64(q0) >> 1)) // _i64(q0)
    expr = _od_pow(g, P.beta_rcp(beta))
    expr = expr << (P.OD_CGAIN_SHIFT + P.OD_COMPAND_SHIFT
                    - P.OD_EXP2_OUTSHIFT)
    return (expr + (_i64(q0) >> 1)) // _i64(q0)


def _compute_gain(x16, q0, beta, bshift):
    acc = jnp.sum(_i64(x16) * _i64(x16), axis=-1)
    irt, sqrt_shift = _od_sqrt(acc)
    g = _vshr_round(irt, sqrt_shift - bshift)
    return _gain_compand(g, q0, beta), g


def _gain_expand(cg0, q0, beta):
    if beta == P.BETA_1:
        return _shr_round(_i64(cg0) * _i64(q0), P.OD_CGAIN_SHIFT)
    if beta == P.BETA_1_5:
        irt, sqrt_outshift = _od_sqrt(_i64(cg0) * _i64(q0))
        sqrt_inshift = (P.OD_CGAIN_SHIFT + P.OD_COMPAND_SHIFT) >> 1
        tmp = _i64(cg0) * _i64(q0) * irt
        return _vshr_round(tmp, P.OD_CGAIN_SHIFT + sqrt_outshift
                           + sqrt_inshift)
    cg = _shr_round(_i64(cg0) * _i64(q0), P.OD_CGAIN_SHIFT)
    expr = _od_pow(cg, beta)
    return _shr_round(expr, P.OD_EXP2_OUTSHIFT - P.OD_COMPAND_SHIFT)


def _cos_pi_2(x):
    x2 = _mult16_16_q15(x, x)
    return jnp.minimum(
        32767,
        (1073758164 - _i64(x) * _i64(x) + x2
         * (-7654 + _mult16_16_q16(x2, 16573
                                   + _mult16_16_q16(-2529, x2)))) >> 15)


def _pvq_cos(x):
    x = _i64(x) & 0x0001FFFF
    x = jnp.where(x > (1 << 16), (1 << 17) - x, x)
    poly = jnp.where(x < (1 << 15), _cos_pi_2(x), -_cos_pi_2(65536 - x))
    exact = jnp.where(x & 0x0000FFFF, 0,
                      jnp.where(x & 0x0001FFFF, -32767, 32767))
    return jnp.where((x & 0x00007FFF) != 0, poly, exact)


def _pvq_sin(x):
    return _pvq_cos(32768 - _i64(x))


def _compute_max_theta(qcg, beta):
    qconst_pi_2 = int(0.5 + (np.pi / 2) * (1 << P.OD_CGAIN_SHIFT))
    ts = _shr_round(_i64(qcg) * _mult16_32_qbeta(P.beta_rcp(beta),
                                                 qconst_pi_2),
                    P.OD_CGAIN_SHIFT * 2)
    return jnp.where(qcg < int(0.5 + 1.4 * (1 << P.OD_CGAIN_SHIFT)), 1,
                     ts).astype(jnp.int32)


def _compute_theta(t, max_theta):
    t = jnp.minimum(t, max_theta - 1)
    return jnp.where(max_theta != 0,
                     (P.OD_MAX_THETA_SCALE * _i64(t)
                      + (_i64(max_theta) >> 1)) // jnp.maximum(
                          _i64(max_theta), 1),
                     0)


def _compute_k(qcg, itheta, noref, n, beta):
    """n, beta static; qcg/itheta vectors; noref static bool."""
    if noref:
        rt = P._SQRT_TABLE[1][P._ilog(n + 1)]
        k = jnp.maximum(1, _shr_round(
            (_i64(qcg) - int(0.5 + 0.2 * (1 << P.OD_CGAIN_SHIFT)))
            * _mult16_32_qbeta(P.beta_rcp(beta), rt),
            P.OD_CGAIN_SHIFT + P.OD_SQRT_TBL_SHIFT))
        k = jnp.where(qcg == 0, 0, k)
        if n == 15 and beta > P.beta_q12(1.25):
            k = jnp.where(qcg == P.OD_CGAIN_SCALE, 1, k)
        return k.astype(jnp.int32)
    rt = P._SQRT_TABLE[0][P._ilog(n + 1)]
    k = jnp.maximum(1, _vshr_round(
        (_shl32(itheta, P.OD_ITHETA_SHIFT)
         - int(0.5 + 0.2 * (1 << P.OD_ITHETA_SHIFT))) * rt,
        P.OD_SQRT_TBL_SHIFT + P.OD_ITHETA_SHIFT))
    return jnp.where(itheta == 0, 0, k).astype(jnp.int32)


def _apply_householder(x, r):
    """Vectorized over rows: x, r (m, n) int64."""
    l2r = jnp.sum(r * r, axis=-1, keepdims=True)
    proj = jnp.sum(r * x, axis=-1, keepdims=True)
    l2r_shift = (_ilog(l2r) - 1) - 14
    l2r_norm = _wrap16(_vshr_round(l2r, l2r_shift))
    rcp = _od_rcp(l2r_norm)
    proj_shift = (_ilog(jnp.abs(proj)) - 1) - 14
    proj_norm = _wrap16(_vshr_round(proj, proj_shift))
    proj_1 = _wrap16(_mult16_16_q15(proj_norm, rcp))
    outshift = jnp.minimum(30, P.OD_RCP_OUTSHIFT - proj_shift - 1
                           + l2r_shift)
    tmp = r * proj_1
    pos = (tmp + (_i64(1) << jnp.maximum(outshift, 0) >> 1)) \
        >> jnp.maximum(outshift, 0)
    neg = _shl32(tmp, jnp.maximum(-outshift, 0))
    tmp = jnp.where(outshift >= 0, pos, neg)
    return _wrap16(x - tmp)


# ---------------------------------------------------------------------------
# Pulse search (reference: pvq_search_rdo_double, src/pvq_encoder.c:93-227)
# ---------------------------------------------------------------------------

_RSQRT16 = jnp.asarray(
    [1.000000, 0.707107, 0.577350, 0.500000, 0.447214, 0.408248,
     0.377964, 0.353553, 0.333333, 0.316228, 0.301511, 0.288675,
     0.277350, 0.267261, 0.258199, 0.250000], jnp.float32)


def _pulse_search(xc, k, g2, lam, n, iters, lane_ok=None):
    """Vectorized greedy RDO pulse allocation.

    xc: (m, n) f32 signed coefficients; lane_ok: (m, n) bool — lanes
    outside the coded sub-vector (the theta path searches n-1 dims)
    are excluded from every argmax and contribute zero; k: (m,) target
    pulses; g2: (m,) distortion scale.  Returns (y signed (m, n)
    int32, cos_dist (m,), ok (m,) — False when `iters` steps were not
    enough).  Fresh search per call (the host's prev_k warm starts are
    an optimization of its sequential candidate chain)."""
    if lane_ok is None:
        lane_ok = jnp.ones(xc.shape, jnp.bool_)
    xc = jnp.where(lane_ok, xc, 0.0)
    x = jnp.abs(xc)
    xx = jnp.sum(x * x, axis=-1)
    norm_1 = 1.0 / jnp.sqrt(1e-30 + xx)
    lamr = lam / (1e-30 + g2)
    kf = k.astype(jnp.float32)
    # Floor-projection init for k > 2 (host: k > 2 branch).
    l1 = jnp.sum(x, axis=-1, keepdims=True)
    yp0 = jnp.floor(kf[:, None] * x / jnp.maximum(l1, 1e-30))
    yp0 = jnp.maximum(yp0, 0.0)
    yp0 = jnp.where((k > 2)[:, None], yp0, 0.0)
    xy0 = jnp.sum(x * yp0, axis=-1)
    yy0 = jnp.sum(yp0 * yp0, axis=-1)
    i0 = jnp.sum(yp0, axis=-1)
    rdo_pulses = 1 + k // 4
    delta_rate = jnp.full_like(kf, 3.0 / n)
    accel_rate = jnp.zeros_like(kf)
    if n == 15:
        accel_rate = jnp.where(k == 1, -8.0 / n, accel_rate)
        delta_rate = jnp.where(k == 1, 4.5 / n - (-8.0 / n), delta_rate)
    elif n == 8:
        accel_rate = jnp.where(k == 1, 5.7 / n, accel_rate)
        delta_rate = jnp.where(k == 1, 9.3 / n - 5.7 / n, delta_rate)
    jidx = jnp.arange(n, dtype=jnp.float32)
    rate_pen = (lamr[:, None] * jidx[None, :]
                * (delta_rate[:, None] + jidx[None, :]
                   * accel_rate[:, None]))

    def body(_, state):
        yp, xy, yy, i = state
        active = i < kf
        phase2 = i >= (kf - rdo_pulses.astype(jnp.float32))
        txy = xy[:, None] + x
        tyy = yy[:, None] + 2.0 * yp + 1.0
        score1 = (txy * txy) / tyy
        idx = tyy  # yy + 2*yp + 1
        small = idx <= 16.0
        tidx = jnp.clip(idx, 1.0, 16.0).astype(jnp.int32) - 1
        tyy_r = jnp.where(small, _RSQRT16[tidx], 1.0 / jnp.sqrt(
            jnp.maximum(idx, 1.0)))
        score2 = 2.0 * txy * norm_1[:, None] * tyy_r - rate_pen
        score = jnp.where(phase2[:, None], score2, score1)
        score = jnp.where(lane_ok, score, -jnp.inf)
        pos = jnp.argmax(score, axis=-1)
        xadd = jnp.take_along_axis(x, pos[:, None], axis=-1)[:, 0]
        yold = jnp.take_along_axis(yp, pos[:, None], axis=-1)[:, 0]
        one = jnp.where(active, 1.0, 0.0)
        yp = yp.at[jnp.arange(yp.shape[0]), pos].add(one)
        xy = xy + jnp.where(active, xadd, 0.0)
        yy = yy + jnp.where(active, 2.0 * yold + 1.0, 0.0)
        i = i + one
        return yp, xy, yy, i

    yp, xy, yy, i = jax.lax.fori_loop(
        0, iters, body, (yp0, xy0, yy0, i0))
    ok = i >= kf
    cos_dist = xy / (1e-100 + jnp.sqrt(xx * yy))
    cos_dist = jnp.where(k == 0, 0.0, cos_dist)
    y = jnp.where(xc < 0, -yp, yp).astype(jnp.int32)
    y = jnp.where((k == 0)[:, None], 0, y)
    return y, cos_dist, ok


def _fast_rate(y, k, n_eff, n, theta_path):
    """The reference's speed>0 rate model (od_pvq_rate,
    src/pvq_encoder.c:253-262) + the theta terms added by the caller."""
    lim = n_eff
    ya = jnp.abs(y).astype(jnp.float32)
    j = jnp.arange(n, dtype=jnp.float32)[None, :]
    mask = j < lim
    total = jnp.sum(jnp.where(mask, j * ya, 0.0), axis=-1)
    kf = jnp.maximum(k.astype(jnp.float32), 1.0)
    f = total / (kf * n)
    rate = (1.0 + 0.4 * f) * n * jnp.log2(
        1.0 + jnp.maximum(0.0, jnp.log(n * 2.0 * (f + 0.025)))
        * kf / n) + 3.0
    return jnp.where(k == 0, 0.0, rate)


@functools.lru_cache(maxsize=None)
def _split_tree(n):
    """DFS-preorder binary split tree of a band of length n (the
    recursion of od_encode_band_pvq_splits,
    src/laplace_encoder.c:56-80): list of (base, size, level,
    parent_index)."""
    nodes = []

    def build(base, size, level, parent):
        idx = len(nodes)
        nodes.append((base, size, level, parent))
        if size <= 1:
            return
        mid = size >> 1
        build(base, mid, level + 1, idx)
        build(base + mid, size - mid, level + 1, idx)

    build(0, n, 0, -1)
    return tuple(nodes)


def _cdf_cost_bits(row, sym, nsyms):
    """Bits to code `sym` from a CDF row (m, width) with nsyms (m,)
    active symbols: log2(cdf[nsyms-1]) - log2(cdf[sym]-cdf[sym-1])."""
    tot = jnp.take_along_axis(row, (nsyms - 1)[:, None],
                              axis=-1)[:, 0].astype(jnp.float32)
    hi = jnp.take_along_axis(row, sym[:, None],
                             axis=-1)[:, 0].astype(jnp.float32)
    lo = jnp.where(sym > 0, jnp.take_along_axis(
        row, jnp.maximum(sym - 1, 0)[:, None], axis=-1)[:, 0], 0) \
        .astype(jnp.float32)
    p = jnp.maximum(hi - lo, 1.0)
    return jnp.log2(jnp.maximum(tot, 1.0)) - jnp.log2(p)


def _codeword_rate(y, k, n_tree, n, k1_cdf, split_cdf):
    """Exact PVQ codeword rate (bits) from frame-start CDF tables:
    replays the recursive split coder of encode_band_pvq_splits
    (reference: src/laplace_encoder.c:56-80) over a static DFS tree
    with data-dependent masks.  n_tree is the coded vector length (n
    for noref, n-1 for the theta path).  Within-band CDF adaptation is
    the only approximation (the host clones the live context per band;
    rows drift by O(increment/32768) per touch)."""
    m = y.shape[0]
    ya = jnp.abs(y).astype(jnp.int32)
    lane = jnp.arange(n)[None, :]
    ya = jnp.where(lane < n_tree, ya, 0)
    nodes = _split_tree(n_tree)
    nn = len(nodes)
    # Prefix sums for O(1) per-node k.
    csum = jnp.cumsum(ya, axis=-1)
    csum = jnp.concatenate([jnp.zeros((m, 1), jnp.int32), csum], axis=-1)

    def span_sum(base, size):
        return csum[:, base + size] - csum[:, base]

    # blocked[i]: an ancestor terminated coding (k1 leaf or k == 0 or
    # the effective band boundary n_eff truncating... n_eff only zeroes
    # lanes, structure is unchanged).
    rate = jnp.zeros((m,), jnp.float32)
    blocked = [None] * nn
    for idx, (base, size, level, parent) in enumerate(nodes):
        k_node = span_sum(base, size)
        if parent < 0:
            blk = jnp.zeros((m,), jnp.bool_)
            # Top-level call context: caller guarantees n > 1, k > 0
            # (k == 0 bands pay no codeword bits).
        else:
            pb, psz, plv, _pp = nodes[parent]
            pk = span_sum(pb, psz)
            p_k1leaf = (~blocked[parent]) & (pk == 1) & (psz <= 16)
            blk = blocked[parent] | p_k1leaf | (pk == 0)
        blocked[idx] = blk
        if size <= 1:
            continue
        active = (~blk) & (k_node > 0)
        is_k1 = active & (k_node == 1) & (size <= 16)
        # k == 1 leaf: position coded from pvq_k1_cdf[k1_ctx].
        cdf_id = P.k1_ctx(size, level == 0)
        pos = jnp.argmax((ya[:, base:base + size] != 0), axis=-1) \
            .astype(jnp.int32)
        row_k1 = jnp.broadcast_to(k1_cdf[cdf_id][None, :],
                                  (m, k1_cdf.shape[1]))
        cost_k1 = _cdf_cost_bits(row_k1, pos,
                                 jnp.full((m,), size, jnp.int32))
        rate = rate + jnp.where(is_k1, cost_k1, 0.0)
        # Split node: count_right from pvq_split_cdf[fctx] + raw bits.
        is_split = active & ~is_k1
        mid = size >> 1
        count_right = span_sum(base + mid, size - mid)
        total = k_node
        shift = jnp.maximum(0, _ilog(total) - 3)
        msbs = count_right >> shift
        t_red = total >> shift
        fctx = 7 * P.size_ctx(size) + t_red - 1
        fctx = jnp.clip(fctx, 0, split_cdf.shape[0] - 1)
        row_sp = split_cdf[fctx]
        cost_sp = _cdf_cost_bits(row_sp, msbs, t_red + 1) \
            + shift.astype(jnp.float32)
        rate = rate + jnp.where(is_split, cost_sp, 0.0)
    return rate


# ---------------------------------------------------------------------------
# The per-bucket band search.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("n", "beta", "iters", "is_keyframe"))
def band_search(X, R, qm, q0, lam, n, beta, iters, k1_cdf=None,
                split_cdf=None, is_keyframe=False):
    """Batched pvq_theta for inter bands and keyframe-luma bands.

    X, R: (m, n) int32 input / reference coefficients (coding order,
    band slice).  For inter bands R is the MC prediction; for keyframe
    luma R must be all-zero (the HV intra prediction is sequentially
    dependent — the host falls back to its own search for the rare
    band with a nonzero intra reference; keyframe chroma/CfL is
    excluded entirely because its reference is the *coded* luma).
    qm: (n,) int32 QM slice.  q0: scalar int32 band quantizer.  lam:
    scalar f32 pvq_norm_lambda.  n, beta, iters, is_keyframe: static.

    is_keyframe gates the two host-side keyframe differences
    (pvq_theta, reference src/pvq_encoder.c:333-636): the skip
    distortion is the plain gain energy (skipping codes zeros, not a
    reference copy), and the theta=0 reference-gain initial candidate
    is never installed (keyframes start — and with R == 0 stay — on
    the noref path, so the skip symbol stays SKIP_ZERO, not
    SKIP_COPY).

    Returns (noref u8, qg i32, itheta i32, max_theta i32, k i32,
    y (m, n) i32, skip_diff f32, valid u8) — the host replays them via
    pvq_codec.pvq_theta(forced=...) and falls back to its own search
    where valid == 0."""
    m = X.shape[0]
    Xl = _i64(X)
    Rl = _i64(R)
    qml = _i64(qm)[None, :]
    # vector_log_mag (src/pvq.c:470-484)
    tx = (Xl >> 8)
    xs_tot = jnp.sum(tx * tx, axis=-1)
    xshift = jnp.maximum(0, 8 + 1 + _ilog(n + xs_tot) // 2 - 15)
    tr = (Rl >> 8)
    rs_tot = jnp.sum(tr * tr, axis=-1)
    rshift = jnp.maximum(0, 8 + 1 + _ilog(n + rs_tot) // 2 - 14)
    x16 = _vshr_round(Xl * qml, P.OD_QM_SHIFT + xshift[:, None])
    r16 = _vshr_round(Rl * qml, P.OD_QM_SHIFT + rshift[:, None])
    corr_i = jnp.sum(x16 * r16, axis=-1)
    cg, g = _compute_gain(x16, q0, beta, xshift)
    cgr, gr = _compute_gain(r16, q0, beta, rshift)
    icgr = _shr_round(cgr, P.OD_CGAIN_SHIFT)
    gain_offset = cgr - _shl32(icgr, P.OD_CGAIN_SHIFT)
    cgf = cg.astype(jnp.float32)
    cgrf = cgr.astype(jnp.float32)
    corr = corr_i.astype(jnp.float32) / (
        1e-100 + g.astype(jnp.float32) * gr.astype(jnp.float32)
        / _shl32(jnp.ones_like(g), xshift + rshift).astype(jnp.float32))
    corr = jnp.clip(corr, -1.0, 1.0)
    inv_cs2 = np.float32(1.0 / (_CGSCALE * _CGSCALE))
    if is_keyframe:
        # Keyframe skip codes zeros: the skip distortion is the plain
        # gain energy (pvq_theta keyframe branch).
        skip_dist = _GAIN_WEIGHT * cgf * cgf * inv_cs2
    else:
        # skip_dist (inter branch of pvq_theta).
        skip_dist = (_GAIN_WEIGHT * (cgf - cgrf) ** 2
                     + cgrf * cgf * (2.0 - 2.0 * corr)) * inv_cs2
    # Initial candidate: qg=0 noref zero-vector.
    best_dist = _GAIN_WEIGHT * cgf * cgf * inv_cs2
    best_cost = best_dist
    noref = jnp.ones((m,), jnp.uint8)
    best_qg = jnp.zeros((m,), jnp.int32)
    best_itheta = jnp.full((m,), -1, jnp.int32)
    best_ts = jnp.zeros((m,), jnp.int32)
    best_k = jnp.zeros((m,), jnp.int32)
    best_y = jnp.zeros((m, n), jnp.int32)
    if not is_keyframe:
        # Initial candidate 2 (inter): reference-gain, theta=0 (qg=0
        # coded).  For icgr != 0 the host keeps the zero-vector
        # distortion from candidate 1 as best_dist (pvq_theta only
        # overwrites it in the icgr == 0 branch).
        scgr = jnp.maximum(0.0, gain_offset.astype(jnp.float32))
        d2 = jnp.where(
            icgr == 0,
            (_GAIN_WEIGHT * (cgf - scgr) ** 2
             + scgr * cgf * (2.0 - 2.0 * corr)) * inv_cs2,
            best_dist)
        best_dist = d2
        best_cost = d2
        noref = jnp.zeros((m,), jnp.uint8)
        best_itheta = jnp.zeros((m,), jnp.int32)
    dist0 = best_dist
    valid = jnp.ones((m,), jnp.uint8)

    # ---- theta path ----
    theta_on = (jnp.any(Rl != 0, axis=-1)) & (corr > 0.0)
    # Householder reflection of r16.
    mpos = jnp.argmax(jnp.abs(r16), axis=-1)
    rm = jnp.take_along_axis(r16, mpos[:, None], axis=-1)[:, 0]
    s = jnp.where(rm > 0, 1, -1).astype(jnp.int64)
    bump = _shr_round(gr * s, rshift)
    r16_refl = r16.at[jnp.arange(m), mpos].set(_wrap16(rm + bump))
    xr_full = _apply_householder(x16, r16_refl)
    #

    # Delete index mpos: xr[j] = xr_full[j + (j >= mpos)] for j < n-1.
    jj = jnp.arange(n)[None, :]
    gidx = jj + (jj >= mpos[:, None])
    xr = jnp.take_along_axis(xr_full, jnp.minimum(gidx, n - 1), axis=-1)
    theta_f = jnp.arccos(corr)
    theta_q = jnp.floor(0.5 + P.OD_MAX_THETA_SCALE * 2.0 / np.pi
                        * theta_f).astype(jnp.int32)
    gain_bound = (cg - gain_offset) >> P.OD_CGAIN_SHIFT
    i_base = jnp.maximum(1, gain_bound - 1)
    theta_scale_1 = 1.0 / ((1 << 15) * 2.0 / np.pi)
    # xr lane n-1 is padding for the (n-1)-dim sub-search; excluded
    # from the pulse search via its lane mask.
    xr_f = xr.astype(jnp.float32)
    xr_f = xr_f.at[:, n - 1].set(0.0)
    # Candidate parameters, stacked (C = 12 theta + 2 noref) so the
    # expensive pulse search compiles ONCE inside a lax.scan instead of
    # 14 unrolled copies (compile time, not run time, dominates
    # otherwise).
    noref_on = (corr < 0.5) | (cg < _shl32(jnp.full((m,), 2),
                                           P.OD_CGAIN_SHIFT))
    if is_keyframe:
        # Keyframe luma always searches the noref branch (pvq_theta:
        # `(is_keyframe && pli == 0) || corr < 0.5 || ...`).
        noref_on = jnp.ones((m,), jnp.bool_)
    gb_nr = cg >> P.OD_CGAIN_SHIFT
    x16_f = x16.astype(jnp.float32)
    cand_i = []       # gain index (m,) per candidate
    cand_j = []       # theta index (−1 for noref)
    cand_ok_l = []
    cand_k = []
    cand_ts = []
    cand_g2 = []
    cand_dist_c = []  # gain term of the distortion
    cand_sinp = []
    cand_qth = []
    cand_isnr = []
    for ci in range(3):
        i_cand = (i_base + ci).astype(jnp.int32)
        gain_ok = i_cand <= gain_bound + 1
        qcg = _shl32(i_cand, P.OD_CGAIN_SHIFT) + gain_offset
        ts = _compute_max_theta(qcg, beta)
        tpos = (theta_q.astype(jnp.float32) * theta_scale_1 * 2.0
                / np.pi * ts.astype(jnp.float32))
        t_lower = jnp.maximum(0, jnp.floor(0.5 + tpos).astype(jnp.int32)
                              - 2)
        t_upper = jnp.minimum(ts - 1, jnp.ceil(tpos).astype(jnp.int32))
        for tj in range(4):
            j_cand = t_lower + tj
            ok_c = (theta_on & gain_ok & (j_cand <= t_upper)
                    & (j_cand >= 0))
            qtheta = _compute_theta(j_cand, ts).astype(jnp.int32)
            k = _compute_k(qcg, j_cand, False, n, beta)
            qcgf = qcg.astype(jnp.float32)
            dist_th = 2.0 - 2.0 * _pvq_cos(theta_q - qtheta) \
                .astype(jnp.float32) / P.OD_TRIG_SCALE
            dist_pre = (_GAIN_WEIGHT * (qcgf - cgf) ** 2
                        + qcgf * cgf * dist_th) * inv_cs2
            ok_c = ok_c & ~((dist_pre > dist0 + lam) & (k != 0))
            sin_prod = (_pvq_sin(theta_q).astype(jnp.float32)
                        / P.OD_TRIG_SCALE) \
                * (_pvq_sin(qtheta).astype(jnp.float32)
                   / P.OD_TRIG_SCALE)
            cand_i.append(i_cand)
            cand_j.append(j_cand)
            cand_ok_l.append(ok_c)
            cand_k.append(k)
            cand_ts.append(ts)
            cand_g2.append(qcgf * cgf * sin_prod * inv_cs2)
            cand_dist_c.append(_GAIN_WEIGHT * (qcgf - cgf) ** 2
                               * inv_cs2)
            cand_sinp.append(sin_prod)
            cand_qth.append(qtheta)
            cand_isnr.append(jnp.zeros((m,), jnp.bool_))
    for ci in range(2):
        i_cand = (jnp.maximum(1, gb_nr) + ci).astype(jnp.int32)
        gain_ok = i_cand <= gb_nr + 1
        qcg = _shl32(i_cand, P.OD_CGAIN_SHIFT)
        k = _compute_k(qcg, -1, True, n, beta)
        qcgf = qcg.astype(jnp.float32)
        dist_pre = _GAIN_WEIGHT * (qcgf - cgf) ** 2 * inv_cs2
        ok_c = noref_on & gain_ok & ~((dist_pre > dist0) & (k != 0))
        cand_i.append(i_cand)
        cand_j.append(jnp.full((m,), -1, jnp.int32))
        cand_ok_l.append(ok_c)
        cand_k.append(k)
        cand_ts.append(jnp.zeros((m,), jnp.int32))
        cand_g2.append(qcgf * cgf * inv_cs2)
        cand_dist_c.append(dist_pre)
        cand_sinp.append(jnp.zeros((m,), jnp.float32))
        cand_qth.append(jnp.zeros((m,), jnp.int32))
        cand_isnr.append(jnp.ones((m,), jnp.bool_))

    stack = lambda xs: jnp.stack(xs)  # (C, m)
    theta_rate_base = 0.9 * jnp.log2(jnp.maximum(
        stack(cand_ts).astype(jnp.float32), 1.0)) \
        - 0.5 * (stack(cand_i) == icgr[None, :])
    cands = dict(
        i=stack(cand_i), j=stack(cand_j), ok=stack(cand_ok_l),
        k=stack(cand_k), ts=stack(cand_ts), g2=stack(cand_g2),
        dist_c=stack(cand_dist_c), sinp=stack(cand_sinp),
        qth=stack(cand_qth), isnr=stack(cand_isnr),
        trate=theta_rate_base)

    dist_th_c = (2.0 - 2.0 * _pvq_cos(
        theta_q[None, :] - stack(cand_qth)).astype(jnp.float32)
        / P.OD_TRIG_SCALE)
    cands["dth"] = dist_th_c
    qcg_f = []
    for ci in range(len(cand_i)):
        isnr = cand_isnr[ci]
        qcg_c = jnp.where(
            isnr, _shl32(cand_i[ci], P.OD_CGAIN_SHIFT),
            _shl32(cand_i[ci], P.OD_CGAIN_SHIFT) + gain_offset)
        qcg_f.append(qcg_c.astype(jnp.float32))
    cands["qcgf"] = stack(qcg_f)

    init = (best_cost, best_dist, best_qg, best_itheta, best_ts,
            best_k, noref, best_y, valid)

    lane_idx = jnp.arange(n)[None, :]

    def scan_body(carry, c):
        (b_cost, b_dist, b_qg, b_it, b_ts, b_k, b_nr, b_y, vld) = carry
        xvec = jnp.where(c["isnr"][:, None], x16_f, xr_f)
        lane_ok = c["isnr"][:, None] | (lane_idx < n - 1)
        kk = jnp.where(c["ok"], c["k"], 0)
        y_c, cos_dist, ok_p = _pulse_search(xvec, kk, c["g2"], lam, n,
                                            iters, lane_ok=lane_ok)
        vld = jnp.where(c["ok"] & ~ok_p, 0, vld).astype(jnp.uint8)
        qcgf = c["qcgf"]
        dist_theta = (c["dth"]
                      + c["sinp"] * (2.0 - 2.0 * cos_dist))
        dist_t = (_GAIN_WEIGHT * (qcgf - cgf) ** 2
                  + qcgf * cgf * dist_theta) * inv_cs2
        dist_n = (_GAIN_WEIGHT * (qcgf - cgf) ** 2
                  + qcgf * cgf * (2.0 - 2.0 * cos_dist)) * inv_cs2
        dist = jnp.where(c["isnr"], dist_n, dist_t)
        if k1_cdf is not None:
            # Exact codeword rate from frame-start CDF tables: the
            # fast model misprices small-k corrections by several
            # bits, which systematically flips near-ties toward
            # skip-copy and compounds across inter frames.
            rate_nr = _codeword_rate(y_c, c["k"], n, n, k1_cdf,
                                     split_cdf)
            rate_th = _codeword_rate(y_c, c["k"], n - 1, n, k1_cdf,
                                     split_cdf)
            rate = jnp.where(c["isnr"], rate_nr, rate_th)
        else:
            n_eff = jnp.where(c["isnr"], n, n - 1)
            rate = _fast_rate(y_c, c["k"], n_eff[:, None], n, None)
        rate = rate + jnp.where(c["isnr"], 0.0, c["trate"])
        cost = dist + lam * rate
        better = c["ok"] & jnp.where(c["isnr"], cost <= b_cost,
                                     cost < b_cost)
        b_cost = jnp.where(better, cost, b_cost)
        b_dist = jnp.where(better, dist, b_dist)
        b_qg = jnp.where(better, c["i"], b_qg)
        b_k = jnp.where(better, c["k"], b_k)
        b_it = jnp.where(better, c["j"], b_it)
        b_ts = jnp.where(better, c["ts"], b_ts)
        b_nr = jnp.where(better, c["isnr"], b_nr).astype(jnp.uint8)
        b_y = jnp.where(better[:, None], y_c, b_y)
        return (b_cost, b_dist, b_qg, b_it, b_ts, b_k, b_nr, b_y,
                vld), None

    carry, _ = jax.lax.scan(scan_body, init, cands)
    (best_cost, best_dist, best_qg, best_itheta, best_ts, best_k,
     noref, best_y, valid) = carry

    skip_diff = skip_dist - best_dist
    return (noref, best_qg, best_itheta, best_ts, best_k, best_y,
            skip_diff, valid)


# ---------------------------------------------------------------------------
# Frame-level driver: bucket the luma bands of an inter frame, search
# on device, emit a decision table for the host entropy pass.
# ---------------------------------------------------------------------------


def search_frame(st, info, quantizer, d_planes, md_planes, lam,
                 is_keyframe=False, use_masking=True,
                 device_put_fn=None):
    """Device PVQ search for a whole frame's bands.

    st: codec state (bsize4 map, qm tables, pvq_qm_q4); d_planes /
    md_planes: per-plane whole-frame frequency-domain input / reference
    coefficients (the device analysis outputs, plane_h x plane_w
    int32).  For inter frames every plane searches against its MC
    prediction; for keyframes only luma is searched (against a zero
    reference — the HV intra prediction is sequentially dependent, so
    the host falls back to its own search for the rare band with a
    nonzero intra reference; chroma/CfL keyframe bands reference the
    *coded* luma and stay on the host, reference
    src/pvq_encoder.c:858-875).

    Returns {(pli, by4, bx4, band): (noref, qg, itheta, max_theta, k,
    y int32[n], skip_diff, valid)} keyed by the block's plane 4x4-grid
    coordinates, matching the keys _block_encode derives."""
    from daala_tpu.ops import partition as part

    cw = st.adapt.pvq.pvq_codeword_ctx
    put = device_put_fn if device_put_fn is not None else (lambda a: a)
    out = {}
    # Two-phase schedule: issue every band_search dispatch first (jax
    # dispatch is async, so the device/tunnel round trips pipeline
    # instead of serializing one blocking fetch per band), then fetch
    # all results.
    pending = []  # (pli, blocks, band, mreal, device results tuple)
    nplanes = 1 if is_keyframe else len(d_planes)
    for pli in range(nplanes):
        xdec, ydec = info.plane_dec[pli]
        d_plane = d_planes[pli]
        md_plane = None if is_keyframe else md_planes[pli]
        n4v = (st.frame_height >> ydec) >> 2
        n4h = (st.frame_width >> xdec) >> 2
        by_blocks = {}  # plane bs -> list of plane-grid (by4, bx4)
        for by4 in range(n4v):
            for bx4 in range(n4h):
                # Plane leaf size: the luma block-size recursion
                # clamped at the plane decimation (decode_recursive's
                # `bs = max(obs, xdec) - xdec`).
                bs = max(st.bsize4(bx4 << xdec, by4 << ydec),
                         xdec) - xdec
                if (by4 & ((1 << bs) - 1)) or (bx4 & ((1 << bs) - 1)):
                    continue
                by_blocks.setdefault(bs, []).append((by4, bx4))
        for bs, blocks in sorted(by_blocks.items()):
            n = 4 << bs
            offs = part.band_offsets(n)
            nb_bands = len(offs) - 1
            slen = part.scan_length(n)
            off_qm = P.qm_offset(bs, xdec)
            qm_slice = np.asarray(st.qm[off_qm:off_qm + slen], np.int64)
            tiles_d = np.stack([
                d_plane[by4 * 4:by4 * 4 + n, bx4 * 4:bx4 * 4 + n]
                for by4, bx4 in blocks])
            coded_d = part.raster_to_coding(tiles_d.astype(np.int32))
            if is_keyframe:
                coded_md = np.zeros_like(coded_d)
            else:
                tiles_md = np.stack([
                    md_plane[by4 * 4:by4 * 4 + n, bx4 * 4:bx4 * 4 + n]
                    for by4, bx4 in blocks])
                coded_md = part.raster_to_coding(
                    tiles_md.astype(np.int32))
            beta = (P.BETA_1_5
                    if use_masking and pli == 0 and bs > 0 else P.BETA_1)
            for band in range(nb_bands):
                o0, o1 = int(offs[band]), int(offs[band + 1])
                nn = o1 - o0
                q_band = max(1, max(1, quantizer)
                             * int(st.pvq_qm_q4[pli][P.qm_get_index(
                                 bs, band + 1)]) >> 4)
                X = np.ascontiguousarray(coded_d[:, o0:o1], np.int32)
                R = np.ascontiguousarray(coded_md[:, o0:o1], np.int32)
                # Pad the band count to a power-of-FOUR size class so
                # the jit cache holds a handful of shapes instead of
                # one per frame; padded rows are all-zero (k = 0,
                # ignored).  Compiles cost ~25-40 s each on a 1-core
                # host, so fewer classes beats less padded compute.
                mreal = X.shape[0]
                mpad = 64
                while mpad < mreal:
                    mpad <<= 2
                if mpad != mreal:
                    X = np.pad(X, ((0, mpad - mreal), (0, 0)))
                    R = np.pad(R, ((0, mpad - mreal), (0, 0)))
                # The fixed-point gain math needs 64-bit integer
                # intermediates (sums of int16 squares); enable x64 for
                # this trace only.
                with jax.enable_x64(True):
                    res = band_search(
                        put(jnp.asarray(X)), put(jnp.asarray(R)),
                        jnp.asarray(qm_slice[o0:o1], jnp.int32),
                        jnp.int32(q_band), jnp.float32(lam),
                        nn, int(beta), int(nn + 64),
                        k1_cdf=jnp.asarray(cw.pvq_k1_cdf, jnp.int32),
                        split_cdf=jnp.asarray(cw.pvq_split_cdf,
                                              jnp.int32),
                        is_keyframe=bool(is_keyframe))
                pending.append((pli, blocks, band, mreal, res))
    for pli, blocks, band, mreal, res in pending:
        noref, qg, itheta, ts, k, y, skip_diff, valid = \
            [np.asarray(r)[:mreal] for r in res]
        for i, (by4, bx4) in enumerate(blocks):
            out[(pli, by4, bx4, band)] = (
                int(noref[i]), int(qg[i]), int(itheta[i]),
                int(ts[i]), int(k[i]), y[i],
                float(skip_diff[i]), bool(valid[i]))
    return out


def search_inter_luma(st, quantizer, d_plane, md_plane, lam,
                      use_masking=True, device_put_fn=None):
    """Back-compat wrapper: luma-only inter search (see search_frame)."""
    class _Mono:
        plane_dec = ((0, 0),)
    return search_frame(st, _Mono, quantizer, [d_plane], [md_plane],
                        lam, is_keyframe=False, use_masking=use_masking,
                        device_put_fn=device_put_fn)
