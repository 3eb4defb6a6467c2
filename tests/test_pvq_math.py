"""Bit-exactness tests for the PVQ math core against the reference C."""

import numpy as np
import pytest

from daala_tpu.ops import pvq
from daala_tpu.ops import _tables as T

try:
    import pvq_oracle
    pvq_oracle.get_lib()
    HAVE = True
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="pvq oracle unavailable")

BETAS = [pvq.BETA_1, pvq.BETA_1_5, pvq.beta_q12(1.25)]


def test_trig():
    for x in list(range(0, 1 << 17, 97)) + [0, 1 << 15, 1 << 16, (1 << 17) - 1]:
        assert pvq.pvq_cos(x) == pvq_oracle.pvq_cos(x), x
        assert pvq.pvq_sin(x & 0xFFFF) == pvq_oracle.pvq_sin(x & 0xFFFF), x


def test_gain_expand():
    rng = np.random.default_rng(1)
    for beta in BETAS:
        for _ in range(500):
            cg = int(rng.integers(0, 1 << 14))
            q0 = int(rng.integers(1, 8192))
            assert pvq.gain_expand(cg, q0, beta) == \
                pvq_oracle.gain_expand(cg, q0, beta), (cg, q0, beta)


def test_compute_gain():
    rng = np.random.default_rng(2)
    for beta in BETAS:
        for n in (8, 15, 16, 31, 128):
            # Keep sum(x^2) < 2^30 (the reference accumulates in int32 and
            # od_sqrt requires x < 1<<30; reference: src/pvq.c:748).
            scale = min(8192, int((2 ** 29 / n) ** 0.5))
            for _ in range(50):
                x = rng.integers(-scale, scale, n).astype(np.int16)
                q0 = int(rng.integers(1, 8192))
                bshift = 0
                got = pvq.compute_gain(x, q0, beta, bshift)
                want = pvq_oracle.compute_gain(x, q0, beta, bshift)
                assert got == want, (n, q0, beta)


def test_max_theta_and_theta():
    rng = np.random.default_rng(3)
    for beta in BETAS:
        for _ in range(500):
            qcg = int(rng.integers(0, 1 << 14))
            mt_ref = pvq_oracle.compute_max_theta(qcg, beta)
            assert pvq.compute_max_theta(qcg, beta) == mt_ref
            if mt_ref > 0:
                t = int(rng.integers(0, mt_ref + 2))
                assert pvq.compute_theta(t, mt_ref) == \
                    pvq_oracle.compute_theta(t, mt_ref)


def test_compute_k():
    rng = np.random.default_rng(4)
    for beta in BETAS:
        for n in (7, 8, 15, 16, 31, 32, 63, 128):
            for _ in range(60):
                qcg = int(rng.integers(0, 1 << 12))
                itheta = int(rng.integers(0, 32))
                for noref in (0, 1):
                    got = pvq.compute_k(qcg, itheta, bool(noref), n, beta)
                    want = pvq_oracle.compute_k(qcg, itheta, 0, noref, n,
                                                beta, 1)
                    assert got == want, (qcg, itheta, noref, n, beta)


def test_householder():
    rng = np.random.default_rng(5)
    for n in (4, 8, 15, 16, 31, 128):
        # Real vectors here are norm-bounded to ~2^14 ("x[]*scale has a norm
        # that fits in 16 bits", reference: src/pvq.c:1074); keep sum r^2 and
        # the projection within int32.
        scale = min(8192, int((2 ** 27 / n) ** 0.5))
        for _ in range(40):
            r = rng.integers(-scale, scale, n).astype(np.int16)
            gr = int(rng.integers(0, 1 << 14))
            r_ref, m_ref, s_ref = pvq_oracle.compute_householder(
                r.copy(), gr, 2)
            r_ours = r.astype(np.int64)
            m, s = pvq.compute_householder(r_ours, gr, 2)
            assert (m, s) == (m_ref, s_ref)
            np.testing.assert_array_equal(
                r_ours.astype(np.int16), r_ref)
            # apply_householder on a random x
            x = rng.integers(-scale, scale, n).astype(np.int16)
            want = pvq_oracle.apply_householder(x, r_ref)
            got = pvq.apply_householder(x.astype(np.int64),
                                        r_ours).astype(np.int16)
            np.testing.assert_array_equal(got, want)


def test_synthesis_partial():
    rng = np.random.default_rng(6)
    for n in (8, 15, 16, 32):
        for noref in (True, False):
            for _ in range(40):
                nn = n if noref else n - 1
                k = int(rng.integers(1, 12))
                y = np.zeros(nn, np.int32)
                pos = rng.integers(0, nn, k)
                for p in pos:
                    y[p] += rng.choice([-1, 1])
                r16 = rng.integers(-8192, 8192, n).astype(np.int16)
                g = int(rng.integers(1, 1 << 16))
                theta = int(rng.integers(0, 1 << 15))
                m = int(rng.integers(0, nn))
                s = int(rng.choice([-1, 1]))
                qm_inv = rng.integers(1024, 8192, n).astype(np.int16)
                want = pvq_oracle.synthesis_partial(
                    y, r16, n, noref, g, theta, m, s, qm_inv)
                got = pvq.synthesis_partial(
                    y, r16.astype(np.int64), n, noref, g, theta, m, s,
                    qm_inv)
                np.testing.assert_array_equal(got, want,
                                              err_msg=str((n, noref)))


def test_ctx_helpers():
    for n in (2, 3, 4, 7, 8, 14, 15, 16, 31, 32, 63, 64, 127, 128):
        assert pvq.size_ctx(n) == pvq_oracle.get_lib().od_pvq_size_ctx(n)
        for orig in (0, 1):
            if orig and n > 16:
                continue
            assert pvq.k1_ctx(n, bool(orig)) == \
                pvq_oracle.get_lib().od_pvq_k1_ctx(n, orig)
    for bs in range(5):
        nb = [1, 4, 7, 10, 13][bs]
        for band in range(nb):
            assert pvq.qm_get_index(bs, band) == \
                pvq_oracle.get_lib().od_qm_get_index(bs, band)
        for xydec in (0, 1):
            assert pvq.qm_offset(bs, xydec) == \
                pvq_oracle.get_lib().od_qm_offset(bs, xydec)


def test_init_qm():
    for qm in (T.QM8_Q4_FLAT, T.QM8_Q4_HVS):
        want_x, want_inv = pvq_oracle.init_qm(qm)
        got_x, got_inv = pvq.init_qm(qm)
        np.testing.assert_array_equal(got_x, want_x)
        np.testing.assert_array_equal(got_inv, want_inv)
