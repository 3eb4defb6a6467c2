"""Differential fuzzing: native (C++) range coder vs the pure-Python
reference implementation.  Byte-identical output and identical decode
results are required (the Python coder itself is byte-exact vs the
upstream C, see test_ec.py)."""

import random

import pytest

from daala_tpu.entropy import ec


pytestmark = pytest.mark.skipif(
    ec.Encoder is ec.PyEncoder, reason="native EC engine unavailable")


def _random_cdf(rng, n, ft):
    vals = sorted(rng.sample(range(1, ft), n - 1)) + [ft]
    out = []
    prev = 0
    for v in vals:
        if v <= prev:
            v = prev + 1
        out.append(v)
        prev = v
    return out


def _fuzz_ops(seed, nops):
    rng = random.Random(seed)
    ops = []
    for _ in range(nops):
        kind = rng.choice(["q15", "bool", "uint", "bits", "unscaled",
                           "cdf_q15", "checkpoint"])
        if kind == "q15":
            fl = rng.randrange(0, 32767)
            ops.append(("q15", fl, rng.randrange(fl + 1, 32769)))
        elif kind == "bool":
            ops.append(("bool", rng.randrange(2), rng.randrange(1, 32768)))
        elif kind == "uint":
            ft = rng.randrange(2, 1 << 20)
            ops.append(("uint", rng.randrange(ft), ft))
        elif kind == "bits":
            ftb = rng.randrange(0, 26)
            ops.append(("bits", rng.randrange(1 << ftb) if ftb else 0,
                        ftb))
        elif kind == "unscaled":
            ft = rng.randrange(8, 32768)
            n = rng.randrange(2, 16)
            cdf = _random_cdf(rng, n, ft)
            ops.append(("unscaled", rng.randrange(len(cdf)), cdf))
        elif kind == "cdf_q15":
            n = rng.randrange(2, 16)
            cdf = _random_cdf(rng, n, 32768)
            ops.append(("cdf_q15", rng.randrange(len(cdf)), cdf))
        else:
            ops.append(("checkpoint", rng.randrange(1, 5), None))
    return ops


def _apply(enc, op, cps):
    kind, a, b = op
    if kind == "q15":
        enc.encode_q15(a, b)
    elif kind == "bool":
        enc.encode_bool_q15(a, b)
    elif kind == "uint":
        enc.encode_uint(a, b)
    elif kind == "bits":
        enc.encode_bits(a, b)
    elif kind == "unscaled":
        enc.encode_cdf_unscaled(a, b)
    elif kind == "cdf_q15":
        enc.encode_cdf_q15(a, b)
    else:
        # The block-size-RDO pattern: checkpoint, code trial A, checkpoint,
        # roll back, code trial B, then roll FORWARD to post-A (leaves
        # stale bytes but exact rate, reference: src/encode.c:1808-1812).
        cp_pre = enc.checkpoint()
        for i in range(a):
            enc.encode_bool_q15(i & 1, 9000 + 700 * i)
        cp_post = enc.checkpoint()
        enc.rollback(cp_pre)
        for i in range(a + 2):
            enc.encode_bool_q15(1 - (i & 1), 4000 + 900 * i)
        enc.rollback(cp_post)
        # From here the stream contents are engine-defined but the rate
        # accounting must match; callers always roll back to a true
        # ancestor before emitting real output, so mirror that:
        enc.rollback(cp_pre)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_encoder_differential(seed):
    ops = _fuzz_ops(seed, 3000)
    e_py = ec.PyEncoder()
    e_nat = ec.Encoder()
    for i, op in enumerate(ops):
        _apply(e_py, op, None)
        _apply(e_nat, op, None)
        assert e_py.tell() == e_nat.tell(), (i, op)
        assert e_py.tell_frac() == e_nat.tell_frac(), (i, op)
    assert e_py.done() == e_nat.done()


@pytest.mark.parametrize("seed", [10, 11])
def test_decoder_differential(seed):
    ops = [op for op in _fuzz_ops(seed, 2000)
           if op[0] not in ("checkpoint", "q15")]
    enc = ec.PyEncoder()
    for op in ops:
        _apply(enc, op, None)
    data = enc.done()
    d_py = ec.PyDecoder(data)
    d_nat = ec.Decoder(data)
    for i, (kind, a, b) in enumerate(ops):
        if kind == "bool":
            r1 = d_py.decode_bool_q15(b)
            r2 = d_nat.decode_bool_q15(b)
        elif kind == "uint":
            r1 = d_py.decode_uint(b)
            r2 = d_nat.decode_uint(b)
        elif kind == "bits":
            r1 = d_py.decode_bits(b)
            r2 = d_nat.decode_bits(b)
        elif kind == "unscaled":
            r1 = d_py.decode_cdf_unscaled(b)
            r2 = d_nat.decode_cdf_unscaled(b)
        else:
            r1 = d_py.decode_cdf_q15(b)
            r2 = d_nat.decode_cdf_q15(b)
        assert r1 == r2, (i, kind)
        assert d_py.tell() == d_nat.tell(), (i, kind)
        assert d_py.tell_frac() == d_nat.tell_frac(), (i, kind)


def test_roundtrip_through_native():
    """Symbols encoded native must decode to the same values in both
    decoders."""
    rng = random.Random(99)
    syms = []
    enc = ec.Encoder()
    for _ in range(4000):
        n = rng.randrange(2, 16)
        cdf = _random_cdf(rng, n, 32768)
        s = rng.randrange(n)
        syms.append((s, cdf))
        enc.encode_cdf_q15(s, cdf)
    data = enc.done()
    for dec in (ec.PyDecoder(data), ec.Decoder(data)):
        for s, cdf in syms:
            assert dec.decode_cdf_q15(cdf) == s
