"""Range coder torture tests, mirroring the reference's ectest
(reference: src/tests/ectest.c) plus byte-exact fuzzing against the
reference C coder."""

import random

import numpy as np
import pytest

from daala_tpu.entropy import ec
from daala_tpu.entropy import models

try:
    import ec_oracle
    ec_oracle.get_lib()
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False


def test_uint_roundtrip_exhaustive_small():
    """Every (ft, fl) for ft in [2, 256): encode then decode, matching
    ectest's main loop (reference: src/tests/ectest.c:26-60)."""
    enc = ec.Encoder()
    vals = []
    for ft in range(2, 256):
        for fl in range(0, ft, max(1, ft // 7)):
            enc.encode_uint(fl, ft)
            vals.append((fl, ft))
    buf = enc.done()
    dec = ec.Decoder(buf)
    for fl, ft in vals:
        assert dec.decode_uint(ft) == fl


def test_bits_roundtrip():
    rng = random.Random(42)
    enc = ec.Encoder()
    vals = []
    for _ in range(2000):
        nb = rng.randrange(0, 25)
        v = rng.randrange(0, 1 << nb) if nb else 0
        enc.encode_bits(v, nb)
        vals.append((v, nb))
    buf = enc.done()
    dec = ec.Decoder(buf)
    for v, nb in vals:
        assert dec.decode_bits(nb) == v


def test_bool_cdf_mixed_roundtrip():
    rng = random.Random(7)
    enc = ec.Encoder()
    script = []
    for _ in range(5000):
        kind = rng.randrange(4)
        if kind == 0:
            fz = rng.randrange(1, 32768)
            v = rng.randrange(2)
            enc.encode_bool_q15(v, fz)
            script.append(("bool", fz, v))
        elif kind == 1:
            n = rng.randrange(2, 17)
            cdf = ec.uniform_cdf_q15(n)
            v = rng.randrange(n)
            enc.encode_cdf_q15(v, cdf)
            script.append(("cdf", tuple(cdf), v))
        elif kind == 2:
            n = rng.randrange(2, 17)
            # Random unscaled CDF with ft <= 32768.
            pdf = [rng.randrange(1, 100) for _ in range(n)]
            cdf = np.cumsum(pdf).tolist()
            v = rng.randrange(n)
            enc.encode_cdf_unscaled(v, cdf)
            script.append(("cdfu", tuple(cdf), v))
        else:
            ft = rng.randrange(2, 1 << 20)
            v = rng.randrange(ft)
            enc.encode_uint(v, ft)
            script.append(("uint", ft, v))
    buf = enc.done()
    dec = ec.Decoder(buf)
    for item in script:
        if item[0] == "bool":
            assert dec.decode_bool_q15(item[1]) == item[2]
        elif item[0] == "cdf":
            assert dec.decode_cdf_q15(list(item[1])) == item[2]
        elif item[0] == "cdfu":
            assert dec.decode_cdf_unscaled(list(item[1])) == item[2]
        else:
            assert dec.decode_uint(item[1]) == item[2]


def test_tell_monotonic():
    rng = random.Random(3)
    enc = ec.Encoder()
    last = enc.tell_frac()
    assert enc.tell() == 1
    for _ in range(1000):
        enc.encode_bool_q15(rng.randrange(2), rng.randrange(1, 32768))
        t = enc.tell_frac()
        assert t >= last
        last = t


def test_checkpoint_rollback():
    enc = ec.Encoder()
    for i in range(100):
        enc.encode_bool_q15(i & 1, 20000)
    cp = enc.checkpoint()
    bytes_a = None
    for trial in range(3):
        enc.rollback(cp)
        for i in range(50):
            enc.encode_uint(i, 77)
        b = ec.Encoder.done(enc)
        if bytes_a is None:
            bytes_a = b
        else:
            assert b == bytes_a


def _random_script(seed, nops=3000):
    rng = random.Random(seed)
    script = []
    for _ in range(nops):
        kind = rng.randrange(5)
        if kind == 0:
            script.append(("bool", rng.randrange(1, 32768), rng.randrange(2)))
        elif kind == 1:
            n = rng.randrange(2, 17)
            script.append(("cdf", tuple(ec.uniform_cdf_q15(n)),
                           rng.randrange(n)))
        elif kind == 2:
            n = rng.randrange(2, 17)
            pdf = [rng.randrange(1, 2000) for _ in range(n)]
            cdf = np.minimum(np.cumsum(pdf), 32768).tolist()
            script.append(("cdfu", tuple(cdf), rng.randrange(n)))
        elif kind == 3:
            ft = rng.randrange(2, 1 << 24)
            script.append(("uint", ft, rng.randrange(ft)))
        else:
            nb = rng.randrange(0, 26)
            script.append(("bits", nb, rng.randrange(1 << nb) if nb else 0))
    return script


def _run_encode(enc, script):
    for item in script:
        if item[0] == "bool":
            enc.encode_bool_q15(item[2], item[1])
        elif item[0] == "cdf":
            enc.encode_cdf_q15(item[2], list(item[1]))
        elif item[0] == "cdfu":
            enc.encode_cdf_unscaled(item[2], list(item[1]))
        elif item[0] == "uint":
            enc.encode_uint(item[2], item[1])
        else:
            enc.encode_bits(item[2], item[1])


def _run_decode(dec, script):
    out = []
    for item in script:
        if item[0] == "bool":
            out.append(dec.decode_bool_q15(item[1]))
        elif item[0] == "cdf":
            out.append(dec.decode_cdf_q15(list(item[1])))
        elif item[0] == "cdfu":
            out.append(dec.decode_cdf_unscaled(list(item[1])))
        elif item[0] == "uint":
            out.append(dec.decode_uint(item[1]))
        else:
            out.append(dec.decode_bits(item[1]))
    return out


@pytest.mark.skipif(not HAVE_ORACLE, reason="reference EC oracle unavailable")
@pytest.mark.parametrize("seed", range(8))
def test_bytes_match_reference(seed):
    """Same symbol script through our encoder and the reference's must
    produce byte-identical output; both decoders must agree."""
    script = _random_script(seed)
    ours = ec.Encoder()
    ref = ec_oracle.RefEncoder()
    _run_encode(ours, script)
    _run_encode(ref, script)
    assert ours.tell() == ref.tell()
    assert ours.tell_frac() == ref.tell_frac()
    buf_ours = ours.done()
    buf_ref = ref.done()
    assert buf_ours == buf_ref
    want = [i[2] for i in script]
    assert _run_decode(ec.Decoder(buf_ref), script) == want
    assert _run_decode(ec_oracle.RefDecoder(buf_ours), script) == want


@pytest.mark.skipif(not HAVE_ORACLE, reason="reference EC oracle unavailable")
def test_patch_initial_bits_matches_reference():
    script = _random_script(99, nops=200)
    ours = ec.Encoder()
    ref = ec_oracle.RefEncoder()
    # Lead with raw power-of-two symbols so patching is legal.
    for e in (ours, ref):
        e.encode_bool_q15(0, 16384)
        e.encode_bool_q15(1, 16384)
        e.encode_bool_q15(1, 16384)
        e.encode_bool_q15(0, 16384)
    _run_encode(ours, script)
    _run_encode(ref, script)
    ours.patch_initial_bits(0b101, 3)
    ref.patch_initial_bits(0b101, 3)
    assert ours.done() == ref.done()


def test_adaptive_cdf_roundtrip():
    rng = random.Random(5)
    init = models.cdf_init(8, 128)
    enc_model = models.AdaptiveCDFQ15(init, rate=5)
    enc = ec.Encoder()
    vals = [rng.randrange(8) for _ in range(500)]
    for v in vals:
        enc_model.encode(enc, v)
    buf = enc.done()
    dec_model = models.AdaptiveCDFQ15(models.cdf_init(8, 128), rate=5)
    dec = ec.Decoder(buf)
    got = [dec_model.decode(dec) for _ in vals]
    assert got == vals
    assert dec_model.cdf == enc_model.cdf


def test_adaptive_increment_roundtrip():
    rng = random.Random(6)
    init = models.cdf_init(16, 64)
    m_enc = models.AdaptiveCDFIncrement(init, increment=128)
    enc = ec.Encoder()
    vals = [rng.randrange(16) for _ in range(500)]
    for v in vals:
        m_enc.encode(enc, v)
    buf = enc.done()
    m_dec = models.AdaptiveCDFIncrement(models.cdf_init(16, 64),
                                        increment=128)
    dec = ec.Decoder(buf)
    got = [m_dec.decode(dec) for _ in vals]
    assert got == vals


def test_generic_model_roundtrip():
    rng = random.Random(11)
    me = models.GenericModel()
    enc = ec.Encoder()
    ex = 65536
    vals = []
    for _ in range(800):
        x = min(int(rng.expovariate(0.01)), 100000)
        vals.append(x)
        ex = me.encode(enc, x, -1, ex, 2)
    buf = enc.done()
    md = models.GenericModel()
    dec = ec.Decoder(buf)
    ex = 65536
    got = []
    for _ in vals:
        x, ex = md.decode(dec, -1, ex, 2)
        got.append(x)
    assert got == vals


def test_laplace_roundtrip():
    rng = random.Random(13)
    enc = ec.Encoder()
    cases = []
    for _ in range(500):
        ex = rng.randrange(1, 1 << 16)
        k = rng.randrange(0, 512)
        x = rng.randrange(0, k + 1)
        cases.append((x, ex, k))
        models.laplace_encode(enc, x, ex, k)
    buf = enc.done()
    dec = ec.Decoder(buf)
    for x, ex, k in cases:
        assert models.laplace_decode(dec, ex, k) == x


def test_laplace_special_roundtrip():
    rng = random.Random(17)
    enc = ec.Encoder()
    cases = []
    for _ in range(500):
        decay = rng.randrange(2, 255)
        mx = rng.choice([-1, rng.randrange(1, 2000)])
        x = rng.randrange(0, 2000 if mx == -1 else mx + 1)
        cases.append((x, decay, mx))
        models.laplace_encode_special(enc, x, decay, mx)
    buf = enc.done()
    dec = ec.Decoder(buf)
    for x, decay, mx in cases:
        assert models.laplace_decode_special(dec, decay, mx) == x
