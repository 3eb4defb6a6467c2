"""Tests for the training / table-generation subsystem
(daala_tpu.train): the shipped normative tables must be regenerable
from first principles, and the searches must validate the shipped
constants."""

import numpy as np
import pytest

from daala_tpu.ops import _tables as T


def test_gen_laplace_tables_bit_exact():
    # Reference: tools/gen_laplace_tables.c run as
    # "gen_laplace_tables 128 7" produced src/laplace_tables.c.
    from daala_tpu.train.laplace import gen_laplace_tables
    cdfs, offs = gen_laplace_tables(128, 7)
    assert np.array_equal(cdfs, T.EXP_CDF_TABLE)
    assert np.array_equal(offs, T.LAPLACE_OFFSET)


def test_gen_cdf_is_sane():
    # The gen_cdf tool's output tables are not shipped in the codec
    # (dead data in the reference too); check invariants only.
    from daala_tpu.train.laplace import gen_cdf
    cdfs, decay = gen_cdf(32, 7)
    assert cdfs.shape == (33, 16)
    assert (cdfs[:, -1] == 32768).all()
    assert (np.diff(cdfs, axis=1) >= 1).all()
    assert (decay[1:] >= decay[:-1] - 1).all()


def test_basis_magnitudes_match_shipped():
    # Reference: tools/compute_basis.c "mag" mode generated the
    # OD_BASIS_MAG tables in src/pvq.c.  4..32 match the shipped
    # tables to float-print precision; the shipped 64-point table is
    # stale in the reference (its own tool, rebuilt today, prints our
    # values), so 64 is checked against the live-tool tolerance.
    from daala_tpu.train.basis import basis_magnitudes
    for n, tab in [(4, T.BASIS_MAG4), (8, T.BASIS_MAG8),
                   (16, T.BASIS_MAG16), (32, T.BASIS_MAG32)]:
        assert np.allclose(basis_magnitudes(n), tab, atol=1e-6), n
    assert np.allclose(basis_magnitudes(64), T.BASIS_MAG64, atol=4e-3)
    # Chroma tables coincide with luma (OD_FILT_SIZE is constant).
    assert np.allclose(basis_magnitudes(8, dec=1), T.BASIS_MAG8_CHROMA_420,
                       atol=1e-6)


def test_zigzag_band_structure_matches_shipped():
    # The shipped scans' band partition must equal our generator's
    # band masks, in band order (reference: tools/gen_zigzag8.m:5-10).
    from daala_tpu.train.zigzag import band_masks
    for n, tab in [(4, T.ZIGZAG4), (8, T.ZIGZAG8), (16, T.ZIGZAG16),
                   (32, T.ZIGZAG32), (64, T.ZIGZAG64)]:
        pos = 0
        for mask in band_masks(n):
            k = int(mask.sum())
            seg = np.asarray(tab)[pos:pos + k]
            assert all(mask[y, x] for x, y in seg), (n, pos)
            pos += k
        assert pos == len(tab)


def test_zigzag_from_measured_stats_correlates():
    # Scans regenerated from this framework's own lapped-DCT statistics
    # on synthetic content should largely agree with the shipped,
    # corpus-trained order.
    from daala_tpu.train.zigzag import gen_zigzag, measure_mags
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:192, 0:192]
    fr = [(128 + 60 * np.sin(xx / 7.0) + 50 * np.cos(yy / 11.0)
           + rng.normal(0, 8, xx.shape)).clip(0, 255).astype(np.uint8)]
    zz = gen_zigzag(measure_mags(fr, 8))
    rank_ours = np.full((8, 8), np.nan)
    rank_ref = np.full((8, 8), np.nan)
    for i, (x, y) in enumerate(zz):
        rank_ours[y, x] = i
    for i, (x, y) in enumerate(np.asarray(T.ZIGZAG8)):
        rank_ref[y, x] = i
    m = ~np.isnan(rank_ours) & ~np.isnan(rank_ref)
    corr = np.corrcoef(rank_ours[m], rank_ref[m])[0, 1]
    assert corr > 0.6, corr


def test_cos_search_shipped_is_local_optimum():
    # Reference: tools/cos_search.c; the codec's od_pvq_cos constants
    # (src/pvq.c:429-456) are the exact radius-1 optimum of the
    # squared-error objective.
    from daala_tpu.train.cos_search import SHIPPED, search, sq_error
    best, sse = search(center=SHIPPED, radius=1)
    assert best == SHIPPED
    assert sse == pytest.approx(sq_error(SHIPPED))
    # ... and the approximation is good to <1.5 LSB over the range.
    from daala_tpu.train.cos_search import cos2_batch, truth
    err = cos2_batch(np.array(SHIPPED), np.arange(32768)) - truth()
    assert np.abs(err).max() < 1.5


def test_vq_train_reduces_rms():
    # Reference: tools/vq_train.c spherical k-means; RMS must fall and
    # the codebook stay unit-norm.
    from daala_tpu.train.vq import train
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(8, 16))
    data = np.repeat(centers, 40, axis=0) + 0.1 * rng.normal(size=(320, 16))
    cb, hist = train(data, 16, nb_iter=12, exclude_pvq=False, seed=3,
                     backend="numpy")
    assert np.allclose((cb ** 2).sum(1), 1.0, atol=1e-6)
    assert hist[-1] < hist[0]
    # With 2x overcomplete entries nearly every true center is
    # captured; the residual is noise-floor plus at most one merged
    # pair (the reference trainer has the same local-minimum behavior).
    assert hist[-1] < 0.15


def test_filter_matrix_matches_integer_lifting():
    # The continuous lifting model must reproduce the integer
    # pre-filters (reference: src/filter.c:146-232) up to rounding.
    from daala_tpu.ops import _lifting as L
    from daala_tpu.train.gain import PARAMS4, PARAMS8, _filter_matrix
    rng = np.random.default_rng(2)
    x4 = rng.integers(-1 << 20, 1 << 20, 4)
    got = _filter_matrix(PARAMS4, 4) @ x4
    ref = np.array(L.pre_filter4([np.int64(v) for v in x4]), np.float64)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    x8 = rng.integers(-1 << 20, 1 << 20, 8)
    got8 = _filter_matrix(PARAMS8, 8) @ x8
    ref8 = np.array(L.pre_filter8([np.int64(v) for v in x8]), np.float64)
    assert np.abs(got8 - ref8).max() / np.abs(ref8).max() < 1e-5


def test_coding_gain_values():
    # Classical values on AR(0.95): unlapped 4-point DCT ~7.57 dB;
    # the shipped lapped filter adds ~1 dB
    # (reference: tools/trans_gain.c cg_1d, tools/trans.c).
    from daala_tpu.train.gain import PARAMS4, coding_gain_1d
    cg_unlapped = coding_gain_1d((64, 64, 0, 0))
    cg_shipped = coding_gain_1d(PARAMS4)
    assert cg_unlapped == pytest.approx(7.57, abs=0.02)
    assert cg_shipped == pytest.approx(8.55, abs=0.02)
    assert cg_shipped > cg_unlapped + 0.9


def test_integer_polish_cannot_improve_much_on_shipped():
    # The shipped params are a near-optimum of the AR(0.95) coding
    # gain: a radius-1 integer polish may move, but by < 0.1 dB.
    from daala_tpu.train.gain import PARAMS4, coding_gain_1d, search
    best, cg, _ = search(filt_n=4, steps=0, polish_radius=1)
    assert cg >= coding_gain_1d(PARAMS4) - 1e-12
    assert cg - coding_gain_1d(PARAMS4) < 0.1


def test_train_cli_smoke():
    """tools/train.py subcommands run and produce plausible output."""
    import os
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(root, "tools", "train.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, tool, "laplace", "4", "7"],
                       capture_output=True, text=True, cwd=root, env=env)
    assert r.returncode == 0 and "EXP_CDF_TABLE" in r.stdout
    r = subprocess.run([sys.executable, tool, "basis", "0", "mag"],
                       capture_output=True, text=True, cwd=root, env=env)
    assert r.returncode == 0 and "0.870774" in r.stdout
    r = subprocess.run([sys.executable, tool, "gain"],
                       capture_output=True, text=True, cwd=root, env=env)
    assert r.returncode == 0 and "8.5523" in r.stdout
