"""Metric correctness tests."""


def test_ciede2000_standard_vectors():
    """Sharma/Wu/Dalal 2005 CIEDE2000 test dataset (kL=kC=kH=1)."""
    import numpy as np
    from daala_tpu.utils.metrics import ciede2000, delta_e_2000
    cases = [
        ((50.0, 2.6772, -79.7751), (50.0, 0.0, -82.7485), 2.0425),
        ((50.0, 3.1571, -77.2803), (50.0, 0.0, -82.7485), 2.8615),
        ((50.0, 2.8361, -74.0200), (50.0, 0.0, -82.7485), 3.4412),
        ((50.0, -1.3802, -84.2814), (50.0, 0.0, -82.7485), 1.0000),
        ((50.0, 2.5, 0.0), (50.0, 0.0, -2.5), 4.3065),
        ((50.0, 2.5, 0.0), (73.0, 25.0, -18.0), 27.1492),
        ((60.2574, -34.0099, 36.2677), (60.4626, -34.1751, 39.4387),
         1.2644),
        ((63.0109, -31.0961, -5.8663), (62.8187, -29.7946, -4.0864),
         1.2630),
        ((2.0776, 0.0795, -1.1350), (0.9033, -0.0636, -0.5514), 0.9082),
    ]
    for l1, l2, want in cases:
        got = float(delta_e_2000(np.array([[l1]]), np.array([[l2]]),
                                 1.0, 1.0, 1.0)[0, 0])
        assert abs(got - want) < 1e-4, (l1, l2, want, got)
    # Identical frames are a perfect score; distortion lowers it.
    rng = np.random.default_rng(0)
    y = rng.integers(16, 236, (32, 32)).astype(np.uint8)
    c = rng.integers(16, 241, (16, 16)).astype(np.uint8)
    same = ciede2000([y, c, c], [y, c, c])
    assert same == 100.0
    noisy = ciede2000([y, c, c],
                      [np.clip(y.astype(int) + 8, 0, 255).astype(np.uint8),
                       c, c])
    assert noisy < same


def test_fast_ssim_matches_reference_tool():
    """fast_ssim reproduces the reference dump_fastssim calc_ssim to
    float precision (the structure window kernel was extracted from the
    incremental column scheme; reference: tools/dump_fastssim.c)."""
    import ctypes
    import os
    import subprocess
    import tempfile

    import numpy as np

    from daala_tpu.utils.metrics import fast_ssim
    # Build the reference calc_ssim as an oracle (cached).
    cache = os.path.join(os.path.dirname(__file__), ".oracle_cache")
    lib_path = os.path.join(cache, "libfastssim.so")
    if not os.path.exists(lib_path):
        src = open("/root/reference/tools/dump_fastssim.c").read()
        body = src[src.index("typedef struct fs_level fs_level;"):
                   src.index("static void usage(")]
        core = ("#include <stdio.h>\n#include <stdlib.h>\n"
                "#include <math.h>\n#include <string.h>\n"
                "#include <stdint.h>\n"
                "#define FS_MINI(_a,_b) ((_a)<(_b)?(_a):(_b))\n"
                "#define FS_MAXI(_a,_b) ((_a)>(_b)?(_a):(_b))\n"
                "#define SSIM_K1 (0.01*0.01)\n"
                "#define SSIM_K2 (0.03*0.03)\n" + body)
        with tempfile.NamedTemporaryFile("w", suffix=".c",
                                         delete=False) as f:
            f.write(core)
            cpath = f.name
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC", cpath, "-o",
                        lib_path, "-lm"], check=True)
        os.unlink(cpath)
    lib = ctypes.CDLL(lib_path)
    lib.calc_ssim.restype = ctypes.c_double
    lib.calc_ssim.argtypes = [ctypes.c_void_p, ctypes.c_int,
                              ctypes.c_void_p, ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int]
    rng = np.random.default_rng(0)
    for (w, h) in [(64, 64), (128, 96), (64, 48)]:
        yy, xx = np.mgrid[0:h, 0:w]
        a = (128 + 60 * np.sin(xx / 7.0) + 40 * np.cos(yy / 5.0)
             + rng.normal(0, 10, (h, w))).clip(0, 255).astype(np.uint8)
        b = (a.astype(np.int32)
             + rng.integers(-6, 7, (h, w))).clip(0, 255).astype(np.uint8)
        want = lib.calc_ssim(a.ctypes.data, w, b.ctypes.data, w, 8, w, h)
        got = fast_ssim(a, b)
        assert abs(want - got) < 1e-12, (w, h, want, got)
