#!/usr/bin/env python3
"""Offline training / table-generation CLI.

Counterpart of the reference's tools/{gen_laplace_tables,gen_cdf,
compute_basis,cos_search,vq_train,trans}.c and tools/gen_zigzag*.m,
backed by the `daala_tpu.train` modules (vectorized numpy/jax; the
searches run on TPU when available).

Usage:
  python tools/train.py laplace [n] [shift]
  python tools/train.py cdf [n] [shift]
  python tools/train.py basis <ln> <coeff|mag|coeff420|mag420>
  python tools/train.py cos-search [--radius R]
  python tools/train.py vq <dims> <max_vectors> <bits> [< vectors.txt]
  python tools/train.py zigzag <n> [--clip clip.y4m]
  python tools/train.py gain [--filt 4|8] [--rho R] [--search]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "laplace":
        from daala_tpu.train.laplace import main as m
        return m(["laplace"] + argv)
    if cmd == "cdf":
        from daala_tpu.train.laplace import main as m
        return m(["cdf"] + argv)
    if cmd == "basis":
        from daala_tpu.train.basis import main as m
        return m(argv)
    if cmd == "cos-search":
        from daala_tpu.train.cos_search import main as m
        return m(argv)
    if cmd == "vq":
        from daala_tpu.train.vq import main as m
        return m(argv)
    if cmd == "zigzag":
        from daala_tpu.train.zigzag import main as m
        return m(argv)
    if cmd == "gain":
        from daala_tpu.train.gain import main as m
        return m(argv)
    print("unknown subcommand %r" % cmd)
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
