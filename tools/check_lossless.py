#!/usr/bin/env python3
"""Lossless round-trip checker.

Equivalent of the reference's tools/check_lossless.sh: encode the input
at the lossless quantizer setting (-v 0), decode, and verify the output
is bit-identical to the source.
"""

import argparse
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="*",
                    help=".y4m files to check (default: every clip in "
                         "$DAALA_CLIPS — the reference CI gate, "
                         "/root/reference/ci/lossless.sh)")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("-b", "--b-frames", type=int, default=0)
    args = ap.parse_args()

    if not args.inputs:
        sys.path.insert(0, os.path.dirname(HERE))
        from daala_tpu.utils import clips
        args.inputs = clips.find_clips()
        if not args.inputs:
            print("check_lossless: SKIP — " + clips.skip_reason())
            sys.exit(0)

    failures = 0
    for src in args.inputs:
        with tempfile.TemporaryDirectory() as td:
            ogv = os.path.join(td, "t.ogv")
            y4m = os.path.join(td, "t.y4m")
            cmd = [sys.executable, os.path.join(HERE, "encode.py"),
                   src, ogv, "-v", "0", "-b", str(args.b_frames)]
            if args.limit:
                cmd += ["--limit", str(args.limit)]
            subprocess.run(cmd, check=True, capture_output=True)
            subprocess.run([sys.executable,
                            os.path.join(HERE, "decode.py"), ogv, y4m],
                           check=True, capture_output=True)
            # Compare frame payloads (headers may differ in comments).
            ok = _same_frames(src, y4m, args.limit)
            print("%s: %s" % (src, "LOSSLESS" if ok else "FAILED"))
            failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


def _same_frames(a_path, b_path, limit):
    sys.path.insert(0, os.path.dirname(HERE))
    import numpy as np
    from daala_tpu.utils.y4m import Y4MReader
    ra, rb = Y4MReader(a_path), Y4MReader(b_path)
    n = 0
    for fa, fb in zip(ra, rb):
        for pa, pb in zip(fa, fb):
            if not np.array_equal(pa, pb):
                return False
        n += 1
        if limit and n >= limit:
            break
    return n > 0


if __name__ == "__main__":
    main()
