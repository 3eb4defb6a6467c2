"""Real-clip discovery for the validation gates.

The reference's ground-truth CI runs on three natural-capture clips
fetched over the network (/root/reference/ci/fetch-videos.sh:3-5:
claire_qcif-2frames.y4m, tos444.y4m, nes420.y4m) and gates on lossless
round-trips (/root/reference/ci/lossless.sh:12-14).  This environment
has no network, so every harness that wants real content looks for a
user-provided directory instead:

    export DAALA_CLIPS=/path/to/y4m/dir

and consumes every ``*.y4m`` inside it.  With the variable unset (or
the directory empty) callers print a documented skip — the moment the
reference's own clips exist locally, the reference's CI gate runs with
no code changes:

    DAALA_CLIPS=~/clips python tools/check_lossless.py
    DAALA_CLIPS=~/clips python -m pytest tests/test_real_clips.py
    DAALA_CLIPS=~/clips python tools/rd_collect.py --all
"""

from __future__ import annotations

import os

ENV_VAR = "DAALA_CLIPS"

# The reference CI set, checked first when present so the gate matches
# /root/reference/ci/lossless.sh's clip order.
_CI_ORDER = ("claire_qcif-2frames.y4m", "tos444.y4m", "nes420.y4m")


def clips_dir():
    return os.environ.get(ENV_VAR, "")


def find_clips():
    """Sorted list of y4m paths under $DAALA_CLIPS (reference CI clips
    first), or [] when the variable is unset / the dir has none."""
    d = clips_dir()
    if not d or not os.path.isdir(d):
        return []
    names = sorted(n for n in os.listdir(d)
                   if n.lower().endswith(".y4m"))
    ordered = [n for n in _CI_ORDER if n in names]
    ordered += [n for n in names if n not in _CI_ORDER]
    return [os.path.join(d, n) for n in ordered]


def skip_reason():
    """Human-readable reason find_clips() came back empty."""
    d = clips_dir()
    if not d:
        return ("%s is not set; point it at a directory of .y4m clips "
                "(the reference CI set: claire_qcif-2frames.y4m, "
                "tos444.y4m, nes420.y4m — see "
                "/root/reference/ci/fetch-videos.sh) to run the "
                "real-content gates" % ENV_VAR)
    if not os.path.isdir(d):
        return "%s=%s is not a directory" % (ENV_VAR, d)
    return "%s=%s contains no .y4m files" % (ENV_VAR, d)
