"""Synthetic but video-like test content.

No real clips can be fetched in this environment (the reference CI pulls
them from the network, reference: ci/fetch-videos.sh); this module
synthesizes the content classes those clips exercise: smooth gradients,
band-limited texture (film-grain-like), hard edges and text-like glyphs,
local object motion over global pan, and scene cuts."""

import numpy as np


def _lowpass(a, k):
    """Separable box low-pass of width k (reflected edges)."""
    if k <= 1:
        return a
    kernel = np.ones(k) / k
    a = np.apply_along_axis(lambda r: np.convolve(r, kernel, "same"), 0, a)
    a = np.apply_along_axis(lambda r: np.convolve(r, kernel, "same"), 1, a)
    return a


def make_scene(w, h, seed=0):
    """A single 'natural-ish' luma scene: gradient base + two texture
    scales + hard-edged rectangles + glyph-like strokes."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * (xx / w) + 32 * np.sin(yy / 41.0)
    tex_fine = _lowpass(rng.normal(0, 30, (h, w)), 3)
    tex_coarse = _lowpass(rng.normal(0, 60, (h, w)), 15)
    img = base + 0.6 * tex_fine + 0.8 * tex_coarse
    # Hard-edged rectangles (synthetic foreground objects).
    for i in range(6):
        x0 = int(rng.integers(0, max(1, w - w // 5)))
        y0 = int(rng.integers(0, max(1, h - h // 5)))
        bw = int(rng.integers(w // 20, w // 5))
        bh = int(rng.integers(h // 20, h // 5))
        img[y0:y0 + bh, x0:x0 + bw] = rng.integers(30, 220)
    # Text-like strokes (thin high-contrast lines).
    for i in range(20):
        x0 = int(rng.integers(0, w - 30))
        y0 = int(rng.integers(0, h - 4))
        img[y0:y0 + 2, x0:x0 + int(rng.integers(8, 30))] = 235
    return img


def make_clip(w, h, nframes, seed=0, fourcc="420"):
    """Multi-scene clip: global pan + a moving object + a mid-clip scene
    cut.  Returns a list of [Y, Cb, Cr] uint8 plane lists."""
    rng = np.random.default_rng(seed)
    pad = 64
    scenes = [make_scene(w + 2 * pad, h + 2 * pad, seed=seed + i)
              for i in range(2)]
    cut = nframes // 2
    frames = []
    for t in range(nframes):
        sc = scenes[0] if t < cut else scenes[1]
        tt = t if t < cut else t - cut
        # Global pan (non-integer rate so subpel matters).
        ox = pad + int(round(1.6 * tt))
        oy = pad + int(round(0.7 * tt))
        img = sc[oy:oy + h, ox:ox + w].copy()
        # A moving object with its own motion.
        obw, obh = w // 8, h // 8
        mx = (w // 4 + 3 * tt) % max(1, w - obw)
        my = (h // 3 + 2 * tt) % max(1, h - obh)
        img[my:my + obh, mx:mx + obw] = \
            img[my:my + obh, mx:mx + obw] * 0.3 + 180 * 0.7
        y = np.clip(img, 0, 255).astype(np.uint8)
        if fourcc == "444":
            cb = np.clip(128 + 0.3 * (img - 128), 0, 255).astype(np.uint8)
            cr = np.clip(128 - 0.2 * (img - 128), 0, 255).astype(np.uint8)
        else:
            sub = img[::2, ::2]
            cb = np.clip(128 + 0.3 * (sub - 128), 0, 255).astype(np.uint8)
            cr = np.clip(128 - 0.2 * (sub - 128), 0, 255).astype(np.uint8)
        frames.append([y, cb, cr])
    return frames
