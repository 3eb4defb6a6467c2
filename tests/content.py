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


def _octave_noise(shape, rng, octaves=((3, 60), (9, 45), (27, 35))):
    """Filtered noise octaves: the 1/f-ish spatial spectrum of natural
    texture (grass, fabric, foliage) instead of a pure sinusoid."""
    acc = np.zeros(shape)
    for k, sigma in octaves:
        acc += _lowpass(rng.normal(0, sigma, shape), k)
    return acc


def make_natural_clip(w, h, nframes, seed=0, fourcc="420", grain=3.0):
    """Natural-statistics clip: multi-octave textured background with
    depth layers, a slow non-integer pan (subpel matters), a foreground
    occluder with independent motion revealing background, luminance
    flicker, and per-frame film grain.  Harder than the sinusoid-based
    classes for both the MV search (occlusion boundaries) and the rate
    allocation (broadband texture)."""
    rng = np.random.default_rng(seed)
    pad = 96
    W, H = w + 2 * pad, h + 2 * pad
    yy, xx = np.mgrid[0:H, 0:W]
    # Background: smooth illumination + texture octaves.
    bg = (120 + 40 * np.sin(xx / 171.0) + 25 * np.cos(yy / 133.0)
          + _octave_noise((H, W), rng))
    # A second (nearer) layer with stronger texture, moving faster.
    fgtex = (140 + _octave_noise(
        (H, W), np.random.default_rng(seed + 1),
        octaves=((3, 80), (15, 50))))
    # Foreground occluder mask: a soft-edged blob.
    oy, ox = np.mgrid[0:h // 2, 0:w // 2]
    blob = (((oy - h / 4.0) / (h / 4.0)) ** 2
            + ((ox - w / 4.0) / (w / 4.0)) ** 2) < 0.8
    frames = []
    for t in range(nframes):
        # Non-integer pan rates; layers move at different speeds
        # (parallax) so occlusion boundaries shift every frame.
        bx = pad + int(round(1.7 * t))
        by = pad + int(round(0.9 * t))
        fx = pad + int(round(3.4 * t))
        fy = pad + int(round(1.2 * t))
        img = bg[by:by + h, bx:bx + w].copy()
        # Luminance flicker (rate-control stressor).
        img *= 1.0 + 0.02 * np.sin(t / 2.3)
        # Occluder placement drifts with its own motion.
        py = (h // 4 + int(round(2.6 * t))) % (h - h // 2)
        px = (w // 6 + int(round(4.1 * t))) % (w - w // 2)
        patch = fgtex[fy + py:fy + py + h // 2,
                      fx + px:fx + px + w // 2]
        region = img[py:py + h // 2, px:px + w // 2]
        img[py:py + h // 2, px:px + w // 2] = \
            np.where(blob, patch, region)
        # Film grain: white noise, fresh every frame.
        img = img + rng.normal(0, grain, (h, w))
        y = np.clip(img, 0, 255).astype(np.uint8)
        if fourcc == "444":
            cb = np.clip(128 + 0.25 * (img - 128), 0, 255) \
                .astype(np.uint8)
            cr = np.clip(128 - 0.18 * (img - 128), 0, 255) \
                .astype(np.uint8)
        else:
            sub = img[::2, ::2]
            cb = np.clip(128 + 0.25 * (sub - 128), 0, 255) \
                .astype(np.uint8)
            cr = np.clip(128 - 0.18 * (sub - 128), 0, 255) \
                .astype(np.uint8)
        frames.append([y, cb, cr])
    return frames
