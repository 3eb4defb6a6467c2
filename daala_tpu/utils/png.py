"""Minimal PNG codec (8-bit gray / RGB, non-interlaced).

Self-contained (zlib from the stdlib only) so the format-converter tools
(tools/convert.py, counterparts of the reference's tools/png2y4m.c and
tools/y4m2png.c) work without external imaging libraries.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_bytes(img: np.ndarray) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as PNG bytes."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        color_type = 0
        nch = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
        nch = 3
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = img.reshape(h, w * nch)
    # Filter type 0 (None) per scanline.
    scan = np.empty((h, 1 + w * nch), np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = raw
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
            + _chunk(b"IEND", b""))


def write_png(path: str, img: np.ndarray):
    """img: (H, W) grayscale or (H, W, 3) RGB uint8."""
    with open(path, "wb") as f:
        f.write(png_bytes(img))


def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def read_png(path: str) -> np.ndarray:
    """Returns (H, W) for grayscale, (H, W, 3) for RGB/palette; alpha is
    dropped.  8-bit, non-interlaced only."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    ihdr = None
    plte = None
    trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.empty((h, stride), np.uint8)
    bpp = nch
    pos = 0
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride],
                             np.uint8).copy()
        pos += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            line = (line.astype(np.int16) + prev) .astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) \
                    & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(int(left), int(prev[i]),
                                            int(ul))) & 0xFF
        else:
            raise ValueError("bad filter %d" % ft)
        out[y] = line
        prev = out[y]
    img = out.reshape(h, w, nch)
    if color_type == 0:
        return img[:, :, 0]
    if color_type == 2:
        return img
    if color_type == 3:
        return plte[img[:, :, 0]]
    if color_type == 4:
        return img[:, :, 0]
    return img[:, :, :3]
