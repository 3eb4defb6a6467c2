"""End-to-end oracle: the full reference codec compiled as a shared lib.

Wraps daala_encode_* / daala_decode_* via ctypes (no Ogg container needed:
we pass daala_packet structs directly, exactly like examples do after
demuxing).  Used to generate reference bitstreams and reconstruction for
round-trip tests of the TPU implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

REF = os.environ.get("DAALA_REFERENCE", "/root/reference")
CACHE = os.path.join(os.path.dirname(__file__), ".oracle_cache")

OD_SET_QUANT = 4000
OD_SET_COMPLEXITY = 4002
OD_SET_ACTIVITY_MASKING = 4006
OD_SET_QM = 4008
OD_SET_DERING = 4010
OD_SET_B_FRAMES = 4110
OD_SET_MV_LEVEL_MIN = 4104
OD_SET_MV_LEVEL_MAX = 4106


class DaalaImagePlane(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(ctypes.c_ubyte)),
                ("xdec", ctypes.c_ubyte),
                ("ydec", ctypes.c_ubyte),
                ("xstride", ctypes.c_int),
                ("ystride", ctypes.c_int),
                ("bitdepth", ctypes.c_int)]


class DaalaImage(ctypes.Structure):
    _fields_ = [("planes", DaalaImagePlane * 4),
                ("nplanes", ctypes.c_int),
                ("width", ctypes.c_int32),
                ("height", ctypes.c_int32)]


class DaalaPlaneInfo(ctypes.Structure):
    _fields_ = [("xdec", ctypes.c_ubyte), ("ydec", ctypes.c_ubyte)]


class DaalaInfo(ctypes.Structure):
    _fields_ = [("version_major", ctypes.c_ubyte),
                ("version_minor", ctypes.c_ubyte),
                ("version_sub", ctypes.c_ubyte),
                ("pic_width", ctypes.c_int32),
                ("pic_height", ctypes.c_int32),
                ("pixel_aspect_numerator", ctypes.c_uint32),
                ("pixel_aspect_denominator", ctypes.c_uint32),
                ("timebase_numerator", ctypes.c_uint32),
                ("timebase_denominator", ctypes.c_uint32),
                ("frame_duration", ctypes.c_uint32),
                ("keyframe_granule_shift", ctypes.c_int),
                ("bitdepth_mode", ctypes.c_int),
                ("full_precision_references", ctypes.c_int),
                ("nplanes", ctypes.c_int),
                ("plane_info", DaalaPlaneInfo * 4),
                ("keyframe_rate", ctypes.c_int)]


class DaalaPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", ctypes.c_long),
                ("b_o_s", ctypes.c_long),
                ("e_o_s", ctypes.c_long),
                ("granulepos", ctypes.c_int64),
                ("packetno", ctypes.c_int64)]


class DaalaComment(ctypes.Structure):
    _fields_ = [("user_comments", ctypes.POINTER(ctypes.c_char_p)),
                ("comment_lengths", ctypes.POINTER(ctypes.c_int)),
                ("comments", ctypes.c_int),
                ("vendor", ctypes.c_char_p)]


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        os.makedirs(CACHE, exist_ok=True)
        path = os.path.join(CACHE, "libdaala_full.so")
        if not os.path.exists(path):
            srcs = sorted(
                os.path.join(REF, "src", f)
                for f in os.listdir(os.path.join(REF, "src"))
                if f.endswith(".c"))
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC",
                 "-I", os.path.join(REF, "src"),
                 "-I", os.path.join(REF, "include")] + srcs +
                ["-lm", "-o", path], check=True)
        _lib = ctypes.CDLL(path)
        _lib.daala_encode_create.restype = ctypes.c_void_p
        _lib.daala_decode_create.restype = ctypes.c_void_p
        _lib.daala_version_string.restype = ctypes.c_char_p
    return _lib


def make_info(width, height, nplanes=3, dec=((0, 0), (1, 1), (1, 1)),
              keyframe_rate=256, timebase=(30, 1), fpr=0,
              bitdepth_mode=1):
    info = DaalaInfo()
    get_lib().daala_info_init(ctypes.byref(info))
    info.pic_width = width
    info.pic_height = height
    info.nplanes = nplanes
    for i in range(nplanes):
        info.plane_info[i].xdec = dec[i][0]
        info.plane_info[i].ydec = dec[i][1]
    info.timebase_numerator = timebase[0]
    info.timebase_denominator = timebase[1]
    info.keyframe_rate = keyframe_rate
    info.full_precision_references = fpr
    info.bitdepth_mode = bitdepth_mode
    return info


def _build_image(planes_np, dec, bitdepth=8):
    """planes_np: list of 2-D uint8 (bitdepth 8) or uint16 (10/12)
    arrays (full-res allocated per plane)."""
    img = DaalaImage()
    img.nplanes = len(planes_np)
    img.width = planes_np[0].shape[1]
    img.height = planes_np[0].shape[0]
    keep = []
    for i, p in enumerate(planes_np):
        p = np.ascontiguousarray(p, np.uint8 if bitdepth == 8
                                 else np.uint16)
        keep.append(p)
        img.planes[i].data = p.ctypes.data_as(
            ctypes.POINTER(ctypes.c_ubyte))
        img.planes[i].xdec = dec[i][0]
        img.planes[i].ydec = dec[i][1]
        img.planes[i].xstride = 1 if bitdepth == 8 else 2
        img.planes[i].ystride = p.shape[1] * img.planes[i].xstride
        img.planes[i].bitdepth = bitdepth
    return img, keep


class RefEncoder:
    def __init__(self, width, height, quant=20, complexity=7, nplanes=3,
                 dec=((0, 0), (1, 1), (1, 1)), keyframe_rate=256,
                 activity_masking=None, qm=None, dering=None, b_frames=None,
                 mv_level_min=None, mv_level_max=None, fpr=0,
                 bitdepth=8):
        lib = get_lib()
        self.dec = dec
        self.bitdepth = bitdepth
        self.info = make_info(width, height, nplanes, dec, keyframe_rate,
                              fpr=fpr,
                              bitdepth_mode=1 + max(0, (bitdepth - 8) // 2))
        self.ctx = lib.daala_encode_create(ctypes.byref(self.info))
        assert self.ctx
        self._ctl_int(OD_SET_QUANT, quant)
        self._ctl_int(OD_SET_COMPLEXITY, complexity)
        if activity_masking is not None:
            self._ctl_int(OD_SET_ACTIVITY_MASKING, activity_masking)
        if qm is not None:
            self._ctl_int(OD_SET_QM, qm)
        if dering is not None:
            self._ctl_int(OD_SET_DERING, dering)
        if b_frames is not None:
            self._ctl_int(OD_SET_B_FRAMES, b_frames)
        if mv_level_min is not None:
            self._ctl_int(OD_SET_MV_LEVEL_MIN, mv_level_min)
        if mv_level_max is not None:
            self._ctl_int(OD_SET_MV_LEVEL_MAX, mv_level_max)

    def _ctl_int(self, req, val):
        v = ctypes.c_int(val)
        r = get_lib().daala_encode_ctl(ctypes.c_void_p(self.ctx), req,
                                       ctypes.byref(v), ctypes.sizeof(v))
        assert r == 0, (req, val, r)

    def flush_headers(self):
        lib = get_lib()
        comment = DaalaComment()
        lib.daala_comment_init(ctypes.byref(comment))
        headers = []
        pkt = DaalaPacket()
        while True:
            r = lib.daala_encode_flush_header(
                ctypes.c_void_p(self.ctx), ctypes.byref(comment),
                ctypes.byref(pkt))
            if r <= 0:
                break
            headers.append(ctypes.string_at(pkt.packet, pkt.bytes))
        lib.daala_comment_clear(ctypes.byref(comment))
        return headers

    def encode_frame(self, planes_np, last=False, duration=1):
        """Returns list of (packet_bytes, granulepos)."""
        lib = get_lib()
        img, keep = _build_image(planes_np, self.dec, self.bitdepth)
        r = lib.daala_encode_img_in(ctypes.c_void_p(self.ctx),
                                    ctypes.byref(img), duration)
        assert r == 0, r
        out = []
        pkt = DaalaPacket()
        while True:
            r = lib.daala_encode_packet_out(ctypes.c_void_p(self.ctx),
                                            1 if last else 0,
                                            ctypes.byref(pkt))
            if r <= 0:
                break
            out.append((ctypes.string_at(pkt.packet, pkt.bytes),
                        pkt.granulepos))
        return out

    def finish(self):
        """Drain remaining packets with last=1 (no new input)."""
        lib = get_lib()
        out = []
        pkt = DaalaPacket()
        while True:
            r = lib.daala_encode_packet_out(ctypes.c_void_p(self.ctx), 1,
                                            ctypes.byref(pkt))
            if r <= 0:
                break
            out.append((ctypes.string_at(pkt.packet, pkt.bytes),
                        pkt.granulepos))
        return out

    def __del__(self):
        try:
            if self.ctx:
                get_lib().daala_encode_free(ctypes.c_void_p(self.ctx))
        except Exception:
            pass


def _mk_packet(data: bytes, packetno: int, bos=False):
    buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
    pkt = DaalaPacket()
    pkt.packet = ctypes.cast(buf, ctypes.POINTER(ctypes.c_ubyte))
    pkt.bytes = len(data)
    pkt.b_o_s = 1 if bos else 0
    pkt.e_o_s = 0
    pkt.granulepos = -1
    pkt.packetno = packetno
    return pkt, buf


class RefDecoder:
    def __init__(self, headers):
        lib = get_lib()
        self.info = DaalaInfo()
        self.comment = DaalaComment()
        lib.daala_comment_init(ctypes.byref(self.comment))
        setup = ctypes.c_void_p(None)
        for i, h in enumerate(headers):
            pkt, buf = _mk_packet(h, i, bos=(i == 0))
            r = lib.daala_decode_header_in(
                ctypes.byref(self.info), ctypes.byref(self.comment),
                ctypes.byref(setup), ctypes.byref(pkt))
            assert r >= 0, r
        self.ctx = lib.daala_decode_create(ctypes.byref(self.info), setup)
        assert self.ctx
        self._pno = len(headers)

    def decode_packet(self, data: bytes):
        """Feed one video packet; returns list of decoded frames (each a
        list of per-plane uint8 arrays)."""
        lib = get_lib()
        pkt, buf = _mk_packet(data, self._pno)
        self._pno += 1
        r = lib.daala_decode_packet_in(ctypes.c_void_p(self.ctx),
                                       ctypes.byref(pkt))
        if r == -24:  # OD_EBADPACKET: rejected, no frame out
            return []
        assert r >= 0, r
        frames = []
        img = DaalaImage()
        while lib.daala_decode_img_out(ctypes.c_void_p(self.ctx),
                                       ctypes.byref(img)) == 1:
            planes = []
            for i in range(img.nplanes):
                pl = img.planes[i]
                w = (img.width + (1 << pl.xdec) - 1) >> pl.xdec
                h = (img.height + (1 << pl.ydec) - 1) >> pl.ydec
                dt = np.uint8 if pl.xstride == 1 else np.uint16
                arr = np.empty((h, w), dt)
                for row in range(h):
                    ctypes.memmove(
                        arr[row].ctypes.data,
                        ctypes.addressof(pl.data.contents)
                        + row * pl.ystride, w * pl.xstride)
                planes.append(arr)
            frames.append(planes)
        return frames

    def __del__(self):
        try:
            if self.ctx:
                get_lib().daala_decode_free(ctypes.c_void_p(self.ctx))
        except Exception:
            pass
