"""ctypes wrapper around the reference entropy coder, used as a test oracle.

Compiles src/entenc.c, src/entdec.c, src/entcode.c from the reference tree
(they are self-contained) and exposes encoder/decoder objects with the same
method names as daala_tpu.entropy.ec so tests can run the same symbol script
through both and compare bytes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

REF = os.environ.get("DAALA_REFERENCE", "/root/reference")
CACHE = os.path.join(os.path.dirname(__file__), ".oracle_cache")


def _build():
    os.makedirs(CACHE, exist_ok=True)
    lib = os.path.join(CACHE, "libec.so")
    if not os.path.exists(lib):
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC",
             "-I", os.path.join(REF, "src"),
             "-I", os.path.join(REF, "include"),
             os.path.join(REF, "src", "entenc.c"),
             os.path.join(REF, "src", "entdec.c"),
             os.path.join(REF, "src", "entcode.c"),
             "-o", lib], check=True)
    return ctypes.CDLL(lib)


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _build()
        _lib.od_ec_enc_done.restype = ctypes.c_void_p
        _lib.od_ec_enc_tell.restype = ctypes.c_int
        _lib.od_ec_enc_tell_frac.restype = ctypes.c_uint32
        _lib.od_ec_dec_tell.restype = ctypes.c_int
    return _lib


STRUCT_SIZE = 512  # generous opaque storage for od_ec_enc / od_ec_dec


def _u16arr(cdf):
    return (ctypes.c_uint16 * len(cdf))(*cdf)


class RefEncoder:
    def __init__(self):
        lib = get_lib()
        self._st = ctypes.create_string_buffer(STRUCT_SIZE)
        lib.od_ec_enc_init(self._st, 1024)

    def encode(self, fl, fh, ft):
        # od_ec_encode is static; use the cdf entry points instead.
        raise NotImplementedError

    def encode_q15(self, fl, fh):
        raise NotImplementedError

    def encode_bool_q15(self, val, fz):
        get_lib().od_ec_encode_bool_q15(self._st, val, fz)

    def encode_cdf_q15(self, s, cdf):
        get_lib().od_ec_encode_cdf_q15(self._st, s, _u16arr(cdf), len(cdf))

    def encode_cdf_unscaled(self, s, cdf):
        get_lib().od_ec_encode_cdf_unscaled(self._st, s, _u16arr(cdf),
                                            len(cdf))

    def encode_uint(self, fl, ft):
        get_lib().od_ec_enc_uint(self._st, fl, ft)

    def encode_bits(self, fl, ftb):
        get_lib().od_ec_enc_bits(self._st, fl, ftb)

    def patch_initial_bits(self, val, nbits):
        get_lib().od_ec_enc_patch_initial_bits(self._st, val, nbits)

    def tell(self):
        return get_lib().od_ec_enc_tell(self._st)

    def tell_frac(self):
        return get_lib().od_ec_enc_tell_frac(self._st)

    def done(self) -> bytes:
        nbytes = ctypes.c_uint32()
        ptr = get_lib().od_ec_enc_done(self._st, ctypes.byref(nbytes))
        if not ptr:
            raise RuntimeError("reference encoder error")
        return ctypes.string_at(ptr, nbytes.value)

    def __del__(self):
        try:
            get_lib().od_ec_enc_clear(self._st)
        except Exception:
            pass


class RefDecoder:
    def __init__(self, buf: bytes):
        lib = get_lib()
        self._st = ctypes.create_string_buffer(STRUCT_SIZE)
        self._buf = ctypes.create_string_buffer(buf, len(buf))
        lib.od_ec_dec_init(self._st, self._buf, len(buf))

    def decode_bool_q15(self, fz):
        return get_lib().od_ec_decode_bool_q15_(self._st, fz)

    def decode_cdf_q15(self, cdf):
        return get_lib().od_ec_decode_cdf_q15_(self._st, _u16arr(cdf),
                                               len(cdf))

    def decode_cdf_unscaled(self, cdf):
        return get_lib().od_ec_decode_cdf_unscaled_(self._st, _u16arr(cdf),
                                                    len(cdf))

    def decode_uint(self, ft):
        return get_lib().od_ec_dec_uint_(self._st, ft)

    def decode_bits(self, ftb):
        return get_lib().od_ec_dec_bits_(self._st, ftb)

    def tell(self):
        return get_lib().od_ec_dec_tell(self._st)
