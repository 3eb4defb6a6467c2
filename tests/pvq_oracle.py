"""ctypes oracle for the reference PVQ math (src/pvq.c)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

REF = os.environ.get("DAALA_REFERENCE", "/root/reference")
CACHE = os.path.join(os.path.dirname(__file__), ".oracle_cache")

_SOURCES = ["pvq.c", "partition.c", "zigzag4.c", "zigzag8.c", "zigzag16.c",
            "zigzag32.c", "zigzag64.c", "generic_code.c", "laplace_tables.c"]


def _build():
    os.makedirs(CACHE, exist_ok=True)
    lib = os.path.join(CACHE, "libpvq.so")
    if not os.path.exists(lib):
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC",
             "-I", os.path.join(REF, "src"),
             "-I", os.path.join(REF, "include")] +
            [os.path.join(REF, "src", s) for s in _SOURCES] +
            ["-o", lib], check=True)
    return ctypes.CDLL(lib)


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _build()
        _lib.od_pvq_sin.restype = ctypes.c_int16
        _lib.od_pvq_cos.restype = ctypes.c_int16
        _lib.od_gain_expand.restype = ctypes.c_int32
        _lib.od_pvq_compute_gain.restype = ctypes.c_int32
        _lib.od_pvq_compute_max_theta.restype = ctypes.c_int
        _lib.od_pvq_compute_theta.restype = ctypes.c_int32
        _lib.od_pvq_compute_k.restype = ctypes.c_int
        _lib.od_compute_householder.restype = ctypes.c_int
        _lib.od_pvq_size_ctx.restype = ctypes.c_int
        _lib.od_pvq_k1_ctx.restype = ctypes.c_int
        _lib.od_qm_get_index.restype = ctypes.c_int
        _lib.od_qm_offset.restype = ctypes.c_int
    return _lib


def pvq_sin(x):
    return get_lib().od_pvq_sin(ctypes.c_int32(x))


def pvq_cos(x):
    return get_lib().od_pvq_cos(ctypes.c_int32(x))


def gain_expand(cg, q0, beta):
    return get_lib().od_gain_expand(ctypes.c_int32(cg), q0,
                                    ctypes.c_int16(beta))


def compute_gain(x, q0, beta, bshift):
    x = np.ascontiguousarray(x, np.int16)
    g = ctypes.c_int32()
    qcg = get_lib().od_pvq_compute_gain(
        x.ctypes.data_as(ctypes.c_void_p), len(x), q0, ctypes.byref(g),
        ctypes.c_int16(beta), bshift)
    return qcg, g.value


def compute_max_theta(qcg, beta):
    return get_lib().od_pvq_compute_max_theta(ctypes.c_int32(qcg),
                                              ctypes.c_int16(beta))


def compute_theta(t, max_theta):
    return get_lib().od_pvq_compute_theta(t, max_theta)


def compute_k(qcg, itheta, theta, noref, n, beta, nodesync):
    return get_lib().od_pvq_compute_k(ctypes.c_int32(qcg), itheta,
                                      ctypes.c_int32(theta), noref, n,
                                      ctypes.c_int16(beta), nodesync)


def compute_householder(r, gr, shift):
    r = np.ascontiguousarray(r, np.int16)
    sign = ctypes.c_int()
    m = get_lib().od_compute_householder(
        r.ctypes.data_as(ctypes.c_void_p), len(r), ctypes.c_int32(gr),
        ctypes.byref(sign), shift)
    return r, m, sign.value


def apply_householder(x, r):
    x = np.ascontiguousarray(x, np.int16)
    r = np.ascontiguousarray(r, np.int16)
    out = np.empty_like(x)
    get_lib().od_apply_householder(
        out.ctypes.data_as(ctypes.c_void_p),
        x.ctypes.data_as(ctypes.c_void_p),
        r.ctypes.data_as(ctypes.c_void_p), len(x))
    return out


def synthesis_partial(ypulse, r16, n, noref, g, theta, m, s, qm_inv):
    ypulse = np.ascontiguousarray(ypulse, np.int32)
    r16 = np.ascontiguousarray(r16, np.int16)
    qm_inv = np.ascontiguousarray(qm_inv, np.int16)
    out = np.empty(n, np.int32)
    get_lib().od_pvq_synthesis_partial(
        out.ctypes.data_as(ctypes.c_void_p),
        ypulse.ctypes.data_as(ctypes.c_void_p),
        r16.ctypes.data_as(ctypes.c_void_p), n, noref,
        ctypes.c_int32(g), ctypes.c_int32(theta), m, s,
        qm_inv.ctypes.data_as(ctypes.c_void_p))
    return out


def init_qm(qm_q4):
    from daala_tpu.ops.pvq import QM_BUFFER_SIZE
    qm_q4 = np.ascontiguousarray(qm_q4, np.int32)
    x = np.zeros(QM_BUFFER_SIZE, np.int16)
    x_inv = np.zeros(QM_BUFFER_SIZE, np.int16)
    get_lib().od_init_qm(x.ctypes.data_as(ctypes.c_void_p),
                         x_inv.ctypes.data_as(ctypes.c_void_p),
                         qm_q4.ctypes.data_as(ctypes.c_void_p))
    return x, x_inv
