#!/usr/bin/env python3
"""Extract the normative lifting networks from the Daala reference sources.

The reversible integer DCTs (reference: src/dct.c:87-4920) and the lapped
pre/post filters (reference: src/filter.c:147-1100) are *normative bitstream
data*: any implementation that wants to interoperate bit-exactly must apply
the exact same sequence of lifting steps with the exact same fixed-point
constants, just as it must use the same zigzag tables and CDF tables.  The
IETF drafts (reference: doc/ietf/) specify these networks; src/dct.c is the
canonical machine-readable form of that specification.

This tool therefore does NOT translate reference *code structure*: it parses
the lifting data-flow graphs (straight-line sequences of adds, shifts, and
constant multiplies) out of the preprocessed C, and re-emits them as pure
lane-wise Python functions.  Each emitted function maps a list of N input
arrays (one per lane) to a list of N output arrays, with every operation an
elementwise int32 op, so the same function body runs:

  * vectorized over all blocks of a frame at once under numpy,
  * batched/jitted under jax.numpy,
  * on loaded registers inside a Pallas TPU kernel.

That "one lane = one array over thousands of blocks" layout is the TPU-first
inversion of the reference design (which runs one block at a time): the
sequential lifting chain (depth ~tens of ops) runs on the VPU across a whole
frame's blocks in parallel.

Usage: python tools/gen_lifting.py  (regenerates daala_tpu/ops/_lifting.py)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

REF = os.environ.get("DAALA_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "daala_tpu", "ops", "_lifting.py")

# ---------------------------------------------------------------------------
# Stub headers: we preprocess the reference sources with our own minimal
# headers so that macros like OD_FDCT_64 expand while OD_DCT_RSHIFT survives
# as a call marker (a self-referential macro is not re-expanded by cpp).
# ---------------------------------------------------------------------------

STUB_HEADERS = {
    "block_size.h": """
#pragma once
#define OD_NBSIZES (5)
#define OD_LOG_BSIZE0 (2)
#define OD_LOG_BSIZE_MAX (OD_LOG_BSIZE0 + OD_NBSIZES - 1)
#define OD_BSIZE_MAX (1 << OD_LOG_BSIZE_MAX)
""",
    "internal.h": """
#pragma once
#include <stdint.h>
#define OD_COEFF_SHIFT (4)
#define OD_COEFF_SCALE (1 << OD_COEFF_SHIFT)
#define OD_UNUSED(x) (void)(x)
#define OD_MINI(a, b) OD_MINI(a, b)
#define OD_MAXI(a, b) OD_MAXI(a, b)
#define OD_CLAMPI(a, b, c) OD_CLAMPI(a, b, c)
""",
    "filter.h": """
#pragma once
#include "internal.h"
#include "block_size.h"
typedef int32_t od_coeff;
#define OD_COEFF_BITS (32)
#define OD_NFILTER_SIZES (4)
#define OD_DCT_RSHIFT(a, b) OD_DCT_RSHIFT(a, b)
#define OD_DCT_OVERFLOW_CHECK(val, scale, offset, idx)
typedef void (*od_filter_func)(od_coeff out[], const od_coeff in[]);
extern const od_filter_func OD_PRE_FILTER[OD_NBSIZES];
extern const od_filter_func OD_POST_FILTER[OD_NBSIZES];
#define OD_FILT_SIZE_MACRO(ln, xdec) (0)
""",
    "dct.h": """
#pragma once
#include "filter.h"
typedef void (*od_dct_func_2d)(od_coeff *out, int out_stride,
 const od_coeff *in, int in_stride);
typedef void (*od_fdct_func_1d)(od_coeff *out, const od_coeff *in,
 int in_stride);
typedef void (*od_idct_func_1d)(od_coeff *out, int out_stride,
 const od_coeff *in);
void od_bin_fdct4(od_coeff y[4], const od_coeff *x, int xstride);
void od_bin_idct4(od_coeff *x, int xstride, const od_coeff y[4]);
void od_bin_fdct8(od_coeff y[8], const od_coeff *x, int xstride);
void od_bin_idct8(od_coeff *x, int xstride, const od_coeff y[8]);
void od_bin_fdct16(od_coeff y[16], const od_coeff *x, int xstride);
void od_bin_idct16(od_coeff *x, int xstride, const od_coeff y[16]);
void od_bin_fdct32(od_coeff y[32], const od_coeff *x, int xstride);
void od_bin_idct32(od_coeff *x, int xstride, const od_coeff y[32]);
void od_bin_fdct64(od_coeff y[64], const od_coeff *x, int xstride);
void od_bin_idct64(od_coeff *x, int xstride, const od_coeff y[64]);
""",
    "tf.h": """
#pragma once
#include "filter.h"
#define OD_HAAR_KERNEL(ll, lh, hl, hh) OD_HAAR_KERNEL(ll, lh, hl, hh)
""",
    "state.h": """
#pragma once
#include "filter.h"
""",
}

DCT_FUNCS = []
for _n in (4, 8, 16, 32, 64):
    DCT_FUNCS += ["od_bin_fdct%d" % _n, "od_bin_idct%d" % _n]
FILTER_FUNCS = []
for _n in (4, 8, 16, 32):
    FILTER_FUNCS += ["od_pre_filter%d" % _n, "od_post_filter%d" % _n]


def preprocess(src_path: str) -> str:
    with tempfile.TemporaryDirectory() as d:
        for name, text in STUB_HEADERS.items():
            with open(os.path.join(d, name), "w") as f:
                f.write(text)
        # Copy the source into the stub dir so that quote-includes resolve to
        # our stub headers rather than the reference's own headers.
        local = os.path.join(d, os.path.basename(src_path))
        with open(src_path) as f:
            src = f.read()
        with open(local, "w") as f:
            f.write(src)
        cmd = ["gcc", "-E", "-P", "-I", d, local]
        out = subprocess.run(cmd, capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise RuntimeError("preprocess failed for %s" % src_path)
        return out.stdout


def extract_function(text: str, name: str) -> str:
    for m in re.finditer(r"\bvoid\s+%s\s*\(" % re.escape(name), text):
        # Find the matching ')' of the parameter list.
        depth, j = 0, m.end() - 1
        while True:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        k = j + 1
        while k < len(text) and text[k].isspace():
            k += 1
        if k >= len(text) or text[k] != "{":
            continue  # prototype, not a definition
        depth = 0
        for j in range(k, len(text)):
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
                if depth == 0:
                    return text[m.start():j + 1]
        raise ValueError("unbalanced braces in %s" % name)
    raise KeyError(name)


# ---------------------------------------------------------------------------
# Tokenizer / parser for the straight-line lifting subset of C.
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(
    r"\s*(>>=|<<=|\+=|-=|>>|<<|[A-Za-z_][A-Za-z_0-9]*|0x[0-9a-fA-F]+|\d+"
    r"|[-+*/%&|^~=;,()\[\]{}])"
)


def tokenize(s: str):
    toks, i = [], 0
    while i < len(s):
        m = TOKEN_RE.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise ValueError("tokenize error at: %r" % s[i:i + 40])
        toks.append(m.group(1))
        i = m.end()
    return toks


class Parser:
    """Precedence-climbing parser for C expressions over the lifting subset."""

    # C precedence (higher binds tighter).
    BINOPS = {
        "|": 1, "^": 2, "&": 3,
        "<<": 4, ">>": 4,
        "+": 5, "-": 5,
        "*": 6, "/": 6, "%": 6,
    }
    CAST_TYPES = {"od_coeff", "int", "int32_t", "unsigned"}

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError("expected %r got %r near %r" %
                             (t, got, self.toks[max(0, self.i - 6):self.i + 4]))

    def parse_expr(self, min_prec=0):
        lhs = self.parse_unary()
        while True:
            op = self.peek()
            prec = self.BINOPS.get(op)
            if prec is None or prec < min_prec:
                return lhs
            self.next()
            rhs = self.parse_expr(prec + 1)
            lhs = ("bin", op, lhs, rhs)

    def parse_unary(self):
        t = self.peek()
        if t == "-":
            self.next()
            return ("neg", self.parse_unary())
        if t == "~":
            self.next()
            return ("inv", self.parse_unary())
        if t == "+":
            self.next()
            return self.parse_unary()
        if t == "*":  # pointer deref: *(x + k*stride)
            self.next()
            return ("deref", self.parse_unary())
        if t == "(":
            # Either a cast or a parenthesized expression.
            if self.peek(1) in self.CAST_TYPES and self.peek(2) == ")":
                self.next(); self.next(); self.next()
                return self.parse_unary()  # casts are no-ops lane-wise
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return self.parse_postfix(e)
        if re.match(r"^(0x[0-9a-fA-F]+|\d+)$", t):
            self.next()
            return ("num", int(t, 0))
        if re.match(r"^[A-Za-z_]", t):
            self.next()
            if self.peek() == "(":
                self.next()
                args = []
                if self.peek() != ")":
                    while True:
                        args.append(self.parse_expr())
                        if self.peek() == ",":
                            self.next()
                            continue
                        break
                self.expect(")")
                return ("call", t, args)
            return self.parse_postfix(("var", t))
        raise ValueError("unexpected token %r" % t)

    def parse_postfix(self, e):
        while self.peek() == "[":
            self.next()
            idx = self.parse_expr()
            self.expect("]")
            e = ("index", e, idx)
        return e


def const_eval(e, env):
    """Evaluate a constant index expression (strides bound to 1)."""
    kind = e[0]
    if kind == "num":
        return e[1]
    if kind == "var":
        if e[1] in env:
            return env[e[1]]
        raise ValueError("non-constant index var %r" % e[1])
    if kind == "neg":
        return -const_eval(e[1], env)
    if kind == "bin":
        a, b = const_eval(e[2], env), const_eval(e[3], env)
        return {
            "+": a + b, "-": a - b, "*": a * b, "/": a // b,
            "<<": a << b, ">>": a >> b, "&": a & b, "|": a | b,
        }[e[1]]
    raise ValueError("cannot const-eval %r" % (e,))


class FnBuilder:
    """Walks the parsed statements of one lifting function and emits Python."""

    def __init__(self, name, in_name, out_name, stride_names, n):
        self.name = name
        self.in_name = in_name
        self.out_name = out_name
        self.strides = {s: 1 for s in stride_names}
        self.n = n
        self.lines = []
        self.outputs = {}
        self.loaded = {}

    def py_name(self, var, idx=None):
        if idx is None:
            return "v_" + var
        return "v_%s_%d" % (var, idx)

    def emit_expr(self, e):
        kind = e[0]
        if kind == "num":
            return str(e[1])
        if kind == "var":
            return self.py_name(e[1])
        if kind == "neg":
            return "(-%s)" % self.emit_expr(e[1])
        if kind == "inv":
            return "(~%s)" % self.emit_expr(e[1])
        if kind == "bin":
            op = e[1]
            if op == "/":
                return "c_div(%s, %s)" % (self.emit_expr(e[2]),
                                          self.emit_expr(e[3]))
            return "(%s %s %s)" % (self.emit_expr(e[2]), op,
                                   self.emit_expr(e[3]))
        if kind == "call":
            fn, args = e[1], e[2]
            if fn == "OD_DCT_RSHIFT":
                b = const_eval(args[1], self.strides)
                return "dct_rshift(%s, %d)" % (self.emit_expr(args[0]), b)
            raise ValueError("unsupported call %r in %s" % (fn, self.name))
        if kind == "deref":
            return self.emit_expr(self.resolve_ref(e))
        if kind == "index":
            return self.emit_expr(self.resolve_ref(e))
        raise ValueError("cannot emit %r" % (e,))

    def resolve_ref(self, e):
        """Turn x[k*stride] / *(x + k*stride) / t[k] into a lane variable."""
        if e[0] == "deref":
            # *(base + expr)
            inner = e[1]
            if inner[0] == "bin" and inner[1] == "+":
                base, idx = inner[2], inner[3]
            elif inner[0] == "var":
                base, idx = inner, ("num", 0)
            else:
                raise ValueError("bad deref %r" % (inner,))
        elif e[0] == "index":
            base, idx = e[1], e[2]
        else:
            raise ValueError("bad ref %r" % (e,))
        if base[0] != "var":
            raise ValueError("bad ref base %r" % (base,))
        name = base[1]
        k = const_eval(idx, self.strides)
        if name == self.in_name:
            v = "x_%d" % k
            if k not in self.loaded:
                self.loaded[k] = v
            return ("var", "IN_%d" % k)
        if name == self.out_name:
            return ("var", "OUT_%d" % k)
        return ("var", "%s_%d" % (name, k))

    def py_lhs(self, e):
        r = self.resolve_ref(e) if e[0] in ("deref", "index") else e
        if r[0] != "var":
            raise ValueError("bad lhs %r" % (r,))
        return self.py_name(r[1])

    def statement(self, lhs, op, rhs):
        lv = self.py_lhs(lhs)
        rv = self.emit_expr(rhs)
        if op == "=":
            self.lines.append("%s = %s" % (lv, rv))
        elif op == "+=":
            self.lines.append("%s = %s + %s" % (lv, lv, rv))
        elif op == "-=":
            self.lines.append("%s = %s - %s" % (lv, lv, rv))
        else:
            raise ValueError("bad assign op %r" % op)
        if lv.startswith("v_OUT_"):
            self.outputs[int(lv.rsplit("_", 1)[1])] = lv


def build_function(src_text: str, name: str) -> str:
    body = extract_function(src_text, name)
    sig = body[:body.index("{")]
    # Identify parameters.
    params = re.findall(r"(?:const\s+)?od_coeff\s*(?:\*\s*)?([A-Za-z_0-9]+)"
                        r"(?:\s*\[\s*\d*\s*\])?", sig)
    stride_names = re.findall(r"\bint\s+([A-Za-z_0-9]+)", sig)
    is_const = re.findall(r"(const\s+)?od_coeff\s*(?:\*\s*)?[A-Za-z_0-9]+", sig)
    # Input param is the const one; output the non-const one.
    in_name = out_name = None
    for m in re.finditer(r"(const\s+)?od_coeff\s*(?:\*\s*)?([A-Za-z_0-9]+)", sig):
        if m.group(1):
            in_name = m.group(2)
        else:
            out_name = m.group(2)
    if in_name is None or out_name is None:
        raise ValueError("could not identify in/out params of %s: %s"
                         % (name, sig))
    n = int(re.search(r"(\d+)$", name).group(1))

    fb = FnBuilder(name, in_name, out_name, stride_names, n)
    code = body[body.index("{") + 1:-1]
    toks = tokenize(code)
    p = Parser(toks)
    while p.peek() is not None:
        t = p.peek()
        if t in ("int", "od_coeff"):
            # Declaration: skip to ';'
            while p.next() != ";":
                pass
            continue
        if t == ";":
            p.next()
            continue
        if t == "{" or t == "}":
            p.next()
            continue
        if t == "do":
            p.next()
            continue
        if t == "while":
            # `while (0);` closing a do-while macro wrapper.
            p.next()
            p.expect("(")
            p.expect("0")
            p.expect(")")
            continue
        lhs = p.parse_unary()
        op = p.next()
        if op not in ("=", "+=", "-="):
            raise ValueError("unexpected stmt op %r in %s" % (op, name))
        rhs = p.parse_expr()
        p.expect(";")
        fb.statement(lhs, op, rhs)

    # Assemble the Python function.
    missing = [k for k in range(n) if k not in fb.outputs]
    if missing:
        raise ValueError("%s: outputs never assigned: %r" % (name, missing))
    lines = []
    pyname = name.replace("od_bin_", "").replace("od_", "")
    lines.append("def %s(x):" % pyname)
    lines.append('    """%s lanes; generated from the normative lifting '
                 'network (reference: src/%s.c)."""' %
                 (n, "dct" if "dct" in name else "filter"))
    ins = sorted(fb.loaded)
    lines.append("    (%s,) = x" % ", ".join("v_IN_%d" % k for k in ins))
    for l in fb.lines:
        lines.append("    " + l)
    lines.append("    return [%s]" %
                 ", ".join(fb.outputs[k] for k in range(n)))
    return "\n".join(lines)


def main():
    dct_text = preprocess(os.path.join(REF, "src", "dct.c"))
    filt_text = preprocess(os.path.join(REF, "src", "filter.c"))
    chunks = [
        '"""Lane-wise lifting kernels extracted from the normative Daala',
        "transform specification (reference: src/dct.c, src/filter.c; see",
        "doc/ietf/ drafts).  GENERATED by tools/gen_lifting.py -- do not edit.",
        "",
        "Each function maps a list of N int32 arrays (lane k = coefficient k",
        "of every block in the batch) to a list of N int32 arrays.  All ops",
        "are elementwise, so these run under numpy, jax.numpy, and inside",
        "Pallas TPU kernels unchanged.",
        '"""',
        "",
        "from daala_tpu.ops.intrin import dct_rshift, c_div",
        "",
    ]
    for fn in DCT_FUNCS:
        chunks.append(build_function(dct_text, fn))
        chunks.append("")
    for fn in FILTER_FUNCS:
        chunks.append(build_function(filt_text, fn))
        chunks.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(chunks))
    print("wrote %s" % os.path.normpath(OUT))


if __name__ == "__main__":
    main()
