#!/usr/bin/env python3
"""Run the reference Platypus (py3 harness build) — a thin launcher that
restores the py2 builtins the Cython-0.20 modules expect, then hands over
to the reference's own Platypus.py main.

Usage: python3 run_reference.py <build_dir>/Platypus_0.8.1 callVariants ...
"""

import builtins
import os
import sys

# py2 aliases the frozen Cython modules / drivers reference at init.
builtins.StandardError = Exception
builtins.basestring = (str, bytes)
builtins.unicode = str
builtins.long = int
builtins.xrange = range
if not hasattr(builtins, "cmp"):
    builtins.cmp = lambda a, b: (a > b) - (a < b)

# py2 round(): correctly-rounded HALF-AWAY-FROM-ZERO on the exact binary
# value, always returning float.  py3's banker's round would silently
# shift boundary values (e.g. BRF = 1/8 -> 0.12 instead of 0.13).
_py3_round = round


def _py2_round(x, ndigits=0):
    from decimal import ROUND_HALF_UP, Decimal

    try:
        q = Decimal(1).scaleb(-ndigits)
        return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))
    except Exception:
        return _py3_round(x, ndigits)


builtins.round = _py2_round

# py2 sorted() any heterogeneous/unorderable objects by type name then
# address; the engine sorts Samfile handles for deterministic iteration.
_py3_sorted = sorted


def _py2_sorted(iterable, **kw):
    items = list(iterable)
    try:
        return _py3_sorted(items, **kw)
    except TypeError:
        key = kw.get("key")
        if key is None:
            return _py3_sorted(items,
                               key=lambda x: (type(x).__name__, id(x)),
                               reverse=kw.get("reverse", False))
        return _py3_sorted(
            items, key=lambda x: (type(key(x)).__name__, id(key(x))),
            reverse=kw.get("reverse", False))


builtins.sorted = _py2_sorted

build_dir = sys.argv[1]
sys.path.insert(0, build_dir)
sys.argv = ["Platypus.py"] + sys.argv[2:]
os.chdir(build_dir)

# fastafile stays a bytes-world module (binary handles + bytes constants
# patched in the generated C); no runtime shims needed for it.

# The runner streams per-process output through gzip temp files; py2's
# gzip accepted str, py3's wants bytes.  Route GzipFile through a latin-1
# text wrapper for every module that resolves gzip via its module dict.
import gzip as _gzip  # noqa: E402
import io as _io  # noqa: E402


class _TextGzip:
    @staticmethod
    def GzipFile(filename=None, mode="rb", compresslevel=9):
        f = _gzip.GzipFile(filename, mode, compresslevel)
        return _io.TextIOWrapper(f, encoding="latin-1", newline="")

    def __getattr__(self, name):
        return getattr(_gzip, name)


import platypusutils  # noqa: E402

platypusutils.gzip = _TextGzip()

# The reference sequence flows as bytes; iterating it yields ints on py3.
# Extend the canonical-base membership set accordingly (py2: 1-char strs).
import vcfutils  # noqa: E402

vcfutils.canonicalBases = (set("ACTG") | set(b"ACTG")
                           | {b"A", b"C", b"T", b"G"})

# trimLeftPadding indexes into ref/alt ([0].upper()) — on py3 bytes that
# yields ints.  Decode to str first; downstream only formats the values.
_orig_tlp = vcfutils.trimLeftPadding


def _trim_left_padding(d):
    if isinstance(d.get("ref"), bytes):
        d["ref"] = d["ref"].decode("latin-1")
    d["alt"] = [a.decode("latin-1") if isinstance(a, bytes) else a
                for a in d.get("alt", [])]
    return _orig_tlp(d)


vcfutils.trimLeftPadding = _trim_left_padding

exec(compile(open("Platypus.py").read(), "Platypus.py", "exec"),
     {"__name__": "__main__", "__file__": "Platypus.py"})
