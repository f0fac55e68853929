#!/usr/bin/env python3
"""Patch the reference release's Cython-0.20-generated C for CPython 3.12.

Three mechanical, behaviour-preserving rewrites (applied to the extracted
release copy in the build directory, never to /root/reference):

1. `#if CYTHON_COMPILING_IN_CPYTHON` blocks that poke the pre-3.12
   PyThreadState exception fields (curexc_* / exc_*) become `#if 0`, so
   the generated code's own PORTABLE #else branch (PyErr_Fetch/Restore &
   friends) compiles instead.  Only blocks touching those fields flip;
   every such block in the 0.8.1 release carries an #else.
2. `py_frame->f_lineno = __pyx_lineno;` in the traceback helper is
   dropped (PyFrameObject is opaque in 3.11+); tracebacks lose the line
   number, nothing else.
3. The remaining shims (tp_print, 15-arg PyCode_New, lvalue
   Py_SIZE/REFCNT/TYPE) live in pyhack.h, force-included by the build.
"""

import os
import re
import sys


def flip_private_exc_blocks(text: str) -> str:
    lines = text.split("\n")
    out = list(lines)
    i = 0
    while i < len(lines):
        if lines[i].strip().startswith("#if CYTHON_COMPILING_IN_CPYTHON"):
            depth = 1
            j = i + 1
            body = []
            while j < len(lines) and depth:
                s = lines[j].strip()
                if s.startswith("#if"):
                    depth += 1
                elif s.startswith("#endif"):
                    depth -= 1
                if depth:
                    body.append(lines[j])
                j += 1
            t = "\n".join(body)
            if re.search(r"curexc_|->exc_type|->exc_value|->exc_traceback", t):
                out[i] = "#if 0 /* py3.12: use the portable branch */"
            i = j
        else:
            i += 1
    return "\n".join(out)


def flip_pypy_else_blocks(text: str) -> str:
    """`#if CYTHON_COMPILING_IN_PYPY` guards whose ELSE branch pokes the
    private frame/exception fields flip to `#if 1`, compiling the
    PyPy-portable branch (empty for the generator f_back linking, a
    PyErr_Fetch/Restore round-trip in __Pyx_Raise)."""
    lines = text.split("\n")
    out = list(lines)
    i = 0
    while i < len(lines):
        if lines[i].strip().startswith("#if CYTHON_COMPILING_IN_PYPY"):
            depth = 1
            j = i + 1
            else_at = None
            while j < len(lines) and depth:
                s = lines[j].strip()
                if s.startswith("#if"):
                    depth += 1
                elif s.startswith("#endif"):
                    depth -= 1
                elif s.startswith("#else") and depth == 1:
                    else_at = j
                j += 1
            if else_at is not None:
                t = "\n".join(lines[else_at:j])
                if re.search(r"tstate->frame|tb_frame|curexc_", t):
                    out[i] = "#if 1 /* py3.12: use the PyPy-portable branch */"
            i = j
        else:
            i += 1
    return "\n".join(out)


# Literal values whose frozen constants must be BYTES (py2-str semantics)
# in each module.  Grown iteratively during bring-up: every entry fixed an
# observed bytes-vs-str TypeError (or a silent-comparison hazard next to
# one).
BYTES_CONSTANTS = {
    "fastafile.c": ["\t", "|", "\n", "", "gi|", "ref"],
    "variant.c": ["N"],
    # ctabix: char* filename (bytes) + ".tbi"; region strings built from
    # bytes contig names.
    "ctabix.c": [".tbi", ":", "-", ""],
}


def _c_escape(value: str) -> str:
    out = []
    for ch in value:
        if ch == "\t":
            out.append("\\t")
        elif ch == "\n":
            out.append("\\n")
        elif ch in "\\\"":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def flip_constants_to_bytes(text: str, values) -> str:
    # map literal value -> constant symbol via the declarations
    decls = dict(re.findall(r"static char (__pyx_k_?\w*)\[\] = \"((?:[^\"\\]|\\.)*)\";",
                            text))
    by_value = {}
    for name, val in decls.items():
        by_value.setdefault(val, []).append(name)
    for value in values:
        for name in by_value.get(_c_escape(value), []):
            # flip every table entry built on this k-constant
            text = re.sub(
                r"\{&(__pyx_(?:kp|n)_[sub]\w*), " + re.escape(name) +
                r", sizeof\(" + re.escape(name) + r"\), 0, 0, 1, [01]\},",
                lambda m: "{&%s, %s, sizeof(%s), 0, 0, 0, 0}," %
                          (m.group(1), name, name),
                text)
    return text


def main(paths):
    for path in paths:
        text = open(path).read()
        orig = text
        text = flip_private_exc_blocks(text)
        text = flip_pypy_else_blocks(text)
        # The 0.20-era __Pyx_Raise PyPy branch has a missing-& bug (it was
        # never compiled upstream); fix it so the flipped guard builds.
        text = text.replace(
            "PyErr_Fetch(tmp_type, tmp_value, tmp_tb);",
            "PyErr_Fetch(&tmp_type, &tmp_value, &tmp_tb);")
        # ctabix/TabProxies were generated by an older Cython whose
        # __Pyx_Raise pokes curexc_traceback with NO guard at all —
        # replace the block with the public-API equivalent.
        text = text.replace(
            """    if (tb) {
        PyThreadState *tstate = PyThreadState_GET();
        PyObject* tmp_tb = tstate->curexc_traceback;
        if (tb != tmp_tb) {
            Py_INCREF(tb);
            tstate->curexc_traceback = tb;
            Py_XDECREF(tmp_tb);
        }
    }""",
            """    if (tb) {
        PyObject *pxc_t, *pxc_v, *pxc_tb;
        PyErr_Fetch(&pxc_t, &pxc_v, &pxc_tb);
        Py_INCREF(tb);
        PyErr_Restore(pxc_t, pxc_v, tb);
        Py_XDECREF(pxc_tb);
    }""")
        # The vendored pysam modules treat py2 str as the byte-field type
        # (VCFProxy's field map applies str() to raw C fields).  On py3
        # their py3-compat block maps PyString_Type to PyUnicode_Type,
        # which turns fields into "b'...'" reprs — map it to PyBytes_Type
        # instead (py2 str IS bytes).
        if os.path.basename(path) in ("TabProxies.c", "ctabix.c"):
            text = text.replace(
                "#define PyString_Type                PyUnicode_Type",
                "#define PyString_Type                PyBytes_Type")
        # builtins.bool is variable-size in 3.12 (PyLong-backed):
        # tp_basicsize no longer matches sizeof(PyBoolObject).  The
        # imported type object is only used for argument type checks, so
        # skip the size validation entirely.
        text = text.replace(
            '"bool", sizeof(PyBoolObject), 0)',
            '"bool", 0, 0)')
        text = text.replace(
            '"bool", sizeof(PyBoolObject), 1)',
            '"bool", 0, 0)')
        # py2 bytes(str) at module init: route through the latin-1 shim
        # (pyhack.h PyxCompat_bytes_ctor).
        text = text.replace(
            "((PyObject *)((PyObject*)(&PyBytes_Type)))",
            "PyxCompat_bytes_ctor()")
        # py2 ran with str==bytes.  The py3 world that fits the frozen
        # code: char*->object stays BYTES (__Pyx_PyObject_FromString is
        # unconditionally PyBytes in this release, so sequences/names keep
        # their declared bytes types), while object->char* must ALSO accept
        # str (region strings, modes, filenames are formatted as str in the
        # py layer): IS_DEFAULT=1 turns on exactly that acceptance.
        text = text.replace(
            "#define __PYX_DEFAULT_STRING_ENCODING_IS_DEFAULT 0",
            "#define __PYX_DEFAULT_STRING_ENCODING_IS_DEFAULT 1")
        # ...except __Pyx_PyStr_* creation (py3 branch makes str) is used
        # for %-format results etc, which is fine.  str.join over bytes
        # parts (py2: produced str==bytes) goes through the smart shim.
        text = text.replace(
            "#define __Pyx_PyString_Join PyUnicode_Join",
            "#define __Pyx_PyString_Join PyxCompat_StrJoin")
        text = text.replace(
            "#define __Pyx_PyBaseString_Join PyUnicode_Join",
            "#define __Pyx_PyBaseString_Join PyxCompat_StrJoin")
        # The engine's data plane is bytes (py2 str == bytes), but its
        # literal constants were frozen as py2 str -> py3 unicode, so
        # bytes.split(str)/bytes.endswith(str) raise.  Flip the affected
        # constants' string-table entries to bytes (is_str/intern -> 0),
        # per module, by literal VALUE.
        flips = BYTES_CONSTANTS.get(os.path.basename(path))
        if flips:
            text = flip_constants_to_bytes(text, flips)
        text = text.replace(
            "py_frame->f_lineno = __pyx_lineno;",
            "(void)__pyx_lineno; /* py3.12: PyFrameObject is opaque */")
        text = text.replace(
            "py_frame->f_lineno = py_line;",
            "(void)py_line; /* py3.12: PyFrameObject is opaque */")
        if text != orig:
            open(path, "w").write(text)
            print(f"patched {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
