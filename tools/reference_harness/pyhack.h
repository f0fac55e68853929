/* Py3.12 compatibility shims for the reference release's Cython-0.20-era
 * generated C (force-included via -include).  The generated code was
 * dual-target (py2/py3) but predates CPython 3.11+'s conversion of
 * Py_SIZE/Py_REFCNT/Py_TYPE into non-lvalue inline functions and the
 * removal of a few unicode macros; these restore the old public struct
 * spellings, which remain ABI-valid.
 */
#ifndef PLATYPUS_REF_PYHACK_H
#define PLATYPUS_REF_PYHACK_H

#include <Python.h>

/* Old lvalue spellings (still-valid direct struct access). */
#undef Py_REFCNT
#define Py_REFCNT(ob) (((PyObject *)(ob))->ob_refcnt)
#undef Py_TYPE
#define Py_TYPE(ob) (((PyObject *)(ob))->ob_type)
#undef Py_SIZE
#define Py_SIZE(ob) (((PyVarObject *)(ob))->ob_size)

/* Removed in 3.12; the generated code only uses them on ready strings. */
#ifndef PyUnicode_GET_SIZE
#define PyUnicode_GET_SIZE(u) PyUnicode_GetLength((PyObject *)(u))
#endif
#ifndef PyUnicode_GET_DATA_SIZE
#define PyUnicode_GET_DATA_SIZE(u) PyUnicode_GetLength((PyObject *)(u))
#endif

/* tp_print was removed in 3.9; the generated module inits zero it by
 * name.  tp_vectorcall_offset sits in the old slot and zeroing it is the
 * default, so the classic rename shim is safe. */
#define tp_print tp_vectorcall_offset

/* Cython 0.20's traceback helper builds a full code object through
 * PyCode_New with the pre-3.8 15-argument signature.  The object is only
 * used for traceback display, so a PyCode_NewEmpty carrying
 * filename/name/line is behaviour-preserving. */
static inline PyCodeObject *PyxCompat_PyCode_New15(
    int a, int k, int l, int s, int f, PyObject *code, PyObject *c,
    PyObject *n, PyObject *v, PyObject *fv, PyObject *cell, PyObject *fn,
    PyObject *name, int fline, PyObject *lnos)
{
    const char *fns = (fn && PyUnicode_Check(fn)) ? PyUnicode_AsUTF8(fn) : NULL;
    const char *nms = (name && PyUnicode_Check(name)) ? PyUnicode_AsUTF8(name) : NULL;
    (void)a; (void)k; (void)l; (void)s; (void)f; (void)code; (void)c;
    (void)n; (void)v; (void)fv; (void)cell; (void)lnos;
    return PyCode_NewEmpty(fns ? fns : "<ref>", nms ? nms : "<fn>", fline);
}
#define PyCode_New PyxCompat_PyCode_New15

/* py2 bytes(str) semantics (bytes IS str there): the frozen modules call
 * bytes(...) on join() results at init.  Route the constructor through a
 * shim that latin-1-encodes single str arguments (all inputs are chr()
 * values < 256 by construction) and forwards everything else. */
static PyObject *PyxCompat_bytes_call_impl(PyObject *self, PyObject *args)
{
    (void)self;
    if (args && PyTuple_Check(args) && PyTuple_GET_SIZE(args) == 1) {
        PyObject *o = PyTuple_GET_ITEM(args, 0);
        if (PyUnicode_Check(o))
            return PyUnicode_AsLatin1String(o);
    }
    return PyObject_Call((PyObject *)&PyBytes_Type, args, NULL);
}

/* Since 3.9 PyCFunction_Call aliases PyObject_Call, so Cython 0.20's
 * __Pyx_CyFunction_Call (whose CPython branch is just PyCFunction_Call on
 * itself) recurses through its own tp_call forever.  Dispatch directly on
 * the method def instead — the same logic the generated PyPy branch uses. */
static PyObject *PyxCompat_CFunction_Call(PyObject *func, PyObject *arg,
                                          PyObject *kw)
{
    PyCFunctionObject *f = (PyCFunctionObject *)func;
    PyCFunction meth = f->m_ml->ml_meth;
    PyObject *self = f->m_self;
    int flags = f->m_ml->ml_flags & ~(METH_CLASS | METH_STATIC | METH_COEXIST);
    Py_ssize_t size;
    if (flags == (METH_VARARGS | METH_KEYWORDS))
        return (*(PyCFunctionWithKeywords)(void *)meth)(self, arg, kw);
    if (kw == NULL || PyDict_Size(kw) == 0) {
        switch (flags) {
        case METH_VARARGS:
            return (*meth)(self, arg);
        case METH_NOARGS:
            size = PyTuple_GET_SIZE(arg);
            if (size == 0) return (*meth)(self, NULL);
            PyErr_Format(PyExc_TypeError,
                         "%.200s() takes no arguments (%zd given)",
                         f->m_ml->ml_name, size);
            return NULL;
        case METH_O:
            size = PyTuple_GET_SIZE(arg);
            if (size == 1) return (*meth)(self, PyTuple_GET_ITEM(arg, 0));
            PyErr_Format(PyExc_TypeError,
                         "%.200s() takes exactly one argument (%zd given)",
                         f->m_ml->ml_name, size);
            return NULL;
        default:
            PyErr_SetString(PyExc_SystemError, "bad call flags");
            return NULL;
        }
    }
    PyErr_Format(PyExc_TypeError, "%.200s() takes no keyword arguments",
                 f->m_ml->ml_name);
    return NULL;
}
#undef PyCFunction_Call
#define PyCFunction_Call PyxCompat_CFunction_Call

/* py2 str.join semantics: ''.join over bytes parts produced bytes (str
 * WAS bytes).  Dispatch on the item types: all-bytes joins as bytes
 * (latin-1 separator), mixed joins decode bytes latin-1 and join as str,
 * all-str joins normally. */
static PyObject *PyxCompat_StrJoin(PyObject *sep, PyObject *values)
{
    PyObject *seq = PySequence_Fast(values, "join requires a sequence");
    PyObject *res = NULL;
    Py_ssize_t n, i;
    int has_bytes = 0, has_str = 0;
    if (!seq) return NULL;
    n = PySequence_Fast_GET_SIZE(seq);
    for (i = 0; i < n; i++) {
        PyObject *it = PySequence_Fast_GET_ITEM(seq, i);
        if (PyBytes_Check(it) || PyLong_Check(it)) has_bytes = 1;
        else if (PyUnicode_Check(it)) has_str = 1;
    }
    /* iterating bytes gives ints on py3 (py2: 1-char strs) — treat int
     * items as single latin-1 characters of the bytes world. */
    if (has_bytes && !has_str) {
        PyObject *list = PyList_New(n);
        if (list) {
            for (i = 0; i < n; i++) {
                PyObject *it = PySequence_Fast_GET_ITEM(seq, i);
                PyObject *conv;
                if (PyLong_Check(it)) {
                    long v = PyLong_AsLong(it);
                    char c = (char)v;
                    conv = (v >= 0 && v < 256) ? PyBytes_FromStringAndSize(&c, 1)
                                               : NULL;
                    if (!conv && !PyErr_Occurred())
                        PyErr_SetString(PyExc_ValueError,
                                        "join: int item out of byte range");
                } else {
                    Py_INCREF(it);
                    conv = it;
                }
                if (!conv) { Py_DECREF(list); list = NULL; break; }
                PyList_SET_ITEM(list, i, conv);
            }
            if (list) {
                PyObject *bsep;
                if (PyUnicode_Check(sep)) bsep = PyUnicode_AsLatin1String(sep);
                else { Py_INCREF(sep); bsep = sep; }
                if (bsep) {
                    res = PyObject_CallMethod(bsep, "join", "O", list);
                    Py_DECREF(bsep);
                }
                Py_DECREF(list);
            }
        }
    } else if (has_bytes) {
        PyObject *list = PyList_New(n);
        if (list) {
            for (i = 0; i < n; i++) {
                PyObject *it = PySequence_Fast_GET_ITEM(seq, i);
                PyObject *conv;
                if (PyBytes_Check(it))
                    conv = PyUnicode_DecodeLatin1(PyBytes_AS_STRING(it),
                                                  PyBytes_GET_SIZE(it), NULL);
                else if (PyLong_Check(it)) {
                    long v = PyLong_AsLong(it);
                    Py_UCS4 c = (Py_UCS4)v;
                    conv = (v >= 0 && v < 256)
                               ? PyUnicode_FromOrdinal((int)c) : NULL;
                } else { Py_INCREF(it); conv = it; }
                if (!conv) { Py_DECREF(list); list = NULL; break; }
                PyList_SET_ITEM(list, i, conv);
            }
            if (list) {
                res = PyUnicode_Join(sep, list);
                Py_DECREF(list);
            }
        }
    } else {
        res = PyUnicode_Join(sep, seq);
    }
    Py_DECREF(seq);
    return res;
}

static PyObject *PyxCompat_bytes_ctor(void)
{
    static PyObject *fn = NULL;
    static PyMethodDef def = {"bytes2", (PyCFunction)PyxCompat_bytes_call_impl,
                              METH_VARARGS, NULL};
    if (!fn)
        fn = PyCFunction_New(&def, NULL);
    return fn;
}

#endif
