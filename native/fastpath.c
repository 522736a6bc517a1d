/* wfsim_tpu native host kernels.
 *
 * The reference accelerates its host hot loops with numba (SURVEY s2.3); this
 * framework's host hot loop is different: regrouping the photon pool into
 * padded per-window device inputs (gather + base-time subtraction + float
 * bit-packing).  numpy needs several passes and temporaries for this; the C
 * kernel does it in one pass.
 *
 * Built with setuptools as wfsim_tpu._fastpath; all entry points have numpy
 * fallbacks (wfsim_tpu/native.py) so the package works without compilation.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* pack_windows(pool_t int64[P], pool_ch int32[P], pool_gain_bits int32[P],
 *              piece_lo int64[M], piece_cnt int64[M], piece_win int32[M],
 *              win_base_ns int64[B], out int32[B,3,N])
 *
 * For each piece m: copy pool[lo:lo+cnt] into window piece_win[m]'s next free
 * slots as (t - base, ch, gain_bits).  Pieces must be grouped by window.
 * Returns per-window fill counts as a new int64[B] list.
 */
static PyObject *pack_windows(PyObject *self, PyObject *args) {
    Py_buffer pool_t, pool_ch, pool_g, lo, cnt, win, base, out;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*y*w*",
                          &pool_t, &pool_ch, &pool_g,
                          &lo, &cnt, &win, &base, &out))
        return NULL;

    const int64_t *pt = (const int64_t *)pool_t.buf;
    const int32_t *pc = (const int32_t *)pool_ch.buf;
    const int32_t *pg = (const int32_t *)pool_g.buf;
    const int64_t *plo = (const int64_t *)lo.buf;
    const int64_t *pcnt = (const int64_t *)cnt.buf;
    const int32_t *pwin = (const int32_t *)win.buf;
    const int64_t *pbase = (const int64_t *)base.buf;
    int32_t *po = (int32_t *)out.buf;

    Py_ssize_t n_pieces = lo.len / (Py_ssize_t)sizeof(int64_t);
    Py_ssize_t n_win = base.len / (Py_ssize_t)sizeof(int64_t);
    /* out is (B, 3, N) contiguous int32 */
    Py_ssize_t slot_n = 0;
    if (n_win > 0)
        slot_n = out.len / (Py_ssize_t)sizeof(int32_t) / 3 / n_win;

    int64_t *fill = (int64_t *)calloc((size_t)(n_win > 0 ? n_win : 1),
                                      sizeof(int64_t));
    if (!fill) {
        PyErr_NoMemory();
        goto fail;
    }

    for (Py_ssize_t m = 0; m < n_pieces; m++) {
        int32_t w = pwin[m];
        if (w < 0 || w >= n_win) continue;
        int64_t b = pbase[w];
        int64_t f = fill[w];
        int64_t c = pcnt[m];
        if (f + c > slot_n) c = slot_n - f;   /* clamp overflow */
        const int64_t start = plo[m];
        int32_t *dt = po + ((Py_ssize_t)w * 3 + 0) * slot_n + f;
        int32_t *dc = po + ((Py_ssize_t)w * 3 + 1) * slot_n + f;
        int32_t *dg = po + ((Py_ssize_t)w * 3 + 2) * slot_n + f;
        for (int64_t i = 0; i < c; i++) {
            dt[i] = (int32_t)(pt[start + i] - b);
            dc[i] = pc[start + i];
            dg[i] = pg[start + i];
        }
        fill[w] += c;
    }

    PyObject *res = PyList_New(n_win);
    if (!res) { free(fill); goto fail; }
    for (Py_ssize_t i = 0; i < n_win; i++)
        PyList_SET_ITEM(res, i, PyLong_FromLongLong((long long)fill[i]));
    free(fill);

    PyBuffer_Release(&pool_t); PyBuffer_Release(&pool_ch);
    PyBuffer_Release(&pool_g); PyBuffer_Release(&lo);
    PyBuffer_Release(&cnt); PyBuffer_Release(&win);
    PyBuffer_Release(&base); PyBuffer_Release(&out);
    return res;

fail:
    PyBuffer_Release(&pool_t); PyBuffer_Release(&pool_ch);
    PyBuffer_Release(&pool_g); PyBuffer_Release(&lo);
    PyBuffer_Release(&cnt); PyBuffer_Release(&win);
    PyBuffer_Release(&base); PyBuffer_Release(&out);
    return NULL;
}

/* find_intervals_below_threshold(w int64[T], threshold, holdoff,
 *                                 result int64[K,2]) -> n_intervals
 * Sequential ZLE hitfinder with the reference's exact semantics
 * (reference: wfsim/utils.py:14-58) — used for host-side verification and
 * as the oracle in tests without numba.
 */
static PyObject *find_intervals(PyObject *self, PyObject *args) {
    Py_buffer wbuf, rbuf;
    long long threshold, holdoff;
    if (!PyArg_ParseTuple(args, "y*LLw*", &wbuf, &threshold, &holdoff, &rbuf))
        return NULL;
    const int64_t *w = (const int64_t *)wbuf.buf;
    int64_t *res = (int64_t *)rbuf.buf;
    Py_ssize_t T = wbuf.len / (Py_ssize_t)sizeof(int64_t);
    Py_ssize_t K = rbuf.len / (Py_ssize_t)(2 * sizeof(int64_t));

    int in_interval = 0;
    Py_ssize_t cur = 0, start = -1, end = -1;
    for (Py_ssize_t i = 0; i < T; i++) {
        if (w[i] < threshold) {
            if (!in_interval) { in_interval = 1; start = i; }
            end = i;
        }
        if (in_interval &&
            ((i == T - 1) || (w[i] >= threshold && i >= end + holdoff))) {
            in_interval = 0;
            if (cur < K) {
                res[2 * cur] = start;
                res[2 * cur + 1] = end;
                cur++;
            } else {
                break;
            }
        }
    }
    PyBuffer_Release(&wbuf);
    PyBuffer_Release(&rbuf);
    return PyLong_FromSsize_t(cur);
}

static PyMethodDef methods[] = {
    {"pack_windows", pack_windows, METH_VARARGS,
     "Fused photon-pool gather into padded per-window device inputs"},
    {"find_intervals_below_threshold", find_intervals, METH_VARARGS,
     "Sequential ZLE hitfinder (reference semantics)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpath",
    "wfsim_tpu native host kernels", -1, methods,
};

PyMODINIT_FUNC PyInit__fastpath(void) {
    return PyModule_Create(&moduledef);
}
