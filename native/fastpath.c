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

    /* pure buffer work below — release the GIL so a worker-thread caller
     * overlaps with the main thread's blocking device fetches */
    Py_BEGIN_ALLOW_THREADS
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
    Py_END_ALLOW_THREADS

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
    Py_BEGIN_ALLOW_THREADS
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
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&wbuf);
    PyBuffer_Release(&rbuf);
    return PyLong_FromSsize_t(cur);
}

/* decode_records_noise(mask4 uint8[R,4], mask_esc uint8[Em,14],
 *                      d8 int8[V], escs int16[E],
 *                      lengths int32[R], out bytes, baseline,
 *                      channel int32[R], start_s int64[R], left_ch int64[R],
 *                      nix int32[R], ext int16[Cn, L+110], L,
 *                      rowmap int64[R] (len 0 = identity),
 *                      row_pitch bytes, data_off bytes)
 * -> (values_used, escapes_used)
 *
 * Masks arrive in the compact wire form (pipeline/digitize.py
 * compact_mask4): per record 4 bytes (start1, len1, start2, len2) naming
 * up to two contiguous masked runs; start1 == 255 escapes to the next
 * full 14-byte bitmask of the mask_esc side stream (record order).
 *
 * Record r's 110 int16 samples are written at
 * out + data_off + rowmap[r] * row_pitch — passing the final structured
 * record array (itemsize pitch, 'data' field offset) as ``out`` with the
 * sort permutation as ``rowmap`` scatters decoded rows straight into
 * their time-sorted slots, skipping the dense temp + concat + permuted
 * gather the split stage otherwise pays (~3 extra full-payload passes).
 *
 * Fused host decode of the residual record transport (the numpy
 * reference path is decode_records + add_noise_host in
 * wfsim_tpu/pipeline/digitize.py): per record, rebuild the predicted row
 * (baseline inside the pulse, zero in the tail pad), walk the 110-bit
 * difference mask consuming the global DPCM int8 stream (chain seeded at
 * baseline per record; -128 escapes rebase from the int16 escape stream),
 * then re-add the noise-bank overlay for bank-covered channels.  One pass,
 * no temporaries — the numpy path needs ~6 full-size passes (unpackbits,
 * cumsum, repeat, fancy assignment, noise gather, masked add).
 *
 * Pass L == 0 to skip the noise overlay (ext may then be empty).
 * Arithmetic matches numpy exactly: the DPCM chain runs in int32 and
 * truncates to int16 on store; the noise add wraps in int16.
 *
 * Optional header fill (hdr_time non-empty): the strax record header
 * fields are written into each destination row during the same pass —
 * hdr_time int64[R], hdr_plen int32[R], hdr_reci int32[R] (stream
 * order), hdr_offs int64[7] = (off_time, off_length, off_dt,
 * off_channel, off_plen, off_reci, dt_value).  ``chan`` must then be
 * length R even when the noise overlay is off.  This replaces six
 * strided structured-array passes on the host (each re-touching every
 * 244-byte record row) with stores into rows the decode already owns.
 */
static PyObject *decode_records_noise(PyObject *self, PyObject *args) {
    Py_buffer masks, mesc, d8, escs, lens, out, chan, start, left, nix, ext,
        rowmap, hdr_time, hdr_plen, hdr_reci, hdr_offs;
    long long baseline, L, row_pitch, data_off;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*w*Ly*y*y*y*y*Ly*LLy*y*y*y*",
                          &masks, &mesc, &d8, &escs, &lens, &out, &baseline,
                          &chan, &start, &left, &nix, &ext, &L,
                          &rowmap, &row_pitch, &data_off,
                          &hdr_time, &hdr_plen, &hdr_reci, &hdr_offs))
        return NULL;
    const uint8_t *pm = (const uint8_t *)masks.buf;
    const uint8_t *pme = (const uint8_t *)mesc.buf;
    const int8_t *pd = (const int8_t *)d8.buf;
    const int16_t *pe = (const int16_t *)escs.buf;
    const int32_t *pl = (const int32_t *)lens.buf;
    uint8_t *pob = (uint8_t *)out.buf;
    const int64_t *prm = rowmap.len ? (const int64_t *)rowmap.buf : NULL;
    const int32_t *pch = (const int32_t *)chan.buf;
    const int64_t *pst = (const int64_t *)start.buf;
    const int64_t *plf = (const int64_t *)left.buf;
    const int32_t *pnx = (const int32_t *)nix.buf;
    const int16_t *pext = (const int16_t *)ext.buf;

    Py_ssize_t R = lens.len / (Py_ssize_t)sizeof(int32_t);
    Py_ssize_t V = d8.len;                 /* int8: len == count */
    Py_ssize_t E = escs.len / (Py_ssize_t)sizeof(int16_t);
    const int64_t *pht = hdr_time.len ? (const int64_t *)hdr_time.buf : NULL;
    const int32_t *php = (const int32_t *)hdr_plen.buf;
    const int32_t *phr = (const int32_t *)hdr_reci.buf;
    const int64_t *po7 = (const int64_t *)hdr_offs.buf;
    if (pht && (hdr_time.len < R * (Py_ssize_t)sizeof(int64_t)
                || hdr_plen.len < R * (Py_ssize_t)sizeof(int32_t)
                || hdr_reci.len < R * (Py_ssize_t)sizeof(int32_t)
                || hdr_offs.len < 7 * (Py_ssize_t)sizeof(int64_t)
                || chan.len < R * (Py_ssize_t)sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError, "header buffer size mismatch");
        goto fail;
    }
    Py_ssize_t Cn = 0, extw = 0;
    if (L > 0) {
        extw = L + 110;
        Cn = ext.len / (Py_ssize_t)sizeof(int16_t) / extw;
    }
    if (row_pitch < 110 * (Py_ssize_t)sizeof(int16_t))
        row_pitch = 110 * (Py_ssize_t)sizeof(int16_t);
    if ((prm == NULL
         && out.len < data_off + R * row_pitch) ||
        masks.len < R * 4 ||
        (prm != NULL && rowmap.len < R * (Py_ssize_t)sizeof(int64_t))) {
        PyErr_SetString(PyExc_ValueError, "decode buffer size mismatch");
        goto fail;
    }
    Py_ssize_t Em = mesc.len / 14;
    Py_ssize_t max_dest;
    if (pht) {
        /* header stores touch the whole row — require full rows */
        max_dest = out.len / row_pitch;
    } else {
        max_dest = (out.len - data_off) / row_pitch;
        if ((out.len - data_off) % row_pitch
            >= 110 * (Py_ssize_t)sizeof(int16_t))
            max_dest += 1;   /* a trailing partial pitch still fits one row */
    }

    Py_ssize_t vi = 0, ei = 0, mi = 0;
    int err = 0;   /* 1 = DPCM overrun, 2 = escape overrun, 3 = rowmap,
                      4 = mask-escape overrun */
    /* hot loop runs without the GIL (error reporting via flag) so a
     * worker-thread decode overlaps the main thread's blocking fetches */
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t r = 0; r < R && !err; r++) {
        const uint8_t *q = pm + r * 4;
        Py_ssize_t dest = prm ? (Py_ssize_t)prm[r] : r;
        if (dest < 0 || dest >= max_dest) { err = 3; break; }
        int16_t *o = (int16_t *)(pob + data_off + dest * row_pitch);
        if (pht) {
            /* strax header fields, same row the sample decode owns
             * (memcpy: rows are only 2-byte aligned in general) */
            uint8_t *row = pob + dest * row_pitch;
            int64_t t = pht[r];
            int32_t ln = pl[r], pln = php[r];
            int16_t dtv = (int16_t)po7[6], ch16 = (int16_t)pch[r];
            int16_t ri16 = (int16_t)phr[r];
            memcpy(row + po7[0], &t, 8);
            memcpy(row + po7[1], &ln, 4);
            memcpy(row + po7[2], &dtv, 2);
            memcpy(row + po7[3], &ch16, 2);
            memcpy(row + po7[4], &pln, 4);
            memcpy(row + po7[5], &ri16, 2);
        }
        int32_t len = pl[r];
        int32_t v = (int32_t)baseline;
        if (q[0] == 255) {
            /* escaped record: full 14-byte bitmask from the side stream */
            if (mi >= Em) { err = 4; break; }
            const uint8_t *m = pme + (mi++) * 14;
            for (int k = 0; k < 110; k++) {
                int32_t pred = (k < len) ? (int32_t)baseline : 0;
                if (m[k >> 3] & (uint8_t)(0x80u >> (k & 7))) {
                    if (vi >= V) { err = 1; break; }
                    int8_t d = pd[vi++];
                    if (d == -128) {
                        if (ei >= E) { err = 2; break; }
                        v = (int32_t)pe[ei++];
                    } else {
                        v += (int32_t)d;
                    }
                    o[k] = (int16_t)(uint16_t)(uint32_t)v;
                } else {
                    o[k] = (int16_t)pred;
                }
            }
        } else {
            /* common form: predicted row, then <=2 masked runs decoded
             * in place (run order == ascending position == the DPCM
             * stream order of the bitmask walk) */
            int lim = len < 110 ? (len < 0 ? 0 : len) : 110;
            int k = 0;
            for (; k < lim; k++) o[k] = (int16_t)baseline;
            for (; k < 110; k++) o[k] = 0;
            int e1 = q[0] + q[1], e2 = q[2] + q[3];
            if (e1 > 110) e1 = 110;
            if (e2 > 110) e2 = 110;
            for (int pass = 0; pass < 2 && !err; pass++) {
                int ks = pass ? q[2] : q[0];
                int ke = pass ? e2 : e1;
                for (k = ks; k < ke; k++) {
                    if (vi >= V) { err = 1; break; }
                    int8_t d = pd[vi++];
                    if (d == -128) {
                        if (ei >= E) { err = 2; break; }
                        v = (int32_t)pe[ei++];
                    } else {
                        v += (int32_t)d;
                    }
                    o[k] = (int16_t)(uint16_t)(uint32_t)v;
                }
            }
        }
        if (err)
            break;
        if (L > 0 && len > 0 && pch[r] >= 0 && pch[r] < Cn) {
            int64_t s0 = (pnx[r] + pst[r] - plf[r]) % L;
            if (s0 < 0) s0 += L;
            const int16_t *nrow = pext + (Py_ssize_t)pch[r] * extw + s0;
            int kmax = len < 110 ? len : 110;
            for (int k = 0; k < kmax; k++)
                o[k] = (int16_t)(uint16_t)((uint16_t)o[k]
                                           + (uint16_t)nrow[k]);
        }
    }
    Py_END_ALLOW_THREADS
    if (err) {
        PyErr_SetString(PyExc_ValueError,
                        err == 1 ? "DPCM stream overrun"
                        : err == 2 ? "escape stream overrun"
                        : err == 3 ? "rowmap destination out of range"
                                   : "mask-escape stream overrun");
        goto fail;
    }

    PyBuffer_Release(&masks); PyBuffer_Release(&mesc);
    PyBuffer_Release(&d8); PyBuffer_Release(&escs);
    PyBuffer_Release(&lens); PyBuffer_Release(&out); PyBuffer_Release(&chan);
    PyBuffer_Release(&start); PyBuffer_Release(&left); PyBuffer_Release(&nix);
    PyBuffer_Release(&ext); PyBuffer_Release(&rowmap);
    PyBuffer_Release(&hdr_time); PyBuffer_Release(&hdr_plen);
    PyBuffer_Release(&hdr_reci); PyBuffer_Release(&hdr_offs);
    return Py_BuildValue("(nn)", (Py_ssize_t)vi, (Py_ssize_t)ei);

fail:
    PyBuffer_Release(&masks); PyBuffer_Release(&mesc);
    PyBuffer_Release(&d8); PyBuffer_Release(&escs);
    PyBuffer_Release(&lens); PyBuffer_Release(&out); PyBuffer_Release(&chan);
    PyBuffer_Release(&start); PyBuffer_Release(&left); PyBuffer_Release(&nix);
    PyBuffer_Release(&ext); PyBuffer_Release(&rowmap);
    PyBuffer_Release(&hdr_time); PyBuffer_Release(&hdr_plen);
    PyBuffer_Release(&hdr_reci); PyBuffer_Release(&hdr_offs);
    return NULL;
}

static PyMethodDef methods[] = {
    {"pack_windows", pack_windows, METH_VARARGS,
     "Fused photon-pool gather into padded per-window device inputs"},
    {"find_intervals_below_threshold", find_intervals, METH_VARARGS,
     "Sequential ZLE hitfinder (reference semantics)"},
    {"decode_records_noise", decode_records_noise, METH_VARARGS,
     "Fused residual-record decode: DPCM + escapes + noise overlay"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpath",
    "wfsim_tpu native host kernels", -1, methods,
};

PyMODINIT_FUNC PyInit__fastpath(void) {
    return PyModule_Create(&moduledef);
}
