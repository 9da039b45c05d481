// Batched banded affine-gap extension (ksw2-extz semantics) — native core.
//
// Scalar C++ port of mmseqs2_tpu/align/ksw2.py::extz2 (which reproduces the
// observable behavior of the reference's vendored ksw_extz2_sse, including
// its banding/rounding quirks — see that file's docstring). One pair per
// OpenMP task; exact same arithmetic as the Python oracle, cross-checked in
// tests/test_ksw2_batch.py.
//
// Build (done lazily by align/ksw2.py):
//   g++ -O2 -fopenmp -shared -fPIC native/ksw2_batch.cpp -o ksw2_batch.so
//
// C ABI:
//   extz2_batch_c(qcat, qoff, tcat, toff, B, mat, m, q, e, w, zdrop, flag,
//                 out_scalar[B*9], cigar_out[cap*2], cigar_off[B+1], cap)
//   returns 0, or -1 if cigar_out is too small (caller retries bigger).
//   out_scalar row: max, max_q, max_t, mqe, mqe_t, mte, mte_q, score,
//                   zdropped.

#include <cstdint>
#include <cstring>
#include <vector>

static const int64_t KSW_NEG_INF = -0x40000000;
static const int SCORE_ONLY = 0x01;
static const int EXTZ_ONLY = 0x40;

struct Ez {
    int64_t max = 0, max_q = -1, max_t = -1;
    int64_t mqe = KSW_NEG_INF, mqe_t = -1;
    int64_t mte = KSW_NEG_INF, mte_q = -1;
    int64_t score = KSW_NEG_INF;
    int64_t zdropped = 0;
};

static bool apply_zdrop(Ez &ez, int64_t H, int64_t r, int64_t t,
                        int64_t zdrop, int64_t e) {
    if (H > ez.max) {
        ez.max = H;
        ez.max_t = t;
        ez.max_q = r - t;
    } else if (t >= ez.max_t && r - t >= ez.max_q) {
        int64_t tl = t - ez.max_t, ql = (r - t) - ez.max_q;
        int64_t l = tl > ql ? tl - ql : ql - tl;
        if (zdrop >= 0 && ez.max - H > zdrop + l * e) {
            ez.zdropped = 1;
            return true;
        }
    }
    return false;
}

static void push_cigar(std::vector<int64_t> &cig, int op, int64_t len) {
    if (!cig.empty() && (int)(cig[cig.size() - 2]) == op)
        cig[cig.size() - 1] += len;
    else {
        cig.push_back(op);
        cig.push_back(len);
    }
}

// ksw_backtrack, is_rot=1 is_rev=0 with_N=0 (mirrors ksw2.py::_backtrack)
static void backtrack(const std::vector<std::vector<int8_t>> &p_rows,
                      const std::vector<int64_t> &off,
                      const std::vector<int64_t> &off_end,
                      int64_t i0, int64_t j0, std::vector<int64_t> &cig) {
    int64_t i = i0, j = j0, state = 0;
    while (i >= 0 && j >= 0) {
        int64_t r = i + j;
        int force_state = -1;
        if (i < off[r]) force_state = 2;
        if (i > off_end[r]) force_state = 1;
        int tmp = force_state < 0 ? p_rows[r][i - off[r]] : 0;
        if (state == 0) state = tmp & 7;
        else if (!((tmp >> (state + 2)) & 1)) state = 0;
        if (state == 0) state = tmp & 7;
        if (force_state >= 0) state = force_state;
        if (state == 0) { push_cigar(cig, 0, 1); i--; j--; }
        else if (state == 1 || state == 3) { push_cigar(cig, 2, 1); i--; }
        else { push_cigar(cig, 1, 1); j--; }
    }
    if (i >= 0) push_cigar(cig, 2, i + 1);
    if (j >= 0) push_cigar(cig, 1, j + 1);
    // reverse pairwise
    for (size_t a = 0, b = cig.size() - 2; a < b; a += 2, b -= 2) {
        std::swap(cig[a], cig[b]);
        std::swap(cig[a + 1], cig[b + 1]);
    }
}

static void extz2_one(const int64_t *query, int64_t qlen,
                      const int64_t *target, int64_t tlen,
                      const int64_t *mat, int m, int64_t q, int64_t e,
                      int64_t w, int64_t zdrop, int flag, Ez &ez,
                      std::vector<int64_t> &cigar) {
    if (m <= 0 || qlen <= 0 || tlen <= 0) return;
    bool with_cigar = !(flag & SCORE_ONLY);
    int64_t qe = q + e, qe2 = 2 * qe;
    int64_t sc_mch = mat[0], sc_mis = mat[1];
    int64_t max_cap = sc_mch + qe2;
    if (w < 0) w = qlen > tlen ? qlen : tlen;
    int64_t wl = w, wr = w;
    int64_t tlen_16 = (tlen + 15) / 16 * 16;
    int64_t qlen_16 = (qlen + 15) / 16 * 16;
    int64_t min_sc = mat[0];
    for (int i = 0; i < m * m; i++) min_sc = mat[i] < min_sc ? mat[i] : min_sc;
    if (-min_sc > 2 * (q + e)) return;

    std::vector<int64_t> u(tlen_16, 0), v(tlen_16, 0), x(tlen_16, 0),
        y(tlen_16, 0), s(tlen_16 + 16, 0), sf(tlen_16 + 16, 0),
        qr(qlen_16 + 16, 0), H(tlen_16, KSW_NEG_INF);
    for (int64_t i = 0; i < tlen; i++) sf[i] = target[i];
    for (int64_t i = 0; i < qlen; i++) qr[i] = query[qlen - 1 - i];

    int64_t n_rows = qlen + tlen - 1;
    std::vector<std::vector<int8_t>> p_rows;
    std::vector<int64_t> off, off_end;
    if (with_cigar) {
        p_rows.resize(n_rows);
        off.assign(n_rows, 0);
        off_end.assign(n_rows, 0);
    }
    int64_t last_st = -1, last_en = -1;

    for (int64_t r = 0; r < n_rows; r++) {
        int64_t st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        int64_t lo = (r - wr + 1) >> 1, hi = (r + wl) >> 1;
        if (st < lo) st = lo;
        if (en > hi) en = hi;
        if (st > en) { ez.zdropped = 1; break; }
        int64_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        int64_t x1, v1;
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = x[st - 1];
                v1 = v[st - 1];
            } else x1 = v1 = 0;
        } else {
            x1 = 0;
            v1 = r ? q : 0;
        }
        if (en >= r) {
            y[r] = 0;
            u[r] = r ? q : 0;
        }
        int64_t s_hi = st0 + ((en0 - st0) / 16 + 1) * 16;
        for (int64_t t = st0; t < s_hi; t++) {
            int64_t qc = qr[(qlen - 1 - r) + t];   // qr 0-padded past qlen
            int64_t tc = sf[t];
            bool neg = (qlen - 1 - r) + t < 0;
            if (neg) { s[t] = 0; continue; }
            s[t] = (qc == m - 1 || tc == m - 1) ? 0
                   : (qc == tc ? sc_mch : sc_mis);
        }
        std::vector<int8_t> *dp = nullptr;
        if (with_cigar) {
            p_rows[r].assign(en - st + 1, 0);
            dp = &p_rows[r];
            off[r] = st;
            off_end[r] = en;
        }
        int64_t x_prev = x1, v_prev = v1;
        for (int64_t t = st; t <= en; t++) {
            int64_t zv = s[t] + qe2;
            int64_t a = x_prev + v_prev;
            int64_t b = y[t] + u[t];
            int8_t d = 0;
            if (with_cigar) {
                d = a > zv ? 1 : 0;
                if (zv < a) zv = a;
                if (b > zv) d = 2;
            } else if (zv < a) zv = a;
            if (zv < b) zv = b;
            if (zv > max_cap) zv = max_cap;
            int64_t ut_old = u[t];
            int64_t x_cur = x[t], v_cur = v[t];
            u[t] = zv - v_prev;
            v[t] = zv - ut_old;
            int64_t zq = zv - q;
            int64_t an = a - zq, bn = b - zq;
            if (with_cigar) {
                if (an > 0) { x[t] = an; d |= 0x08; } else x[t] = 0;
                if (bn > 0) { y[t] = bn; d |= 0x10; } else y[t] = 0;
                (*dp)[t - st] = d;
            } else {
                x[t] = an > 0 ? an : 0;
                y[t] = bn > 0 ? bn : 0;
            }
            x_prev = x_cur;
            v_prev = v_cur;
        }
        int64_t max_H, max_t;
        if (r > 0) {
            if (en0 > 0) H[en0] = H[en0 - 1] + u[en0] - qe;
            else H[en0] = H[en0] + v[en0] - qe;
            max_H = H[en0];
            max_t = en0;
            int64_t en1 = st0 + (en0 - st0) / 4 * 4;
            if (en1 > st0) {
                int64_t lanes_max[4], lanes_t[4];
                for (int l = 0; l < 4; l++) {
                    lanes_max[l] = max_H;
                    lanes_t[l] = max_t;
                }
                for (int64_t t = st0; t < en1; t++) {
                    H[t] += v[t] - qe;
                    int lane = (int)((t - st0) & 3);
                    if (H[t] > lanes_max[lane]) {
                        lanes_max[lane] = H[t];
                        lanes_t[lane] = t - lane;   // block base
                    }
                }
                for (int l = 0; l < 4; l++) {
                    if (max_H < lanes_max[l]) {
                        max_H = lanes_max[l];
                        max_t = lanes_t[l] + l;
                    }
                }
            }
            for (int64_t t = en1; t < en0; t++) {
                H[t] += v[t] - qe;
                if (H[t] > max_H) {
                    max_H = H[t];
                    max_t = t;
                }
            }
        } else {
            H[0] = v[0] - qe - qe;
            max_H = H[0];
            max_t = 0;
        }
        if (en0 == tlen - 1 && H[en0] > ez.mte) {
            ez.mte = H[en0];
            ez.mte_q = r - en;
        }
        if (r - st0 == qlen - 1 && H[st0] > ez.mqe) {
            ez.mqe = H[st0];
            ez.mqe_t = st0;
        }
        if (apply_zdrop(ez, max_H, r, max_t, zdrop, e)) break;
        if (r == qlen + tlen - 2 && en0 == tlen - 1) ez.score = H[tlen - 1];
        last_st = st;
        last_en = en;
    }
    if (with_cigar) {
        if (!ez.zdropped && !(flag & EXTZ_ONLY))
            backtrack(p_rows, off, off_end, tlen - 1, qlen - 1, cigar);
        else if (ez.max_t >= 0 && ez.max_q >= 0)
            backtrack(p_rows, off, off_end, ez.max_t, ez.max_q, cigar);
    }
}

extern "C" int extz2_batch_c(const int64_t *qcat, const int64_t *qoff,
                             const int64_t *tcat, const int64_t *toff,
                             int64_t B, const int64_t *mat, int64_t m,
                             int64_t q, int64_t e, int64_t w, int64_t zdrop,
                             int64_t flag, int64_t *out_scalar,
                             int64_t *cigar_out, int64_t *cigar_off,
                             int64_t cigar_cap) {
    std::vector<std::vector<int64_t>> cigars(B);
    std::vector<Ez> ezs(B);
#pragma omp parallel for schedule(dynamic)
    for (int64_t b = 0; b < B; b++) {
        extz2_one(qcat + qoff[b], qoff[b + 1] - qoff[b], tcat + toff[b],
                  toff[b + 1] - toff[b], mat, (int)m, q, e, w, zdrop,
                  (int)flag, ezs[b], cigars[b]);
    }
    int64_t pos = 0;
    for (int64_t b = 0; b < B; b++) {
        const Ez &z = ezs[b];
        int64_t *o = out_scalar + b * 9;
        o[0] = z.max; o[1] = z.max_q; o[2] = z.max_t;
        o[3] = z.mqe; o[4] = z.mqe_t; o[5] = z.mte; o[6] = z.mte_q;
        o[7] = z.score; o[8] = z.zdropped;
        cigar_off[b] = pos;
        int64_t n2 = (int64_t)cigars[b].size();
        if (pos + n2 / 2 > cigar_cap) return -1;
        for (int64_t i = 0; i < n2; i += 2) {
            cigar_out[pos * 2] = cigars[b][i];
            cigar_out[pos * 2 + 1] = cigars[b][i + 1];
            pos++;
        }
    }
    cigar_off[B] = pos;
    return 0;
}
