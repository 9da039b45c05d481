// Banded affine-gap DP fill + traceback — native core of
// mmseqs2_tpu/ops/banded.py (reference semantics: banded_sw,
// /root/reference/src/alignment/StripedSmithWaterman.cpp).
//
// Replicates the numpy implementation op-for-op, including its tie-breaks
// (diagonal on temp1<=temp2; E only on strict e1>f1; "open" on strict
// comparisons) and its cummax F-closure formulation (seeded at the band
// boundary zero, with the pure-extension f_ext0 floor), so backtraces are
// byte-identical to the tested python oracle. ~40x faster per pair: the
// numpy version pays ~20 vector-op passes per DP row.
//
// Build: g++ -O3 -shared -fPIC banded_bt.cpp -o banded_bt.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Fill + traceback for one window. s_win: (qL, dbL) row-major int64
// per-cell scores. Returns backtrace length (written to out as
// 'M'/'I'/'D' bytes, capacity qL+dbL+2), or -1 when the banded maximum
// stays below `score` (caller doubles the band), or -2 on a traceback
// inconsistency (caller falls back to python to raise).
long banded_bt_c(const int64_t* s_win, long qL, long dbL, long bw,
                 long score, long go, long ge, char* out) {
    const int64_t kNeg = -(int64_t(1) << 40);
    (void)kNeg;
    std::vector<int8_t> dirs((size_t)qL * dbL * 3);
    std::vector<int64_t> h_prev(dbL + 2, 0), e_prev(dbL + 2, 0);
    std::vector<int64_t> h_row(dbL), e_row_v(dbL), hq_v(dbL), f_row_v(dbL);
    int64_t best = 0;
    for (long i = 0; i < qL; i++) {
        long beg = i - bw; if (beg < 0) beg = 0;
        long end = i + bw; if (end > dbL - 1) end = dbL - 1;
        long n = end - beg + 1;
        if (n <= 0) continue;
        const int64_t* srow = s_win + (size_t)i * dbL;
        int8_t* de = dirs.data() + ((size_t)i * dbL) * 3;
        // E plane + e1, diag, hq
        for (long m = 0; m < n; m++) {
            long j = beg + m;
            int64_t t1, t2;
            if (i == 0) { t1 = -go; t2 = -ge; }
            else { t1 = h_prev[j + 1] - go; t2 = e_prev[j + 1] - ge; }
            int64_t e = t1 > t2 ? t1 : t2;
            e_row_v[m] = e;
            de[j * 3 + 0] = t1 > t2 ? 3 : 2;
            int64_t e1 = e > 0 ? e : 0;
            int64_t diag = h_prev[j] + srow[j];
            hq_v[m] = e1 > diag ? e1 : diag;
        }
        // F closure: run = cummax(seed), seed[0]=0,
        // seed[m] = hq[m-1] + (m-1)*ge + ge
        int64_t run = 0;
        for (long m = 0; m < n; m++) {
            if (m > 0) {
                int64_t seed = hq_v[m - 1] + (m - 1) * ge + ge;
                if (seed > run) run = seed;
            }
            int64_t f_open = run - go - m * ge;
            int64_t f_ext0 = -ge * (m + 1);
            f_row_v[m] = f_open > f_ext0 ? f_open : f_ext0;
        }
        for (long m = 0; m < n; m++) {
            long j = beg + m;
            int64_t f1 = f_row_v[m] > 0 ? f_row_v[m] : 0;
            int64_t h = hq_v[m] > f1 ? hq_v[m] : f1;
            h_row[m] = h;
            if (h > best) best = h;
            int64_t hc_left = m > 0 ? h_row[m - 1] : 0;
            int64_t f_left = m > 0 ? f_row_v[m - 1] : 0;
            de[j * 3 + 1] = (hc_left - go > f_left - ge) ? 5 : 4;
            int64_t e1 = e_row_v[m] > 0 ? e_row_v[m] : 0;
            int64_t diag = h_prev[j] + srow[j];
            int64_t t1m = e1 > f1 ? e1 : f1;
            int8_t dh;
            if (t1m <= diag) dh = 1;
            else if (e1 > f1) dh = de[j * 3 + 0];
            else dh = de[j * 3 + 1];
            de[j * 3 + 2] = dh;
        }
        std::memset(h_prev.data(), 0, sizeof(int64_t) * (dbL + 2));
        std::memset(e_prev.data(), 0, sizeof(int64_t) * (dbL + 2));
        for (long m = 0; m < n; m++) {
            h_prev[beg + m + 1] = h_row[m];
            e_prev[beg + m + 1] = e_row_v[m];
        }
    }
    if (best < score) return -1;
    // traceback from the window corner
    long i = qL - 1, j = dbL - 1, plane = 2;
    long len = 0;
    char* rev = out;   // write reversed, then flip
    while (i > 0 || j > 0) {
        if (i < 0 || j < 0) return -2;   // escaped the window: python path
        int8_t d = dirs[((size_t)i * dbL + j) * 3 + plane];
        switch (d) {
            case 1: rev[len++] = 'M'; i--; j--; plane = 2; break;
            case 2: rev[len++] = 'I'; i--; plane = 0; break;
            case 3: rev[len++] = 'I'; i--; plane = 2; break;
            case 4: rev[len++] = 'D'; j--; plane = 1; break;
            case 5: rev[len++] = 'D'; j--; plane = 2; break;
            default: return -2;
        }
        if (len > qL + dbL) return -2;
    }
    rev[len++] = 'M';
    for (long a = 0, b = len - 1; a < b; a++, b--) {
        char t = rev[a]; rev[a] = rev[b]; rev[b] = t;
    }
    return len;
}

// Debug: run the fill only and export the direction planes.
long banded_dirs_c(const int64_t* s_win, long qL, long dbL, long bw,
                   long go, long ge, int8_t* out_dirs) {
    std::vector<int64_t> h_prev(dbL + 2, 0), e_prev(dbL + 2, 0);
    std::vector<int64_t> h_row(dbL), e_row_v(dbL), hq_v(dbL), f_row_v(dbL);
    int64_t best = 0;
    std::memset(out_dirs, 0, (size_t)qL * dbL * 3);
    for (long i = 0; i < qL; i++) {
        long beg = i - bw; if (beg < 0) beg = 0;
        long end = i + bw; if (end > dbL - 1) end = dbL - 1;
        long n = end - beg + 1;
        if (n <= 0) continue;
        const int64_t* srow = s_win + (size_t)i * dbL;
        int8_t* de = out_dirs + ((size_t)i * dbL) * 3;
        for (long m = 0; m < n; m++) {
            long j = beg + m;
            int64_t t1, t2;
            if (i == 0) { t1 = -go; t2 = -ge; }
            else { t1 = h_prev[j + 1] - go; t2 = e_prev[j + 1] - ge; }
            int64_t e = t1 > t2 ? t1 : t2;
            e_row_v[m] = e;
            de[j * 3 + 0] = t1 > t2 ? 3 : 2;
            int64_t e1 = e > 0 ? e : 0;
            int64_t diag = h_prev[j] + srow[j];
            hq_v[m] = e1 > diag ? e1 : diag;
        }
        int64_t run = 0;
        for (long m = 0; m < n; m++) {
            if (m > 0) {
                int64_t seed = hq_v[m - 1] + (m - 1) * ge + ge;
                if (seed > run) run = seed;
            }
            int64_t f_open = run - go - m * ge;
            int64_t f_ext0 = -ge * (m + 1);
            f_row_v[m] = f_open > f_ext0 ? f_open : f_ext0;
        }
        for (long m = 0; m < n; m++) {
            long j = beg + m;
            int64_t f1 = f_row_v[m] > 0 ? f_row_v[m] : 0;
            int64_t h = hq_v[m] > f1 ? hq_v[m] : f1;
            h_row[m] = h;
            if (h > best) best = h;
            int64_t hc_left = m > 0 ? h_row[m - 1] : 0;
            int64_t f_left = m > 0 ? f_row_v[m - 1] : 0;
            de[j * 3 + 1] = (hc_left - go > f_left - ge) ? 5 : 4;
            int64_t e1 = e_row_v[m] > 0 ? e_row_v[m] : 0;
            int64_t diag = h_prev[j] + srow[j];
            int64_t t1m = e1 > f1 ? e1 : f1;
            int8_t dh;
            if (t1m <= diag) dh = 1;
            else if (e1 > f1) dh = de[j * 3 + 0];
            else dh = de[j * 3 + 1];
            de[j * 3 + 2] = dh;
        }
        std::memset(h_prev.data(), 0, sizeof(int64_t) * (dbL + 2));
        std::memset(e_prev.data(), 0, sizeof(int64_t) * (dbL + 2));
        for (long m = 0; m < n; m++) {
            h_prev[beg + m + 1] = h_row[m];
            e_prev[beg + m + 1] = e_row_v[m];
        }
    }
    return best;
}

}  // extern "C"
