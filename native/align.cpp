// Banded edit-distance + traceback over 4-bit IUPAC base masks.
//
// Native replacement for the host-side NumPy DP (ratatosk_tpu/ops/cigar.py):
// the device DP (ops/align.py) ranks candidate paths; the engine only needs
// host alignment for the chosen winner (per-base quality classes, partial-path
// trims, same-unitig splice distances). Semantics mirror edlib's modes
// (reference src/edlib.h:36-62): NW global, SHW free target suffix, HW free
// target prefix+suffix. Banding is Ukkonen with threshold doubling: a result
// dist <= t computed inside the band is exact, because any cell outside the
// band costs > t.
//
// Sequences are 4-bit IUPAC masks (dna.py): substitution cost = ((a&b)==0),
// the reference's 28-pair equality table (src/Common.hpp:262-276) for free.
//
// Build: native/build.sh -> libralign.so; bindings: ratatosk_tpu/ops/native_align.py.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

constexpr int32_t INF = std::numeric_limits<int32_t>::max() / 4;

enum Mode { NW = 0, SHW = 1, HW = 2 };

struct Band {
    // row i covers columns [lo(i), hi(i)] inclusive
    int32_t rl, rh, n;
    int32_t lo(int32_t i) const { return std::max<int32_t>(0, i - rl); }
    int32_t hi(int32_t i) const { return std::min<int32_t>(n, i + rh); }
    int32_t width() const { return rl + rh + 1; }
};

// Fill the banded DP matrix. E is (m+1) x band.width(); cell (i, j) lives at
// E[i*W + (j - lo(i))]. Returns false if any row's window is empty (can't
// happen with rl,rh >= 0).
void fill(const uint8_t* a, int32_t m, const uint8_t* b, int32_t n,
          int mode, const Band& bd, std::vector<int32_t>& E) {
    const int32_t W = bd.width();
    E.assign(static_cast<size_t>(m + 1) * W, INF);
    // row 0: window [0, hi(0)]
    for (int32_t j = 0; j <= bd.hi(0); ++j)
        E[j] = (mode == HW) ? 0 : j;
    for (int32_t i = 1; i <= m; ++i) {
        const int32_t lo = bd.lo(i), hi = bd.hi(i);
        const int32_t plo = bd.lo(i - 1), phi = bd.hi(i - 1);
        int32_t* row = E.data() + static_cast<size_t>(i) * W;
        const int32_t* prev = E.data() + static_cast<size_t>(i - 1) * W;
        const uint8_t am = a[i - 1];
        int32_t left = INF;                       // E[i][j-1]
        for (int32_t j = lo; j <= hi; ++j) {
            int32_t up = (j >= plo && j <= phi) ? prev[j - plo] : INF;
            int32_t diag;
            if (j == 0) {
                diag = INF;  // no j-1 column
                // E[i][0] boundary: i insertions (HW same: column 0 = i)
                int32_t v = std::min(i, std::min(up + 1, left + 1));
                row[0] = v;
                left = v;
                continue;
            }
            diag = (j - 1 >= plo && j - 1 <= phi) ? prev[j - 1 - plo] : INF;
            int32_t sub = ((am & b[j - 1]) == 0) ? 1 : 0;
            int32_t v = diag + sub;
            if (up + 1 < v) v = up + 1;
            if (left + 1 < v) v = left + 1;
            row[j - lo] = v;
            left = v;
        }
    }
}

struct Result {
    int32_t dist, b_start, b_end;
};

// dist + end column (max tie) from the last row; exact iff dist <= t.
Result answer(const std::vector<int32_t>& E, int32_t m, int32_t n,
              int mode, const Band& bd) {
    const int32_t W = bd.width();
    const int32_t lo = bd.lo(m), hi = bd.hi(m);
    const int32_t* row = E.data() + static_cast<size_t>(m) * W;
    Result r{INF, 0, n};
    if (mode == NW) {
        r.dist = (n >= lo && n <= hi) ? row[n - lo] : INF;
        r.b_end = n;
        return r;
    }
    int32_t best = INF, jend = -1;
    for (int32_t j = lo; j <= hi; ++j) {
        int32_t v = row[j - lo];
        if (v < best) best = v;
    }
    for (int32_t j = hi; j >= lo; --j)
        if (row[j - lo] == best) { jend = j; break; }
    r.dist = best;
    r.b_end = jend < 0 ? 0 : jend;
    return r;
}

// Traceback from (m, jend), filling qclass (one byte per query base):
// 0 = '=' match, 1 = 'X' mismatch, 2 = 'I' insertion (query-only).
// Also records b_start (HW). Tie order matches ops/cigar.py: diag, up, left.
void trace(const uint8_t* a, int32_t m, const uint8_t* b,
           int mode, const Band& bd, const std::vector<int32_t>& E,
           int32_t jend, uint8_t* qclass, int32_t* b_start,
           int32_t* cig_ops, int32_t* cig_len, int32_t cig_cap) {
    const int32_t W = bd.width();
    auto at = [&](int32_t i, int32_t j) -> int32_t {
        if (j < bd.lo(i) || j > bd.hi(i)) return INF;
        return E[static_cast<size_t>(i) * W + (j - bd.lo(i))];
    };
    int32_t i = m, j = jend;
    int32_t nc = 0;
    auto push = [&](int32_t op) {  // 0 '=', 1 'X', 2 'I', 3 'D'
        if (cig_ops && nc < cig_cap) cig_ops[nc] = op;
        ++nc;
    };
    while (i > 0 || j > 0) {
        if (i == 0) {
            if (mode == HW) break;      // free target prefix
            push(3); --j;
            continue;
        }
        if (j == 0) {
            if (qclass) qclass[i - 1] = 2;
            push(2); --i;
            continue;
        }
        bool match = (a[i - 1] & b[j - 1]) != 0;
        int32_t cur = at(i, j);
        if (at(i - 1, j - 1) + (match ? 0 : 1) == cur) {
            if (qclass) qclass[i - 1] = match ? 0 : 1;
            push(match ? 0 : 1);
            --i; --j;
        } else if (at(i - 1, j) + 1 == cur) {
            if (qclass) qclass[i - 1] = 2;
            push(2); --i;
        } else {
            push(3); --j;
        }
    }
    if (b_start) *b_start = (mode == HW) ? j : 0;
    if (cig_len) *cig_len = nc;       // ops are in reverse order
}

}  // namespace

extern "C" {

// Align query a (la 4-bit masks) to target b (lb masks). mode 0/1/2 = NW/SHW/HW.
// Outputs: return dist; *b_start/*b_end alignment span on target (b_end = max
// tie column, Correction.cpp:733-740); qclass (size la, may be NULL) per-query
// -base op class 0/1/2 = match/mismatch/insertion.
// cig_ops (may be NULL, capacity cig_cap) receives the extended-CIGAR op codes
// in REVERSE order (0 '=', 1 'X', 2 'I', 3 'D'); *cig_len = total op count
// (may exceed cig_cap, caller must re-call with a bigger buffer).
int32_t aln_one(const uint8_t* a, int32_t la, const uint8_t* b, int32_t lb,
                int32_t mode, int32_t* b_start, int32_t* b_end,
                uint8_t* qclass, int32_t* cig_ops, int32_t* cig_len,
                int32_t cig_cap) {
    if (b_start) *b_start = 0;
    if (b_end) *b_end = (mode == NW) ? lb : 0;
    if (cig_len) *cig_len = 0;
    if (la == 0) {
        // empty query: SHW ends at the min-tie... the reference takes the MAX
        // tie column (Correction.cpp:733-740) — row 0 is 0..n (SHW, min at 0)
        // or all zeros (HW, max tie at n)
        if (b_end && mode != NW) *b_end = (mode == HW) ? lb : 0;
        if (mode == NW && cig_ops) {
            for (int32_t j = 0; j < lb && j < cig_cap; ++j) cig_ops[j] = 3;
            if (cig_len) *cig_len = lb;
        }
        return (mode == NW) ? lb : 0;
    }
    std::vector<int32_t> E;
    Band bd{0, 0, lb};
    Result r{INF, 0, 0};
    if (mode == HW) {
        // free target prefix breaks the diagonal-band argument: full width
        bd.rl = la; bd.rh = lb; bd.n = lb;
        fill(a, la, b, lb, mode, bd, E);
        r = answer(E, la, lb, mode, bd);
    } else {
        int32_t t = 8;
        const int32_t dl = std::max(0, la - lb), dh = std::max(0, lb - la);
        for (;;) {
            bd.rl = t + dl; bd.rh = t + dh; bd.n = lb;
            fill(a, la, b, lb, mode, bd, E);
            r = answer(E, la, lb, mode, bd);
            bool full = (bd.rl >= la && bd.rh >= lb);
            if (r.dist <= t || full) break;
            t *= 2;
        }
    }
    if (qclass || cig_ops || (b_start && mode == HW))
        trace(a, la, b, mode, bd, E, r.b_end, qclass, &r.b_start,
              cig_ops, cig_len, cig_cap);
    if (b_start) *b_start = r.b_start;
    if (b_end) *b_end = r.b_end;
    return r.dist;
}

// Distance-only batch: pairs (a[aoff[i]:aoff[i+1]], b[boff[i]:boff[i+1]]),
// threaded. One ctypes round trip instead of one per pair — the per-call
// wrapper overhead dominated the planner's same-unitig splice scoring.
void aln_dist_batch(const uint8_t* a, const int64_t* aoff,
                    const uint8_t* b, const int64_t* boff, int64_t n,
                    int32_t mode, int32_t* out_dist, int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t s, int64_t e) {
        for (int64_t i = s; i < e; ++i) {
            out_dist[i] = aln_one(
                a + aoff[i], (int32_t)(aoff[i + 1] - aoff[i]),
                b + boff[i], (int32_t)(boff[i + 1] - boff[i]),
                mode, nullptr, nullptr, nullptr, nullptr, nullptr, 0);
        }
    };
    if (n_threads == 1 || n < 64) { work(0, n); return; }
    std::vector<std::thread> ts;
    int64_t step = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t s = t * step, e = std::min<int64_t>(n, s + step);
        if (s >= e) break;
        ts.emplace_back(work, s, e);
    }
    for (auto& t : ts) t.join();
}

}  // extern "C"
