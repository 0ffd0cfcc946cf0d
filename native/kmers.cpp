// Host-side k-mer kernels: rolling canonical packing, sorted-index lookup,
// and the batched 1-edit seed probe.
//
// Native runtime companion to ratatosk_tpu/ops/kmers.py and
// ratatosk_tpu/correct/seeds.py: the reference's Bifrost substrate does the
// same jobs in C++ (KmerHashIterator rolling hashes, CompactedDBG::find /
// searchSequence — SURVEY.md §2.3); here the index is a sorted canonical key
// array (one uint64 word for k<=32, two for k<=64) and every window is
// maintained as a rolling 2k-bit value in an unsigned __int128, so packing
// is O(1) per base instead of numpy's k shifted temporaries per window.
//
// Key layout matches ops/kmers.py: value = hi * 2^64 + lo; base j (leftmost)
// of an m-mer sits at bits 2*(m-1-j). Variant bit-surgery mirrors
// correct/seeds.py:_set/_drop/_insert_base128 exactly (tests cross-check the
// two implementations). Hash = splitmix64 (ops/kmers.py:126-139).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;

static inline u128 mask_bits(int nbits) {
    if (nbits >= 128) return ~(u128)0;
    if (nbits <= 0) return 0;
    return ((u128)1 << nbits) - 1;
}

static inline uint64_t sm64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

static inline uint64_t hash_key(u128 q, bool two_word) {
    uint64_t lo = (uint64_t)q, hi = (uint64_t)(q >> 64);
    return two_word ? sm64(hi ^ sm64(lo)) : sm64(lo);
}

// hash-directory lookup: keys sorted by hash bucket (top `bits` of
// hash_key), dir0[2^bits + 1] bucket starts, hrows[slot] = value-order row.
// O(1 + bucket len) probes instead of log2(n) binary-search rounds — the
// host mirror of ops/hash_index.py's device directory.
static inline int64_t find_key_hash(const uint64_t* khi, const uint64_t* klo,
                                    const int64_t* hrows,
                                    const int32_t* dir0, int32_t bits,
                                    bool two_word, u128 q) {
    uint64_t h = hash_key(q, two_word);
    uint64_t b = h >> (64 - bits);
    int64_t s = dir0[b], e = dir0[b + 1];
    for (; s < e; ++s) {
        u128 kk = khi ? (((u128)khi[s] << 64) | klo[s]) : (u128)klo[s];
        if (kk == q) return hrows[s];
    }
    return -1;
}

// lower_bound over sorted (hi,lo) keys; khi may be null (one-word keys)
static inline int64_t find_key(const uint64_t* khi, const uint64_t* klo,
                               int64_t n, u128 q) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        u128 kk = khi ? (((u128)khi[mid] << 64) | klo[mid]) : (u128)klo[mid];
        if (kk < q) lo = mid + 1; else hi = mid;
    }
    if (lo < n) {
        u128 kk = khi ? (((u128)khi[lo] << 64) | klo[lo]) : (u128)klo[lo];
        if (kk == q) return lo;
    }
    return -1;
}

// Rolling m-base window over a code stream: fw packs bases left-to-right,
// rc is the reverse complement, both as 2m-bit values.
struct Roll {
    u128 fw = 0, rc = 0, mask;
    int m, run = 0;
    explicit Roll(int m_) : mask(mask_bits(2 * m_)), m(m_) {}
    inline void push(uint8_t c) {
        if (c >= 4) { run = 0; fw = 0; rc = 0; return; }
        fw = ((fw << 2) | c) & mask;
        rc = (rc >> 2) | ((u128)(3 - c) << (2 * (m - 1)));
        ++run;
    }
    inline bool full() const { return run >= m; }
};

// ---------------------------------------------------------------------------
// variant bit-surgery (mirrors correct/seeds.py)
// ---------------------------------------------------------------------------

static inline u128 set_base(u128 n, int m, int p, int b) {
    int s = 2 * (m - 1 - p);
    return (n & ~((u128)3 << s)) | ((u128)b << s);
}

static inline int get_base(u128 n, int m, int p) {
    return (int)((n >> (2 * (m - 1 - p))) & 3);
}

static inline u128 drop_base(u128 n, int m, int p) {
    u128 upper = n >> (2 * (m - p));
    u128 lower = n & mask_bits(2 * (m - 1 - p));
    return (upper << (2 * (m - 1 - p))) | lower;
}

static inline u128 insert_base(u128 n, int m, int p, int b) {
    u128 upper = n >> (2 * (m - p));
    u128 lower = n & mask_bits(2 * (m - p));
    return (upper << (2 * (m - p + 1))) | ((u128)b << (2 * (m - p))) | lower;
}

// ---------------------------------------------------------------------------

extern "C" {

// Canonical key of every k-window of `codes`. Output arrays length L-k+1.
void rt_canonical(const uint8_t* codes, int64_t L, int32_t k,
                  uint64_t* out_hi, uint64_t* out_lo, uint8_t* out_valid,
                  uint8_t* out_isfw, int32_t n_threads) {
    int64_t P = L - k + 1;
    if (P <= 0) return;
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t a, int64_t b) {
        // windows [a, b): consume bases from a to b+k-2
        Roll w(k);
        for (int64_t i = a; i < b + k - 1; ++i) {
            w.push(codes[i]);
            int64_t p = i - k + 1;
            if (p < a) continue;
            if (!w.full()) { out_valid[p] = 0; out_lo[p] = 0;
                if (out_hi) out_hi[p] = 0; out_isfw[p] = 1; continue; }
            bool fwle = w.fw <= w.rc;
            u128 q = fwle ? w.fw : w.rc;
            out_valid[p] = 1;
            out_isfw[p] = fwle ? 1 : 0;
            out_lo[p] = (uint64_t)q;
            if (out_hi) out_hi[p] = (uint64_t)(q >> 64);
        }
    };
    if (n_threads == 1 || P < 4096) { work(0, P); return; }
    std::vector<std::thread> ts;
    int64_t step = (P + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t a = t * step, b = std::min<int64_t>(P, a + step);
        if (a >= b) break;
        ts.emplace_back(work, a, b);
    }
    for (auto& t : ts) t.join();
}

// Exact lookup of every k-window against the sorted index.
// out_row[p] = index row or -1 (miss / invalid window).
void rt_lookup(const uint8_t* codes, int64_t L, int32_t k,
               const uint64_t* keys_hi, const uint64_t* keys_lo,
               int64_t n_keys,
               int64_t* out_row, uint8_t* out_isfw, int32_t n_threads) {
    int64_t P = L - k + 1;
    if (P <= 0) return;
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t a, int64_t b) {
        Roll w(k);
        for (int64_t i = a; i < b + k - 1; ++i) {
            w.push(codes[i]);
            int64_t p = i - k + 1;
            if (p < a) continue;
            if (!w.full()) { out_row[p] = -1; out_isfw[p] = 1; continue; }
            bool fwle = w.fw <= w.rc;
            out_isfw[p] = fwle ? 1 : 0;
            out_row[p] = find_key(keys_hi, keys_lo, n_keys,
                                  fwle ? w.fw : w.rc);
        }
    };
    if (n_threads == 1 || P < 4096) { work(0, P); return; }
    std::vector<std::thread> ts;
    int64_t step = (P + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t a = t * step, b = std::min<int64_t>(P, a + step);
        if (a >= b) break;
        ts.emplace_back(work, a, b);
    }
    for (auto& t : ts) t.join();
}

// Batch find of already-canonical packed keys against the HASH-ORDERED key
// table (find_key_hash layout). out_row[i] = value-order row or -1.
void rt_find_keys(const uint64_t* q_hi, const uint64_t* q_lo, int64_t nq,
                  const uint64_t* hk_hi, const uint64_t* hk_lo,
                  const int64_t* hrows, const int32_t* dir0, int32_t bits,
                  int64_t* out_row, int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    bool two = hk_hi != nullptr;
    auto work = [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            u128 q = two ? (((u128)q_hi[i] << 64) | q_lo[i]) : (u128)q_lo[i];
            out_row[i] = find_key_hash(two ? hk_hi : nullptr, hk_lo, hrows,
                                       dir0, bits, two, q);
        }
    };
    if (n_threads == 1 || nq < 4096) { work(0, nq); return; }
    std::vector<std::thread> ts;
    int64_t step = (nq + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t a = t * step, b = std::min<int64_t>(nq, a + step);
        if (a >= b) break;
        ts.emplace_back(work, a, b);
    }
    for (auto& t : ts) t.join();
}

// Exact lookup of every k-window against the HASH-ORDERED key table
// (find_key_hash layout). out_row[p] = value-order row or -1.
void rt_lookup_hash(const uint8_t* codes, int64_t L, int32_t k,
                    const uint64_t* hk_hi, const uint64_t* hk_lo,
                    const int64_t* hrows, const int32_t* dir0, int32_t bits,
                    int64_t* out_row, uint8_t* out_isfw, int32_t n_threads) {
    int64_t P = L - k + 1;
    if (P <= 0) return;
    if (n_threads < 1) n_threads = 1;
    bool two = hk_hi != nullptr;
    auto work = [&](int64_t a, int64_t b) {
        Roll w(k);
        for (int64_t i = a; i < b + k - 1; ++i) {
            w.push(codes[i]);
            int64_t p = i - k + 1;
            if (p < a) continue;
            if (!w.full()) { out_row[p] = -1; out_isfw[p] = 1; continue; }
            bool fwle = w.fw <= w.rc;
            out_isfw[p] = fwle ? 1 : 0;
            out_row[p] = find_key_hash(two ? hk_hi : nullptr, hk_lo, hrows,
                                       dir0, bits, two,
                                       fwle ? w.fw : w.rc);
        }
    };
    if (n_threads == 1 || P < 4096) { work(0, P); return; }
    std::vector<std::thread> ts;
    int64_t step = (P + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t a = t * step, b = std::min<int64_t>(P, a + step);
        if (a >= b) break;
        ts.emplace_back(work, a, b);
    }
    for (auto& t : ts) t.join();
}

struct Hit { int64_t pos, row; uint8_t fw, kind; };

// 1-edit seed probe over concatenated spans (separated by invalid bases).
// kinds: 0 = exact (k-window), 1 = sub (k), 2 = del (k+1 read window),
// 3 = ins (k-1 read window). Mirrors seeds.py:find_weak_seeds_batch's
// variant enumeration, prefilter, and near-exact suppression.
// Returns hit count, or -(needed) when `cap` is too small.
// hf_tbl/hf_bits/half_len: optional pigeonhole half-k-mer filter (mirrors
// ops/hash_index.py make_half_bitmap + ops/plan_device.py side gating): a
// 1-edit variant of an m-window keeps at least one of the window's
// (half_len-prefix, half_len-suffix) intact, so a window with BOTH halves
// absent from the graph enumerates nothing, and a window with one half
// present restricts the edit-position range to the side that half certifies.
// Exact (the table has no false negatives), so results are bit-identical to
// the unfiltered enumeration; false positives only cost probe work.
// hrows/hdir/hdir_bits: optional hash directory — when hdir is non-null,
// keys_hi/keys_lo are the HASH-ORDERED table and lookups go through
// find_key_hash (value row via hrows) instead of binary search.
int64_t rt_seed_probe(const uint8_t* codes, int64_t L, int32_t k,
                      const int64_t* span_starts, int64_t n_spans,
                      const uint64_t* keys_hi, const uint64_t* keys_lo,
                      int64_t n_keys,
                      const int64_t* hrows, const int32_t* hdir,
                      int32_t hdir_bits,
                      const uint8_t* pf_tbl, int32_t pf_bits,
                      const uint8_t* hf_tbl, int32_t hf_bits,
                      int32_t half_len,
                      int32_t stride, int32_t near_exact_skip,
                      int32_t do_subs, int32_t do_indels,
                      int64_t* out_pos, int64_t* out_row,
                      uint8_t* out_fw, uint8_t* out_kind,
                      int64_t cap, int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    bool two_word = keys_hi != nullptr;
    std::vector<std::vector<Hit>> results((size_t)n_threads);
    std::vector<uint8_t> exact_hit((size_t)std::max<int64_t>(L, 1), 0);

    auto lookup_q = [&](u128 q) -> int64_t {
        if (hdir)
            return find_key_hash(two_word ? keys_hi : nullptr, keys_lo,
                                 hrows, hdir, hdir_bits, two_word, q);
        return find_key(two_word ? keys_hi : nullptr, keys_lo, n_keys, q);
    };

    auto probe = [&](u128 v, u128 rv, int64_t p, uint8_t kind,
                     std::vector<Hit>& out) {
        bool fwle = v <= rv;
        u128 q = fwle ? v : rv;
        if (pf_tbl) {
            uint64_t h = hash_key(q, two_word);
            if (!pf_tbl[h >> (64 - pf_bits)]) return;
        }
        int64_t row = lookup_q(q);
        if (row >= 0) out.push_back({p, row, (uint8_t)(fwle ? 1 : 0), kind});
    };

    // phase 1: exact windows (all valid positions, no stride)
    {
        int64_t P = L - k + 1;
        auto work = [&](int t, int64_t a, int64_t b) {
            Roll w(k);
            auto& out = results[(size_t)t];
            for (int64_t i = a; i < b + k - 1 && i < L; ++i) {
                w.push(codes[i]);
                int64_t p = i - k + 1;
                if (p < a || !w.full()) continue;
                size_t before = out.size();
                probe(w.fw, w.rc, p, 0, out);
                if (out.size() != before) exact_hit[(size_t)p] = 1;
            }
        };
        if (P > 0) {
            if (n_threads == 1 || P < 4096) work(0, 0, P);
            else {
                std::vector<std::thread> ts;
                int64_t step = (P + n_threads - 1) / n_threads;
                for (int t = 0; t < n_threads; ++t) {
                    int64_t a = t * step, b = std::min<int64_t>(P, a + step);
                    if (a >= b) break;
                    ts.emplace_back(work, t, a, b);
                }
                for (auto& t : ts) t.join();
            }
        }
    }

    // skip mask: positions within +-near_exact_skip of a confirmed exact hit
    std::vector<uint8_t> skip;
    if (near_exact_skip > 0) {
        skip.assign((size_t)L, 0);
        std::vector<int32_t> diff((size_t)L + 1, 0);
        bool any = false;
        for (int64_t p = 0; p < L; ++p) {
            if (!exact_hit[(size_t)p]) continue;
            any = true;
            int64_t a = p - near_exact_skip, b = p + near_exact_skip + 1;
            if (a < 0) a = 0;
            if (b > L) b = L;
            diff[(size_t)a] += 1;
            diff[(size_t)b] -= 1;
        }
        if (any) {
            int32_t acc = 0;
            for (int64_t p = 0; p < L; ++p) {
                acc += diff[(size_t)p];
                skip[(size_t)p] = acc > 0;
            }
        } else {
            skip.clear();
        }
    }

    // half-filter presence of the forward half_len-window at every position
    std::vector<uint8_t> hhit;
    if (hf_tbl && half_len > 0 && (do_subs || do_indels)) {
        hhit.assign((size_t)L, 0);
        int64_t Ph = L - half_len + 1;
        auto hwork = [&](int64_t a, int64_t b) {
            Roll w(half_len);
            for (int64_t i = a; i < b + half_len - 1 && i < L; ++i) {
                w.push(codes[i]);
                int64_t p = i - half_len + 1;
                if (p < a || !w.full()) continue;
                uint64_t hh = sm64((uint64_t)w.fw);
                hhit[(size_t)p] = hf_tbl[hh >> (64 - hf_bits)];
            }
        };
        if (Ph > 0) {
            if (n_threads == 1 || Ph < 4096) hwork(0, Ph);
            else {
                std::vector<std::thread> ts;
                int64_t step = (Ph + n_threads - 1) / n_threads;
                for (int t = 0; t < n_threads; ++t) {
                    int64_t a = t * step, b = std::min<int64_t>(Ph, a + step);
                    if (a >= b) break;
                    ts.emplace_back(hwork, a, b);
                }
                for (auto& t : ts) t.join();
            }
        }
    }

    // phase 2: 1-edit variants (stride + skip mask apply to window starts)
    if (do_subs || do_indels) {
        auto work = [&](int t, int64_t a, int64_t b) {
            auto& out = results[(size_t)t];
            Roll wk(k), wd(k + 1), wi(k - 1);
            // span pointer for stride alignment
            int64_t si = 0;
            auto span_of = [&](int64_t p) -> int64_t {
                while (si + 1 < n_spans && span_starts[si + 1] <= p) ++si;
                while (si > 0 && span_starts[si] > p) --si;
                return span_starts[si];
            };
            auto allowed = [&](int64_t p) -> bool {
                if (!skip.empty() && skip[(size_t)p]) return false;
                if (stride > 1 && (p - span_of(p)) % stride != 0) return false;
                return true;
            };
            int hh2 = half_len;
            // pigeonhole side gate (ops/plan_device.py `sides`): the edit-
            // position range [qlo, qhi) a window enumerates for an m-window
            // kind, given which of its halves exist in the graph. Returns
            // false when neither does (no 1-edit hit is possible).
            auto side_range = [&](int64_t p, int m, int p0, int suf_hi,
                                  int* qlo, int* qhi) -> bool {
                if (hhit.empty()) { *qlo = p0; *qhi = k; return true; }
                bool pre = hhit[(size_t)p];
                bool suf = hhit[(size_t)(p + m - half_len)];
                if (!pre && !suf) return false;
                *qlo = suf ? p0 : std::max(p0, hh2);
                *qhi = pre ? k : suf_hi;
                return *qlo < *qhi;
            };
            for (int64_t i = a; i < b + k && i < L; ++i) {
                uint8_t c = codes[i];
                wk.push(c); wd.push(c); wi.push(c);
                if (do_subs && wk.full()) {
                    int64_t p = i - k + 1;
                    int m = k;
                    int qlo, qhi;
                    if (p >= a && p < b && allowed(p)
                        && side_range(p, m, 0, k - hh2, &qlo, &qhi)) {
                        for (int q = qlo; q < qhi; ++q) {
                            int orig = get_base(wk.fw, m, q);
                            for (int bb = 0; bb < 4; ++bb) {
                                if (bb == orig) continue;
                                probe(set_base(wk.fw, m, q, bb),
                                      set_base(wk.rc, m, m - 1 - q, 3 - bb),
                                      p, 1, out);
                            }
                        }
                    }
                }
                if (do_indels && wd.full()) {
                    int64_t p = i - k;                    // (k+1)-window start
                    int m = k + 1;
                    int qlo, qhi;
                    if (p >= a && p < b && allowed(p)
                        && side_range(p, m, 1, k - hh2 + 1, &qlo, &qhi)) {
                        for (int q = qlo; q < qhi; ++q)
                            probe(drop_base(wd.fw, m, q),
                                  drop_base(wd.rc, m, m - 1 - q), p, 2, out);
                    }
                }
                if (do_indels && k >= 2 && wi.full()) {
                    int64_t p = i - k + 2;                // (k-1)-window start
                    int m = k - 1;
                    int qlo, qhi;
                    if (p >= a && p < b && allowed(p)
                        && side_range(p, m, 1, k - hh2, &qlo, &qhi)) {
                        for (int q = qlo; q < qhi; ++q)
                            for (int bb = 0; bb < 4; ++bb)
                                probe(insert_base(wi.fw, m, q, bb),
                                      insert_base(wi.rc, m, m - q, 3 - bb),
                                      p, 3, out);
                    }
                }
            }
        };
        int64_t P = L;
        if (n_threads == 1 || P < 4096) work(0, 0, P);
        else {
            std::vector<std::thread> ts;
            int64_t step = (P + n_threads - 1) / n_threads;
            for (int t = 0; t < n_threads; ++t) {
                int64_t a = t * step, b = std::min<int64_t>(P, a + step);
                if (a >= b) break;
                ts.emplace_back(work, t, a, b);
            }
            for (auto& t : ts) t.join();
        }
    }

    int64_t total = 0;
    for (auto& r : results) total += (int64_t)r.size();
    if (total > cap) return -total;
    int64_t off = 0;
    for (auto& r : results) {
        for (auto& h : r) {
            out_pos[off] = h.pos;
            out_row[off] = h.row;
            out_fw[off] = h.fw;
            out_kind[off] = h.kind;
            ++off;
        }
    }
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// bucketed k-mer counting (large-scale index construction)
//
// The sort-everything count (graph/build.py count_kmers) holds every window
// key plus an argsort permutation in RAM — ~100 GB+ at human-chr scale for
// k=63. These kernels implement the scalable path: canonical keys are
// range-partitioned by their top `bbits` bits into buckets (so the bucket
// concatenation is globally key-sorted), each bucket is LSD-radix-sorted in
// C with a same-size temp buffer, and a run-length pass emits only keys with
// count in [min_count, max_count]. Peak memory = one key stream + one bucket
// temp. The same partition is the unit of the distributed all-to-all
// (parallel/build_dist.py). Reference role: Bifrost's KmerStream/BBF-based
// counting inside CompactedDBG::build (SURVEY.md §2.3).
// ---------------------------------------------------------------------------

static inline int64_t key_bucket(uint64_t hi, uint64_t lo, int32_t k,
                                 int32_t bbits) {
    // value = hi * 2^64 + lo occupies 2k bits; bucket = top bbits
    int shift = 2 * k - bbits;
    if (k > 32) {
        int hs = shift - 64;
        return (int64_t)(hs >= 0 ? (hi >> hs)
                                 : ((hi << (-hs)) | (lo >> shift)));
    }
    return (int64_t)(lo >> shift);
}

extern "C" {

// Per-bucket counts of one chunk's canonical keys (valid[i] != 0 only).
void rt_bucket_count(const uint64_t* hi, const uint64_t* lo,
                     const uint8_t* valid, int64_t n, int32_t k,
                     int32_t bbits, int64_t* counts) {
    for (int64_t i = 0; i < n; ++i)
        if (valid[i])
            ++counts[key_bucket(hi ? hi[i] : 0, lo[i], k, bbits)];
}

// Scatter one chunk's keys into per-bucket regions of out_*; offsets[b] is
// the next write slot for bucket b (advanced in place).
void rt_bucket_scatter(const uint64_t* hi, const uint64_t* lo,
                       const uint8_t* valid, int64_t n, int32_t k,
                       int32_t bbits, int64_t* offsets,
                       uint64_t* out_hi, uint64_t* out_lo) {
    for (int64_t i = 0; i < n; ++i) {
        if (!valid[i]) continue;
        int64_t b = key_bucket(hi ? hi[i] : 0, lo[i], k, bbits);
        int64_t o = offsets[b]++;
        out_lo[o] = lo[i];
        if (hi) out_hi[o] = hi[i];
    }
}

// LSD radix sort of a key range by (hi, lo); hi/thi may be null (one-word).
// 16-bit digits; skips digit passes that are constant across the range.
void rt_radix_sort(uint64_t* hi, uint64_t* lo, uint64_t* thi, uint64_t* tlo,
                   int64_t n) {
    if (n <= 1) return;
    const int D = 1 << 16;
    std::vector<int64_t> cnt((size_t)D);
    uint64_t *a_lo = lo, *a_hi = hi, *b_lo = tlo, *b_hi = thi;
    int nwords = hi ? 2 : 1;
    for (int w = 0; w < nwords; ++w) {
        for (int d = 0; d < 4; ++d) {
            int sh = 16 * d;
            auto digit = [&](int64_t i) -> uint32_t {
                uint64_t v = w == 0 ? a_lo[i] : a_hi[i];
                return (uint32_t)((v >> sh) & 0xFFFF);
            };
            uint32_t first = digit(0);
            bool same = true;
            std::fill(cnt.begin(), cnt.end(), 0);
            for (int64_t i = 0; i < n; ++i) {
                uint32_t dg = digit(i);
                same &= (dg == first);
                ++cnt[dg];
            }
            if (same) continue;
            int64_t acc = 0;
            for (int j = 0; j < D; ++j) {
                int64_t c = cnt[(size_t)j];
                cnt[(size_t)j] = acc;
                acc += c;
            }
            for (int64_t i = 0; i < n; ++i) {
                int64_t o = cnt[digit(i)]++;
                b_lo[o] = a_lo[i];
                if (hi) b_hi[o] = a_hi[i];
            }
            std::swap(a_lo, b_lo);
            std::swap(a_hi, b_hi);
        }
    }
    if (a_lo != lo) {
        std::memcpy(lo, a_lo, (size_t)n * 8);
        if (hi) std::memcpy(hi, a_hi, (size_t)n * 8);
    }
}

// Run-length count of a sorted key range; emit keys with count in
// [min_count, max_count] to out_* (caller sizes them at n worst case).
// Returns the number emitted.
int64_t rt_rle_filter(const uint64_t* hi, const uint64_t* lo, int64_t n,
                      int64_t min_count, int64_t max_count,
                      uint64_t* out_hi, uint64_t* out_lo,
                      int64_t* out_cnt) {
    int64_t m = 0;
    int64_t i = 0;
    while (i < n) {
        int64_t j = i + 1;
        if (hi) {
            while (j < n && hi[j] == hi[i] && lo[j] == lo[i]) ++j;
        } else {
            while (j < n && lo[j] == lo[i]) ++j;
        }
        int64_t c = j - i;
        if (c >= min_count && c <= max_count) {
            out_lo[m] = lo[i];
            if (hi) out_hi[m] = hi[i];
            out_cnt[m] = c;
            ++m;
        }
        i = j;
    }
    return m;
}

}  // extern "C"
