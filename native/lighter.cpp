// Lighter pass-3 error-correction walk, native runtime component.
//
// 1:1 transcription of genomics_tpu/models/corrector.py's pass-3
// (_mark_solid / _longest_solid / _fix_right / _fix_left /
// _correct_prepared), which is itself the documented transcription of
// the reference's error_correct.cu:85-716 (Non-CDP/NvB/nvLighter) with
// the one in-code-documented fix_left deviation.  The walk is a deeply
// branchy scalar state machine (per-base trusted-run extension with
// 4-way trials, ambiguity bookkeeping, anchor re-seeding) — the wrong
// shape for the VPU, the right shape for a native loop: each read's
// walk is independent, so the batch parallelizes with OpenMP across
// host cores while the TPU runs DP kernels.
//
// Bloom probes replicate index/bloom.py exactly: splitmix64 double
// hashing, probe p_i = (h1 + i*h2) mod n_bits with 64-bit wraparound.

#include <cstdint>
#include <cstring>

namespace {

struct Bloom {
    const uint32_t* words;
    uint64_t n_bits;
    int k;
};

static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x ^= x >> 30;
    x *= 0xBF58476D1CE4E5B9ULL;
    x ^= x >> 27;
    x *= 0x94D049BB133111EBULL;
    x ^= x >> 31;
    return x;
}

static inline bool bloom_query(const Bloom& b, uint64_t key) {
    uint64_t h1 = splitmix64(key);
    uint64_t h2 = splitmix64(h1) | 1ULL;
    for (int i = 0; i < b.k; i++) {
        uint64_t p = (h1 + (uint64_t)i * h2) % b.n_bits;
        if (!((b.words[p >> 5] >> (p & 31)) & 1u)) return false;
    }
    return true;
}

// utils.h:75-138 KmerCode (mirrors corrector.py _KmerCode)
struct KmerCode {
    uint64_t mask, code;
    int len, invalid;

    explicit KmerCode(int k)
        : mask((k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1)),
          code(0), len(k), invalid(-1) {}

    void restart() { code = 0; invalid = -1; }

    void push_back(int c) {
        if (invalid != -1) invalid += 1;
        code = ((code << 2) & mask) | (uint64_t)(c & 3);
        if (c >= 4) invalid = 0;
        if (invalid >= len) invalid = -1;
    }

    void shift_right(int k) {
        if (invalid != -1) invalid -= k;
        code = (code >> (2 * k)) & (mask >> (2 * k));
        if (invalid < 0) invalid = -1;
    }

    void push_front(int c) {
        shift_right(1);
        if (c >= 4) invalid = len - 1;
        code = (code | ((uint64_t)(c & 3) << (2 * (len - 1)))) & mask;
    }

    bool is_valid() const { return invalid == -1; }
};

struct Ctx {
    const Bloom* trusted;
    const uint8_t* read;   // 2-bit codes, 4 = N
    int read_len;
    int K;
};

static inline bool is_trusted(const Ctx& c, const KmerCode& k) {
    if (!k.is_valid()) return false;
    return bloom_query(*c.trusted, k.code);
}

// corrector.py _longest_solid
static void longest_solid(const uint8_t* solid, int kmer_count,
                          int* out_begin, int* out_end) {
    int best_len = 0, best_begin = 0;
    int run = 0, start = 0;
    for (int i = 0; i <= kmer_count; i++) {
        bool s = (i < kmer_count) && solid[i];
        if (s) {
            if (run == 0) start = i;
            run++;
        } else {
            if (run > best_len) { best_len = run; best_begin = start; }
            run = 0;
        }
    }
    if (best_len == 0) { *out_begin = 0; *out_end = 0; return; }
    if (best_len >= kmer_count) { *out_begin = best_begin; *out_end = kmer_count; return; }
    *out_begin = best_begin;
    *out_end = best_begin + best_len;
}

// corrector.py _best_right_change
static void best_right_change(const Ctx& c, int frm, int to,
                              const KmerCode& fixed_kmer,
                              KmerCode* out_kmer, int* out_to,
                              int* out_change, int* out_count) {
    const int K = c.K;
    KmerCode best_kmer(K);
    bool have_best = false;
    int best_to = -1, best_change = -1, best_count = 0;
    for (int j = 0; j < 4; j++) {
        KmerCode kmer = fixed_kmer;
        kmer.push_back(j);
        if (!is_trusted(c, kmer)) continue;
        if (best_to == -1) best_to = frm - 1;
        int k = frm;
        while (k <= to) {
            kmer.push_back((int)c.read[k]);
            if (!is_trusted(c, kmer)) break;
            k++;
        }
        if (k > to && to == c.read_len - 1) {
            for (int m = 0; m < K - 1 - (to - frm + 1); m++) {
                for (int l = 0; l < 4; l++) {
                    KmerCode tmp = kmer;
                    tmp.push_back(l);
                    if (is_trusted(c, tmp)) {
                        kmer.push_back(l);
                        k++;
                        break;
                    }
                }
            }
        }
        if (k > best_to) {
            best_count = 1; best_to = k; best_change = j;
            best_kmer = kmer; have_best = true;
        } else if (k == best_to) {
            best_count += 1;
            if (k == frm && j == 0) {
                best_count = 1; best_change = j; best_kmer = kmer;
                have_best = true;
            } else if (k == frm && best_change == 0) {
                best_count = 1;   // reference quirk (:237-238)
            }
        }
    }
    (void)have_best;
    *out_kmer = best_kmer;
    *out_to = best_to;
    *out_change = best_change;
    *out_count = best_count;
}

static bool check_right(const Ctx& c, KmerCode tmp, int pos, int ln) {
    for (int t = 0; t < ln; t++) {
        tmp.push_back((int)c.read[pos + t]);
        if (!is_trusted(c, tmp)) return false;
    }
    return true;
}

static bool adjust_right(const Ctx& c, const KmerCode& kmer, int pos) {
    const int K = c.K;
    if (pos + K / 2 + 1 >= c.read_len) return false;
    for (int ch = 0; ch < 4; ch++) {
        if (ch == (int)c.read[pos - 1]) continue;
        KmerCode tmp = kmer;
        tmp.shift_right(1);
        tmp.push_back(ch);
        if (is_trusted(c, tmp) && check_right(c, tmp, pos, K / 2 + 1))
            return true;
    }
    return false;
}

// corrector.py _fix_right; fix entries: -1 none, -2 ambiguous, else base
static void fix_right(const Ctx& c, int lx, int ly, int8_t* fix,
                      const uint8_t* solid, int* out_trim,
                      bool* out_ambiguous) {
    const int K = c.K;
    const int read_len = c.read_len;
    int trim_start = read_len;
    bool ambiguous = false;
    int longest_count = ly - lx;
    int kmer_count = read_len - K + 1;
    int i = ly;
    KmerCode kmer(K);
    if (ly >= kmer_count) {
        i = read_len + 1;
    } else if (longest_count < K) {
        for (i = ly; i < ly - 1 + K; i++) kmer.push_back((int)c.read[i]);
        i = ly - 1 + K;
    } else {
        for (int j = K / 2 - 1; j >= 0; j--) {
            kmer.restart();
            for (i = ly - j - 1; i < ly - j + K - 1; i++)
                kmer.push_back((int)c.read[i]);
            i = ly - j + K - 1;
            if (adjust_right(c, kmer, i)) {
                i -= 1;
                kmer.shift_right(1);
                break;
            }
        }
    }
    while (i < read_len) {
        int frm = i + 1;
        int to = (i + K - 1 < read_len) ? i + K - 1 : read_len - 1;
        KmerCode tmp_kmer(K);
        int best_to, best_change, best_count;
        best_right_change(c, frm, to, kmer, &tmp_kmer, &best_to,
                          &best_change, &best_count);
        if (best_to == -1 ||
            (best_count > 1 && (best_to <= to || to - i + 1 < K))) {
            trim_start = i;
            break;
        }
        if (best_count <= 1) fix[i] = (int8_t)best_change;
        else { fix[i] = -2; ambiguous = true; }
        if (best_to >= read_len) break;
        if (best_to <= to) {
            kmer = tmp_kmer;
            kmer.shift_right(1);
            i = best_to;
        } else {
            int knext = to - K + 2;
            while (knext < kmer_count && solid[knext]) knext++;
            if (knext >= kmer_count) break;
            kmer.restart();
            for (i = knext; i < knext + K - 1; i++)
                kmer.push_back(fix[i] < 0 ? (int)c.read[i] : (int)fix[i]);
            i = knext + K - 1;
        }
    }
    *out_trim = trim_start;
    *out_ambiguous = ambiguous;
}

// corrector.py _best_left_change
static void best_left_change(const Ctx& c, int frm, int to,
                             const KmerCode& fixed_kmer,
                             KmerCode* out_kmer, int* out_to,
                             int* out_change, int* out_count) {
    const int K = c.K;
    const int read_len = c.read_len;
    KmerCode best_kmer(K);
    int best_to = read_len + 1, best_change = -1, best_count = 0;
    for (int j = 0; j < 4; j++) {
        KmerCode kmer = fixed_kmer;
        kmer.push_front(j);
        if (!is_trusted(c, kmer)) continue;
        if (best_to == read_len + 1) best_to = frm + 1;
        int k = frm;
        while (k >= to) {
            kmer.push_front((int)c.read[k]);
            if (!is_trusted(c, kmer)) break;
            k--;
        }
        if (k < to && to == 0) {
            for (int m = 0; m < K - 1 - (frm - to + 1); m++) {
                for (int l = 0; l < 4; l++) {
                    KmerCode tmp = kmer;
                    tmp.push_front(l);
                    if (is_trusted(c, tmp)) {
                        kmer.push_front(l);
                        k--;
                        break;
                    }
                }
            }
        }
        if (k < best_to) {
            best_count = 1; best_to = k; best_change = j;
            best_kmer = kmer;
        } else if (k == best_to) {
            best_count += 1;
            if (k == frm && j == (int)c.read[frm + 1]) {
                best_count = 1; best_change = j; best_kmer = kmer;
            } else if (k == frm && best_change == (int)c.read[frm + 1]) {
                best_count = 1;
            }
        }
    }
    *out_kmer = best_kmer;
    *out_to = best_to;
    *out_change = best_change;
    *out_count = best_count;
}

static bool check_left(const Ctx& c, KmerCode tmp, int pos, int ln) {
    for (int t = 0; t < ln; t++) {
        tmp.push_front((int)c.read[pos - t]);
        if (!is_trusted(c, tmp)) return false;
    }
    return true;
}

static bool adjust_left(const Ctx& c, const KmerCode& kmer, int pos) {
    const int K = c.K;
    if (pos - 1 - K / 2 < 0) return false;
    for (int ch = 0; ch < 4; ch++) {
        if (ch == (int)c.read[pos]) continue;
        KmerCode tmp = kmer;
        tmp.push_back(0);
        tmp.push_front(ch);
        if (is_trusted(c, tmp) && check_left(c, tmp, pos - 1, K / 2 + 1))
            return true;
    }
    return false;
}

// corrector.py _fix_left (with its documented fix_left deviation)
static void fix_left(const Ctx& c, int lx, int ly, int8_t* fix,
                     const uint8_t* solid, int* out_bad_prefix,
                     bool* out_ambiguous) {
    const int K = c.K;
    const int read_len = c.read_len;
    int bad_prefix = 0;
    bool ambiguous = false;
    int longest_count = ly - lx;
    KmerCode kmer(K);
    int i = lx - 1;
    if (longest_count < K) {
        if (lx > 0) {
            kmer.restart();
            for (int p = lx; p < lx + K - 1; p++)
                kmer.push_back((int)c.read[p]);
            kmer.push_back(0);
        }
    } else {
        bool fired = false;
        for (int j = K / 2 - 1; j >= 0; j--) {
            int pos = lx + j;
            kmer.restart();
            for (int p = pos; p < pos + K; p++)
                kmer.push_back((int)c.read[p]);
            if (adjust_left(c, kmer, pos)) {
                i = pos;
                kmer.push_back(0);
                fired = true;
                break;
            }
        }
        if (!fired) {
            if (lx > 0) {
                kmer.restart();
                for (int p = lx; p < lx + K - 1; p++)
                    kmer.push_back((int)c.read[p]);
                kmer.push_back(0);
            } else {
                i = -1;
            }
        }
    }
    while (i >= 0) {
        int frm = i - 1;
        int to = (i - K + 1 > 0) ? i - K + 1 : 0;
        KmerCode tmp_kmer(K);
        int best_to, best_change, best_count;
        best_left_change(c, frm, to, kmer, &tmp_kmer, &best_to,
                         &best_change, &best_count);
        if (best_to == read_len + 1 ||
            (best_count > 1 && (best_to >= to || i - to + 1 < K))) {
            bad_prefix = i + 1;
            break;
        }
        if (best_count <= 1) fix[i] = (int8_t)best_change;
        else { fix[i] = -2; ambiguous = true; }
        if (best_to < 0) break;
        if (best_to >= to) {
            kmer = tmp_kmer;
            kmer.push_front(0);
            i = best_to;
        } else {
            int knext = to - 1;
            while (knext >= 0 && solid[knext]) knext--;
            if (knext < 0) break;
            kmer.restart();
            for (i = knext + 1; i < knext + K; i++)
                kmer.push_back(fix[i] < 0 ? (int)c.read[i] : (int)fix[i]);
            i = knext;
            kmer.push_back(0);
        }
    }
    *out_bad_prefix = bad_prefix;
    *out_ambiguous = ambiguous;
}

}  // namespace

extern "C" {

// Batched pass-3: codes [n_reads, max_len] 2-bit (4 = N), lens per
// read, quals (may be null → all 40).  Writes corrected codes into
// out_codes (copy of input where untouched) and the per-read
// correction count into out_ncorr (-1 = unreliable, unchanged).
int gt_lighter_pass3(const uint8_t* codes, const int32_t* lens,
                     int n_reads, int max_len, const uint8_t* quals,
                     const uint32_t* bloom_words, uint64_t n_bits,
                     int bloom_k, int K, double max_correction,
                     int bad_quality, uint8_t* out_codes,
                     int32_t* out_ncorr) {
    Bloom trusted{bloom_words, n_bits, bloom_k};

#pragma omp parallel for schedule(dynamic, 64)
    for (int r = 0; r < n_reads; r++) {
        const uint8_t* read = codes + (size_t)r * max_len;
        uint8_t* out = out_codes + (size_t)r * max_len;
        int read_len = lens[r];
        std::memcpy(out, read, max_len);
        if (read_len < K) { out_ncorr[r] = 0; continue; }
        int kmer_count = read_len - K + 1;

        // solid marking (one rolling kmer per read)
        uint8_t solid_buf[4096];
        uint8_t* solid = solid_buf;
        KmerCode kc(K);
        for (int p = 0; p < K - 1; p++) kc.push_back((int)read[p]);
        for (int i = 0; i < kmer_count; i++) {
            kc.push_back((int)read[i + K - 1]);
            solid[i] = is_trusted({&trusted, read, read_len, K}, kc) ? 1 : 0;
        }

        int lx, ly;
        longest_solid(solid, kmer_count, &lx, &ly);
        if (ly - lx == 0) { out_ncorr[r] = -1; continue; }
        if (ly - lx >= kmer_count) { out_ncorr[r] = 0; continue; }

        Ctx c{&trusted, read, read_len, K};
        int8_t fix_buf[4096];
        int8_t* fix = fix_buf;
        for (int i = 0; i < read_len; i++) fix[i] = -1;
        int trim_start;
        bool amb_r, amb_l;
        fix_right(c, lx, ly, fix, solid, &trim_start, &amb_r);
        int bad_prefix;
        fix_left(c, lx, ly, fix, solid, &bad_prefix, &amb_l);
        bool ambiguous = amb_r || amb_l;

        // max-correction density cap over K-wide windows
        double run = 0.0;
        bool over = false;
        double win[4096];
        for (int i = 0; i < read_len; i++) {
            double w = (fix[i] >= 0 && read[i] < 4)
                           ? ((quals && (int)quals[(size_t)r * max_len + i] <=
                               bad_quality)
                                  ? 0.5
                                  : 1.0)
                           : 0.0;
            win[i] = w;
            run += w;
            if (i >= K) run -= win[i - K];
            if (run > max_correction) { over = true; break; }
        }
        if (over) { out_ncorr[r] = -1; continue; }

        int corrections = 0;
        for (int i = bad_prefix; i < trim_start; i++) {
            if (fix[i] >= 0 && out[i] != (uint8_t)fix[i]) {
                out[i] = (uint8_t)fix[i];
                corrections++;
            }
        }
        int bad_suffix = read_len - trim_start;
        if (corrections == 0 && bad_prefix == 0 && bad_suffix == 0 &&
            ambiguous) {
            std::memcpy(out, read, max_len);
            out_ncorr[r] = -1;
            continue;
        }
        out_ncorr[r] = corrections;
    }
    return 0;
}

}  // extern "C"
