// Genome-scale suffix-array construction: SA-IS (induced sorting), O(n).
//
// TPU-native replacement for the reference's GPU suffix/BWT builders
// (reference: Non-CDP/NvB/nvbio/sufsort/ — 11.6k LoC of GPU prefix
// doubling + DCS; nvBWT app, Non-CDP/NvB/nvBWT/nvBWT.cu:1-961 whose
// defining workload is a whole human genome).  Index construction is a
// one-time host step here (the index is then replicated to devices), so
// a linear-time host algorithm beats a device port: SA-IS builds a
// 50 Mbp SA in seconds with ~9n bytes of working memory.
//
// Templated on the index type: int32 fast path below 2^31 - 1 symbols,
// int64 above (the 3.1 Gbp human genome needs it).  Peak RSS of the
// 64-bit path is ~13 bytes/symbol (uint16 shifted text copy + int64 SA
// + the S/L-type bitmaps across recursion levels) — ~43 GB at 3.2 Gbp.
//
// Exported C ABI (ctypes, see genomics_tpu/runtime/native.py):
//   gt_sais_u8(text, n, sa_out)    — int32 SA; sa_out has n+1 entries;
//       sa_out[0] is the appended sentinel position n, the rest the
//       suffix order of text[0..n).
//   gt_sais_u8_64(text, n, sa_out) — int64 SA, same contract, no size cap.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// bucket start (end=false) or end (end=true) offsets for each symbol
template <typename CharT, typename IdxT>
void get_buckets(const CharT* s, IdxT* bkt, IdxT n, IdxT K, bool end) {
    std::memset(bkt, 0, sizeof(IdxT) * (K + 1));
    for (IdxT i = 0; i < n; i++) bkt[s[i]]++;
    IdxT sum = 0;
    for (IdxT i = 0; i <= K; i++) {
        sum += bkt[i];
        bkt[i] = end ? sum : sum - bkt[i];
    }
}

template <typename CharT, typename IdxT>
void induce_l(const CharT* s, IdxT* sa, const uint8_t* t, IdxT* bkt,
              IdxT n, IdxT K) {
    get_buckets(s, bkt, n, K, false);
    for (IdxT i = 0; i < n; i++) {
        IdxT j = sa[i] - 1;
        if (sa[i] > 0 && !t[j]) sa[bkt[s[j]]++] = j;
    }
}

template <typename CharT, typename IdxT>
void induce_s(const CharT* s, IdxT* sa, const uint8_t* t, IdxT* bkt,
              IdxT n, IdxT K) {
    get_buckets(s, bkt, n, K, true);
    for (IdxT i = n - 1; i >= 0; i--) {
        IdxT j = sa[i] - 1;
        if (sa[i] > 0 && t[j]) sa[--bkt[s[j]]] = j;
    }
}

// s[n-1] must be a unique smallest sentinel.
template <typename CharT, typename IdxT>
void sais(const CharT* s, IdxT* sa, IdxT n, IdxT K) {
    if (n == 1) {
        sa[0] = 0;
        return;
    }
    std::vector<uint8_t> t(n);          // 1 = S-type, 0 = L-type
    t[n - 1] = 1;
    for (IdxT i = n - 2; i >= 0; i--)
        t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
    auto is_lms = [&](IdxT i) { return i > 0 && t[i] && !t[i - 1]; };

    std::vector<IdxT> bkt(K + 1);

    // ---- stage 1: sort the LMS substrings by induced sorting ----
    for (IdxT i = 0; i < n; i++) sa[i] = -1;
    get_buckets(s, bkt.data(), n, K, true);
    for (IdxT i = 1; i < n; i++)
        if (is_lms(i)) sa[--bkt[s[i]]] = i;
    induce_l(s, sa, t.data(), bkt.data(), n, K);
    induce_s(s, sa, t.data(), bkt.data(), n, K);

    // compact the sorted LMS positions to the front
    IdxT n1 = 0;
    for (IdxT i = 0; i < n; i++)
        if (sa[i] > 0 && is_lms(sa[i])) sa[n1++] = sa[i];

    // name LMS substrings (equal substrings share a name)
    for (IdxT i = n1; i < n; i++) sa[i] = -1;
    IdxT name = 0, prev = -1;
    for (IdxT i = 0; i < n1; i++) {
        IdxT pos = sa[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            for (IdxT d = 0;; d++) {
                if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    // both end here with equal content
                    if (!(is_lms(pos + d) && is_lms(prev + d))) diff = true;
                    break;
                }
            }
        }
        if (diff) {
            name++;
            prev = pos;
        }
        sa[n1 + pos / 2] = name - 1;
    }
    // gather names into s1 = sa[n - n1 .. n)
    for (IdxT i = n - 1, j = n - 1; i >= n1; i--)
        if (sa[i] >= 0) sa[j--] = sa[i];
    IdxT* s1 = sa + n - n1;

    // ---- stage 2: order the LMS suffixes ----
    if (name < n1) {
        sais<IdxT, IdxT>(s1, sa, n1, name - 1);
    } else {
        for (IdxT i = 0; i < n1; i++) sa[s1[i]] = i;
    }
    // map s1 indices back to text positions (LMS in text order)
    {
        IdxT k = 0;
        for (IdxT i = 1; i < n; i++)
            if (is_lms(i)) s1[k++] = i;     // reuse s1 as the LMS table
        for (IdxT i = 0; i < n1; i++) sa[i] = s1[sa[i]];
    }

    // ---- stage 3: induce the full SA from the sorted LMS suffixes ----
    for (IdxT i = n1; i < n; i++) sa[i] = -1;
    get_buckets(s, bkt.data(), n, K, true);
    for (IdxT i = n1 - 1; i >= 0; i--) {
        IdxT j = sa[i];
        sa[i] = -1;
        sa[--bkt[s[j]]] = j;
    }
    induce_l(s, sa, t.data(), bkt.data(), n, K);
    induce_s(s, sa, t.data(), bkt.data(), n, K);
}

}  // namespace

extern "C" {

// SA of text (uint8 symbols) + appended unique sentinel smaller than all
// symbols: sa_out must hold n+1 int32; sa_out[0] == n (the sentinel).
int gt_sais_u8(const uint8_t* text, int32_t n, int32_t* sa_out) {
    if (n < 0) return -1;
    std::vector<int32_t> s(n + 1);
    for (int32_t i = 0; i < n; i++) s[i] = (int32_t)text[i] + 1;
    s[n] = 0;
    sais<int32_t, int32_t>(s.data(), sa_out, n + 1, 256);
    return 0;
}

// 64-bit variant — no 2^31 cap (human-genome scale; nvBWT's workload).
// The shifted text copy is uint16 (symbols 1..256 after +1) to halve
// the top-level working set vs an int64 copy.
int gt_sais_u8_64(const uint8_t* text, int64_t n, int64_t* sa_out) {
    if (n < 0) return -1;
    std::vector<uint16_t> s(n + 1);
    for (int64_t i = 0; i < n; i++) s[i] = (uint16_t)text[i] + 1;
    s[n] = 0;
    sais<uint16_t, int64_t>(s.data(), sa_out, n + 1, 256);
    return 0;
}

// BWT from text + its (n+1)-entry SA (sentinel mapped to 0xFF):
// bwt_out[i] = text[sa[i]-1], or 0xFF where sa[i] == 0.
int gt_bwt_from_sa(const uint8_t* text, int32_t n, const int32_t* sa,
                   uint8_t* bwt_out) {
    for (int32_t i = 0; i <= n; i++)
        bwt_out[i] = sa[i] == 0 ? 0xFF : text[sa[i] - 1];
    return 0;
}

int gt_bwt_from_sa_64(const uint8_t* text, int64_t n, const int64_t* sa,
                      uint8_t* bwt_out) {
    for (int64_t i = 0; i <= n; i++)
        bwt_out[i] = sa[i] == 0 ? 0xFF : text[sa[i] - 1];
    return 0;
}

}  // extern "C"
