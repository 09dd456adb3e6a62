// SA-IS suffix array construction (induced sorting), C++17.
//
// Native replacement for the index-construction sort: the reference uses an
// incremental BWT-SW builder (reference src/BWT_Index/bwt_gen.c) designed to
// bound 2008-era RAM; here the full suffix array is built in O(n) by SA-IS
// and the BWT/occ/SA-samples derive from it in numpy. Independent
// implementation of the standard SA-IS algorithm (Nong, Zhang & Chan 2009),
// templated over the index type so genomes beyond 2^31 use 64-bit indices.
//
// Convention: the input must END with a unique smallest symbol (sentinel),
// i.e. t[n-1] == 0 and t[i] > 0 for i < n-1. The Python caller appends it.
//
// Exported C ABI (returns 0 on success):
//   int sais_u8_i32(const uint8_t* text, int32_t n, int32_t* sa)
//   int sais_u8_i64(const uint8_t* text, int64_t n, int64_t* sa)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename I>
void get_buckets(const std::vector<I>& counts, std::vector<I>& bkt, I k,
                 bool end) {
    I sum = 0;
    for (I c = 0; c < k; c++) {
        sum += counts[c];
        bkt[c] = end ? sum : sum - counts[c];
    }
}

template <typename I, typename T>
void induce(const T* t, I* sa, const std::vector<bool>& stype,
            const std::vector<I>& counts, std::vector<I>& bkt, I n, I k) {
    // induce L-type from sorted LMS/S
    get_buckets<I>(counts, bkt, k, false);
    for (I i = 0; i < n; i++) {
        I j = sa[i];
        if (j > 0 && !stype[j - 1]) sa[bkt[t[j - 1]]++] = j - 1;
    }
    // induce S-type from L
    get_buckets<I>(counts, bkt, k, true);
    for (I i = n - 1; i >= 0; i--) {
        I j = sa[i];
        if (j > 0 && stype[j - 1]) sa[--bkt[t[j - 1]]] = j - 1;
        if (i == 0) break;
    }
}

template <typename I, typename T>
void sais_core(const T* t, I* sa, I n, I k) {
    // n >= 1, t[n-1] is the unique smallest symbol.
    if (n == 1) { sa[0] = 0; return; }

    std::vector<bool> stype(n);
    stype[n - 1] = true;
    for (I i = n - 2;; i--) {
        stype[i] = (t[i] < t[i + 1]) || (t[i] == t[i + 1] && stype[i + 1]);
        if (i == 0) break;
    }
    auto is_lms = [&](I i) { return i > 0 && stype[i] && !stype[i - 1]; };

    std::vector<I> counts(k, 0), bkt(k);
    for (I i = 0; i < n; i++) counts[t[i]]++;

    // step 1: bucket LMS suffixes (text order), induce a first full sort
    get_buckets<I>(counts, bkt, k, true);
    std::fill(sa, sa + n, (I)-1);
    for (I i = 1; i < n; i++)
        if (is_lms(i)) sa[--bkt[t[i]]] = i;
    induce<I, T>(t, sa, stype, counts, bkt, n, k);

    // step 2: collect LMS in sorted order, name LMS substrings
    I n1 = 0;
    for (I i = 0; i < n; i++)
        if (is_lms(sa[i])) sa[n1++] = sa[i];
    std::fill(sa + n1, sa + n, (I)-1);
    I name = 0, prev = (I)-1;
    for (I i = 0; i < n1; i++) {
        I pos = sa[i];
        bool diff = false;
        if (prev == (I)-1) {
            diff = true;
        } else {
            for (I d = 0; d < n; d++) {
                if (t[pos + d] != t[prev + d] ||
                    stype[pos + d] != stype[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
            }
        }
        if (diff) { name++; prev = pos; }
        sa[n1 + pos / 2] = name - 1;
    }
    // compact the sparse names (stored at n1 + pos/2, increasing pos) into
    // the tail of sa, preserving text order of the LMS positions
    for (I i = n - 1, j = n - 1;; i--) {
        if (sa[i] != (I)-1) sa[j--] = sa[i];
        if (i == n1) break;
    }
    I* s1 = sa + n - n1;

    // step 3: sort the reduced problem (s1's last element is the sentinel's
    // name 0, unique and smallest, so the convention holds recursively)
    if (name < n1) {
        sais_core<I, I>(s1, sa, n1, name);
    } else {
        for (I i = 0; i < n1; i++) sa[s1[i]] = i;
    }

    // step 4: map the reduced SA back to LMS text positions
    {
        std::vector<I> lms;
        lms.reserve(n1);
        for (I i = 1; i < n; i++)
            if (is_lms(i)) lms.push_back(i);
        std::vector<I> sorted(n1);
        for (I i = 0; i < n1; i++) sorted[i] = lms[sa[i]];

        // step 5: final induced sort from the fully sorted LMS order
        get_buckets<I>(counts, bkt, k, true);
        std::fill(sa, sa + n, (I)-1);
        for (I i = n1 - 1;; i--) {
            sa[--bkt[t[sorted[i]]]] = sorted[i];
            if (i == 0) break;
        }
    }
    induce<I, T>(t, sa, stype, counts, bkt, n, k);
}

}  // namespace

extern "C" {

int sais_u8_i32(const uint8_t* text, int32_t n, int32_t* sa) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (text[n - 1] != 0) return -2;
    for (int32_t i = 0; i + 1 < n; i++)
        if (text[i] == 0) return -2;
    sais_core<int32_t, uint8_t>(text, sa, n, 256);
    return 0;
}

int sais_u8_i64(const uint8_t* text, int64_t n, int64_t* sa) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (text[n - 1] != 0) return -2;
    for (int64_t i = 0; i + 1 < n; i++)
        if (text[i] == 0) return -2;
    sais_core<int64_t, uint8_t>(text, sa, n, 256);
    return 0;
}

}  // extern "C"
