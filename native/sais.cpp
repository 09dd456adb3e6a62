// SA-IS suffix array construction (induced sorting), C++17.
//
// Native replacement for the index-construction sort: the reference uses an
// incremental BWT-SW builder (reference src/BWT_Index/bwt_gen.c) designed to
// bound 2008-era RAM; here the full suffix array is built in O(n) by SA-IS
// and the BWT/occ/SA-samples derive from it in numpy. Independent
// implementation of the standard SA-IS algorithm (Nong, Zhang & Chan 2009),
// templated over the index type so genomes beyond 2^31 use 64-bit indices.
//
// Performance notes (vs the textbook formulation):
//  - character and suffix type are FUSED into one array tt[i] = t[i]*2 +
//    stype[i], so the induction hot loops issue ONE random read per element
//    instead of two (text + type bitmap); buckets are kept per fused class
//    (L-part then S-part of each character), which also removes the
//    re-derivation of bucket boundaries between the two induction passes.
//  - the genome alphabet is 6 (sentinel + A/C/G/T/N-substituted), passed as
//    k instead of 256, keeping all bucket state in registers/L1.
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

// tt[i] = t[i] * 2 + stype[i]  (stype: 1 = S-type, 0 = L-type).
// Fused-class buckets: class v = c*2+s occupies [starts[v], starts[v+1]).
template <typename I, typename TT>
void fused_bucket_starts(const TT* tt, I n, I k2, std::vector<I>& starts) {
    starts.assign(k2 + 1, 0);
    for (I i = 0; i < n; i++) starts[tt[i] + 1]++;
    for (I v = 0; v < k2; v++) starts[v + 1] += starts[v];
}

template <typename I, typename TT>
void induce(const TT* tt, I* sa, const std::vector<I>& starts,
            std::vector<I>& bkt, I n, I k2) {
    // induce L-type from sorted LMS/S: ascending scan, append at L fronts.
    // The tt[j-1] read is a dependent random access and the loop's latency
    // bound; prefetching it a few iterations ahead (a stale sa[] read is
    // harmless — any value is -1 or a valid index) is worth ~2x.
    bkt.assign(starts.begin(), starts.begin() + k2);
    for (I i = 0; i < n; i++) {
        if (i + 16 < n) {
            I jp = sa[i + 16];
            if (jp > 0) __builtin_prefetch(tt + jp - 1);
        }
        I j = sa[i];
        if (j > 0) {
            TT v = tt[j - 1];
            if (!(v & 1)) sa[bkt[v]++] = j - 1;
        }
    }
    // induce S-type from L: descending scan, prepend at S ends
    for (I v = 0; v < k2; v++) bkt[v] = starts[v + 1];
    for (I i = n - 1; i >= 0; i--) {
        if (i >= 16) {
            I jp = sa[i - 16];
            if (jp > 0) __builtin_prefetch(tt + jp - 1);
        }
        I j = sa[i];
        if (j > 0) {
            TT v = tt[j - 1];
            if (v & 1) sa[--bkt[v]] = j - 1;
        }
        if (i == 0) break;
    }
}

template <typename I, typename TT>
void sais_core(const TT* t, I* sa, I n, I k) {
    // n >= 1, t[n-1] is the unique smallest symbol.
    if (n == 1) { sa[0] = 0; return; }

    // fused char+type array; computed right to left
    std::vector<TT> ttv(n);
    TT* tt = ttv.data();
    tt[n - 1] = (TT)(t[n - 1] * 2 + 1);
    for (I i = n - 2;; i--) {
        TT s = (t[i] < t[i + 1]) ||
               (t[i] == t[i + 1] && (tt[i + 1] & 1)) ? 1 : 0;
        tt[i] = (TT)(t[i] * 2 + s);
        if (i == 0) break;
    }
    auto is_lms = [&](I i) {
        return i > 0 && (tt[i] & 1) && !(tt[i - 1] & 1);
    };

    I k2 = (I)(k * 2);
    std::vector<I> starts, bkt;
    fused_bucket_starts<I, TT>(tt, n, k2, starts);

    // step 1: bucket LMS suffixes at their S-bucket ends (text order),
    // induce a first full sort
    bkt.assign(k2, 0);
    for (I v = 0; v < k2; v++) bkt[v] = starts[v + 1];
    std::fill(sa, sa + n, (I)-1);
    for (I i = n - 1; i >= 1; i--)
        if ((tt[i] & 1) && !(tt[i - 1] & 1)) sa[--bkt[tt[i]]] = i;
    induce<I, TT>(tt, sa, starts, bkt, n, k2);

    // step 2: collect LMS in sorted order, name LMS substrings
    I n1 = 0;
    for (I i = 0; i < n; i++)
        if (is_lms(sa[i])) sa[n1++] = sa[i];
    std::fill(sa + n1, sa + n, (I)-1);
    I name = 0, prev = (I)-1;
    for (I i = 0; i < n1; i++) {
        if (i + 8 < n1) {
            I pp = sa[i + 8];
            __builtin_prefetch(tt + pp);
            __builtin_prefetch(sa + n1 + pp / 2, 1);
        }
        I pos = sa[i];
        bool diff = false;
        if (prev == (I)-1) {
            diff = true;
        } else {
            for (I d = 0; d < n; d++) {
                if (tt[pos + d] != tt[prev + d]) { diff = true; break; }
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

    // step 4: map the reduced SA back to LMS text positions (reuse s1 as
    // the text-order LMS table; sa[0..n1) holds the reduced SA)
    {
        std::vector<I> lms;
        lms.reserve((size_t)n1);
        for (I i = 1; i < n; i++)
            if ((tt[i] & 1) && !(tt[i - 1] & 1)) lms.push_back(i);
        std::vector<I> sorted((size_t)n1);
        for (I i = 0; i < n1; i++) {
            if (i + 16 < n1) __builtin_prefetch(lms.data() + sa[i + 16]);
            sorted[i] = lms[sa[i]];
        }

        // step 5: final induced sort from the fully sorted LMS order
        bkt.assign(k2, 0);
        for (I v = 0; v < k2; v++) bkt[v] = starts[v + 1];
        std::fill(sa, sa + n, (I)-1);
        for (I i = n1 - 1;; i--) {
            I p = sorted[i];
            sa[--bkt[tt[p]]] = p;
            if (i == 0) break;
        }
    }
    induce<I, TT>(tt, sa, starts, bkt, n, k2);
}

}  // namespace

extern "C" {

int sais_u8_i32(const uint8_t* text, int32_t n, int32_t* sa) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (text[n - 1] != 0) return -2;
    uint8_t kmax = 0;
    for (int32_t i = 0; i + 1 < n; i++) {
        if (text[i] == 0) return -2;
        if (text[i] > kmax) kmax = text[i];
    }
    sais_core<int32_t, uint8_t>(text, sa, n, (int32_t)kmax + 1);
    return 0;
}

int sais_u8_i64(const uint8_t* text, int64_t n, int64_t* sa) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (text[n - 1] != 0) return -2;
    uint8_t kmax = 0;
    for (int64_t i = 0; i + 1 < n; i++) {
        if (text[i] == 0) return -2;
        if (text[i] > kmax) kmax = text[i];
    }
    sais_core<int64_t, uint8_t>(text, sa, n, (int64_t)kmax + 1);
    return 0;
}

}  // extern "C"
