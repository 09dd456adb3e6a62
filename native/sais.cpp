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
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <sys/resource.h>

namespace {

// GSALIGN_SAIS_DEBUG=1: print peak-RSS milestones per phase/recursion
// level to stderr (memory-budget verification for the multi-GB builds).
inline void dbg_rss(const char* phase, int64_t n, int depth) {
    static const bool on = std::getenv("GSALIGN_SAIS_DEBUG") != nullptr;
    if (!on) return;
    struct rusage ru;
    getrusage(RUSAGE_SELF, &ru);
    std::fprintf(stderr, "[sais d%d n=%lld] %-12s peakRSS=%.1f GB\n",
                 depth, (long long)n, phase, ru.ru_maxrss / 1e6);
}

// Threaded range runner (same pattern as buildtools.cpp). The INDUCTION
// scans stay sequential — their bucket-front writes are loop-carried —
// but every other phase (type array, histograms, fills, LMS placement,
// naming, compaction) is a linear pass that parallelizes per block; at
// DNA scale those phases are ~half the wall, the induction the rest.
template <typename F>
void par_ranges(int64_t n, int nt, F f) {
    if (nt <= 1 || n < (1 << 16)) {
        f(int64_t(0), n, 0);
        return;
    }
    std::vector<std::thread> ts;
    ts.reserve(nt);
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t s = t * chunk;
        int64_t e = std::min<int64_t>(n, s + chunk);
        if (s >= e) break;
        ts.emplace_back([=]() { f(s, e, t); });
    }
    for (auto& th : ts) th.join();
}

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
    // Two-stage software pipeline: stage 1 (i+48) prefetches the random
    // tt read; stage 2 (i+16) re-reads it (L2-resident by now) to learn
    // the bucket and prefetches the WRITE line sa[bkt[v]] — the write
    // miss is the other half of the latency bound. Stale sa[] reads at
    // either stage only skip a prefetch (the compute re-reads sa[i]).
    bkt.assign(starts.begin(), starts.begin() + k2);
    for (I i = 0; i < n; i++) {
        if (i + 48 < n) {
            I jp = sa[i + 48];
            if (jp > 0) __builtin_prefetch(tt + jp - 1);
        }
        if (i + 16 < n) {
            I jm = sa[i + 16];
            if (jm > 0) {
                TT vm = tt[jm - 1];
                if (!(vm & 1)) __builtin_prefetch(sa + bkt[vm], 1);
            }
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
        if (i >= 48) {
            I jp = sa[i - 48];
            if (jp > 0) __builtin_prefetch(tt + jp - 1);
        }
        if (i >= 16) {
            I jm = sa[i - 16];
            if (jm > 0) {
                TT vm = tt[jm - 1];
                if (vm & 1) __builtin_prefetch(sa + bkt[vm] - 1, 1);
            }
        }
        I j = sa[i];
        if (j > 0) {
            TT v = tt[j - 1];
            if (v & 1) sa[--bkt[v]] = j - 1;
        }
        if (i == 0) break;
    }
}

// parallel memset of sa[s, e) to -1 (all-0xFF bytes in two's complement)
template <typename I>
void par_fill_neg1(I* sa, I s, I e, int nt) {
    par_ranges(int64_t(e - s), nt, [&](int64_t a, int64_t b, int) {
        std::memset(sa + s + a, 0xFF, size_t(b - a) * sizeof(I));
    });
}

template <typename I, typename TT>
void sais_core(const TT* t, I* sa, I n, I k, int nt,
               int depth = 0) {
    // n >= 1, t[n-1] is the unique smallest symbol.
    if (n == 1) { sa[0] = 0; return; }
    if (n < (1 << 20)) nt = 1;        // recursion tail: threads don't pay

    // fused char+type array. Blocks fill right-to-left independently:
    // the seed type at a block's END is computed directly by scanning the
    // equal-char run forward (runs can't cross the sentinel, so the scan
    // terminates; reads are on the immutable text).
    dbg_rss("enter", n, depth);
    std::vector<TT> ttv(n);
    TT* tt = ttv.data();
    auto type_at = [&](I p) -> TT {
        if (p == n - 1) return 1;
        I q = p;
        while (t[q] == t[q + 1]) q++;
        return (TT)(t[q] < t[q + 1] ? 1 : 0);
    };
    tt[n - 1] = (TT)(t[n - 1] * 2 + 1);
    par_ranges(int64_t(n) - 1, nt, [&](int64_t s64, int64_t e64, int) {
        I s = (I)s64, e = (I)e64;        // over [0, n-1)
        TT cur = type_at(e);             // type of position e
        for (I i = e - 1;; i--) {
            TT st = t[i] < t[i + 1] ? 1
                    : (t[i] > t[i + 1] ? 0 : cur);
            tt[i] = (TT)(t[i] * 2 + st);
            cur = st;
            if (i == s) break;
        }
    });
    auto is_lms = [&](I i) {
        return i > 0 && (tt[i] & 1) && !(tt[i - 1] & 1);
    };

    I k2 = (I)(k * 2);
    // Deep recursion levels have HUGE alphabets (k approaches the reduced
    // problem size once LMS-substring names go mostly-distinct), so the
    // per-thread k2-sized histogram/offset vectors of the parallel
    // branches — nt * k2 * 8 B, times up to two live at once — dominate
    // peak RSS (~34 GB at the 6.2 G-row config's depth-2 level, measured).
    // Above a 2 GB per-phase budget run those phases on the sequential
    // single-vector path instead; they are linear passes over <= n1
    // elements, seconds of wall next to the induction scans.
    int nt_alph = ((int64_t)k2 * nt * (int64_t)sizeof(I)
                   > (int64_t(1) << 31)) ? 1 : nt;
    std::vector<I> starts, bkt;
    if (nt_alph <= 1) {
        fused_bucket_starts<I, TT>(tt, n, k2, starts);
    } else {
        std::vector<std::vector<I>> hist(nt, std::vector<I>(k2, 0));
        par_ranges(int64_t(n), nt, [&](int64_t s, int64_t e, int th) {
            auto& h = hist[th];
            for (int64_t i = s; i < e; i++) h[tt[i]]++;
        });
        starts.assign(k2 + 1, 0);
        for (int th = 0; th < nt; th++)
            for (I v = 0; v < k2; v++) starts[v + 1] += hist[th][v];
        for (I v = 0; v < k2; v++) starts[v + 1] += starts[v];
    }

    // step 1: bucket LMS suffixes at their S-bucket ends (text order),
    // induce a first full sort. Parallel: per-block per-class counts fix
    // each block's descending write window up front.
    par_fill_neg1<I>(sa, 0, n, nt);
    auto place_lms_from_text = [&]() {
        if (nt_alph <= 1) {
            bkt.assign(k2, 0);
            for (I v = 0; v < k2; v++) bkt[v] = starts[v + 1];
            for (I i = n - 1; i >= 1; i--)
                if (is_lms(i)) sa[--bkt[tt[i]]] = i;
            return;
        }
        std::vector<std::vector<I>> cnt(nt, std::vector<I>(k2, 0));
        int64_t lo = 1;
        par_ranges(int64_t(n) - lo, nt, [&](int64_t s, int64_t e, int th) {
            auto& c = cnt[th];
            for (int64_t i = lo + s; i < lo + e; i++)
                if (is_lms((I)i)) c[tt[i]]++;
        });
        // block b's class-v window ends at starts[v+1] minus all LATER
        // blocks' counts (the sequential loop scans text descending)
        std::vector<std::vector<I>> off(nt, std::vector<I>(k2));
        for (I v = 0; v < k2; v++) {
            I end = starts[v + 1];
            for (int b = nt - 1; b >= 0; b--) {
                off[b][v] = end;
                end -= cnt[b][v];
            }
        }
        par_ranges(int64_t(n) - lo, nt, [&](int64_t s, int64_t e, int th) {
            auto& o = off[th];
            for (int64_t i = lo + e - 1; i >= lo + s; i--)
                if (is_lms((I)i)) sa[--o[tt[i]]] = (I)i;
        });
    };
    place_lms_from_text();
    dbg_rss("lms-placed", n, depth);
    induce<I, TT>(tt, sa, starts, bkt, n, k2);
    dbg_rss("induce1", n, depth);

    // step 2: collect LMS in sorted order (stable compaction), name LMS
    // substrings. Naming parallelizes cleanly: diff[i] compares sa[i]
    // with sa[i-1] independently; names are the prefix sum of diff.
    I n1 = 0;
    if (nt <= 1) {
        for (I i = 0; i < n; i++)
            if (is_lms(sa[i])) sa[n1++] = sa[i];
    } else {
        std::vector<int64_t> c(nt + 1, 0);
        par_ranges(int64_t(n), nt, [&](int64_t s, int64_t e, int th) {
            int64_t m = 0;
            for (int64_t i = s; i < e; i++) m += is_lms(sa[i]);
            c[th + 1] = m;
        });
        for (int th = 0; th < nt; th++) c[th + 1] += c[th];
        n1 = (I)c[nt];
        std::vector<I> tmp((size_t)n1);
        par_ranges(int64_t(n), nt, [&](int64_t s, int64_t e, int th) {
            I* o = tmp.data() + c[th];
            for (int64_t i = s; i < e; i++)
                if (is_lms(sa[i])) *o++ = sa[i];
        });
        std::memcpy(sa, tmp.data(), (size_t)n1 * sizeof(I));
    }
    par_fill_neg1<I>(sa, n1, n, nt);
    I name = 0;
    if (nt <= 1 || n1 < (1 << 18)) {
        I prev = (I)-1;
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
                    if (d > 0 && (is_lms(pos + d) || is_lms(prev + d)))
                        break;
                }
            }
            if (diff) { name++; prev = pos; }
            sa[n1 + pos / 2] = name - 1;
        }
    } else {
        std::vector<uint8_t> diff((size_t)n1);
        par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int) {
            for (int64_t i = s; i < e; i++) {
                if (i == 0) { diff[0] = 1; continue; }
                I pos = sa[i], prev = sa[i - 1];
                bool df = false;
                for (I d = 0; d < n; d++) {
                    if (tt[pos + d] != tt[prev + d]) { df = true; break; }
                    if (d > 0 && (is_lms(pos + d) || is_lms(prev + d)))
                        break;
                }
                diff[i] = df;
            }
        });
        std::vector<int64_t> base(nt + 1, 0);
        int64_t chunk = (int64_t(n1) + nt - 1) / nt;
        par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int th) {
            int64_t m = 0;
            for (int64_t i = s; i < e; i++) m += diff[i];
            base[th + 1] = m;
        });
        for (int th = 0; th < nt; th++) base[th + 1] += base[th];
        name = (I)base[nt];
        par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int th) {
            (void)chunk;
            I nm = (I)base[th];
            for (int64_t i = s; i < e; i++) {
                nm += diff[i];
                sa[n1 + sa[i] / 2] = nm - 1;
            }
        });
    }
    // compact the sparse names (stored at n1 + pos/2, increasing pos) into
    // the tail of sa, preserving text order of the LMS positions
    if (nt <= 1) {
        for (I i = n - 1, j = n - 1;; i--) {
            if (sa[i] != (I)-1) sa[j--] = sa[i];
            if (i == n1) break;
        }
    } else {
        std::vector<int64_t> c(nt + 1, 0);
        par_ranges(int64_t(n) - n1, nt, [&](int64_t s, int64_t e, int th) {
            int64_t m = 0;
            for (int64_t i = n1 + s; i < n1 + e; i++) m += sa[i] != (I)-1;
            c[th + 1] = m;
        });
        for (int th = 0; th < nt; th++) c[th + 1] += c[th];
        std::vector<I> tmp((size_t)c[nt]);
        par_ranges(int64_t(n) - n1, nt, [&](int64_t s, int64_t e, int th) {
            I* o = tmp.data() + c[th];
            for (int64_t i = n1 + s; i < n1 + e; i++)
                if (sa[i] != (I)-1) *o++ = sa[i];
        });
        std::memcpy(sa + n - c[nt], tmp.data(),
                    (size_t)c[nt] * sizeof(I));
    }
    I* s1 = sa + n - n1;
    dbg_rss("named", (int64_t)n1, depth);

    // step 3: sort the reduced problem (s1's last element is the sentinel's
    // name 0, unique and smallest, so the convention holds recursively)
    if (name < n1) {
        sais_core<I, I>(s1, sa, n1, name, nt, depth + 1);
    } else {
        par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int) {
            for (int64_t i = s; i < e; i++) sa[s1[i]] = (I)i;
        });
    }

    // step 4: map the reduced SA back to LMS text positions (reuse s1 as
    // the text-order LMS table; sa[0..n1) holds the reduced SA)
    {
        std::vector<I> lms((size_t)n1);
        if (nt <= 1) {
            I m = 0;
            for (I i = 1; i < n; i++)
                if ((tt[i] & 1) && !(tt[i - 1] & 1)) lms[m++] = i;
        } else {
            std::vector<int64_t> c(nt + 1, 0);
            par_ranges(int64_t(n) - 1, nt, [&](int64_t s, int64_t e,
                                               int th) {
                int64_t m = 0;
                for (int64_t i = 1 + s; i < 1 + e; i++) m += is_lms((I)i);
                c[th + 1] = m;
            });
            for (int th = 0; th < nt; th++) c[th + 1] += c[th];
            par_ranges(int64_t(n) - 1, nt, [&](int64_t s, int64_t e,
                                               int th) {
                I* o = lms.data() + c[th];
                for (int64_t i = 1 + s; i < 1 + e; i++)
                    if (is_lms((I)i)) *o++ = (I)i;
            });
        }
        dbg_rss("lms-tab", (int64_t)n1, depth);
        std::vector<I> sorted((size_t)n1);
        par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int) {
            for (int64_t i = s; i < e; i++) {
                if (i + 16 < e) __builtin_prefetch(lms.data() + sa[i + 16]);
                sorted[i] = lms[sa[i]];
            }
        });
        std::vector<I>().swap(lms);     // dead past here: n1*8 B off peak

        // step 5: final induced sort from the fully sorted LMS order —
        // descending placement, parallel per (block, class) window
        par_fill_neg1<I>(sa, 0, n, nt);
        if (nt_alph <= 1) {
            bkt.assign(k2, 0);
            for (I v = 0; v < k2; v++) bkt[v] = starts[v + 1];
            for (I i = n1 - 1;; i--) {
                I p = sorted[i];
                sa[--bkt[tt[p]]] = p;
                if (i == 0) break;
            }
        } else {
            std::vector<std::vector<I>> cnt(nt, std::vector<I>(k2, 0));
            par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int th) {
                auto& c = cnt[th];
                for (int64_t i = s; i < e; i++) c[tt[sorted[i]]]++;
            });
            std::vector<std::vector<I>> off(nt, std::vector<I>(k2));
            for (I v = 0; v < k2; v++) {
                I end = starts[v + 1];
                for (int b = nt - 1; b >= 0; b--) {
                    off[b][v] = end;
                    end -= cnt[b][v];
                }
            }
            par_ranges(int64_t(n1), nt, [&](int64_t s, int64_t e, int th) {
                auto& o = off[th];
                for (int64_t i = e - 1; i >= s; i--) {
                    I p = sorted[i];
                    sa[--o[tt[p]]] = p;
                    if (i == 0) break;
                }
            });
        }
    }
    dbg_rss("final-place", n, depth);
    induce<I, TT>(tt, sa, starts, bkt, n, k2);
    dbg_rss("done", n, depth);
}

}  // namespace

extern "C" {

int sais_u8_i32_mt(const uint8_t* text, int32_t n, int32_t* sa, int nt) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (text[n - 1] != 0) return -2;
    uint8_t kmax = 0;
    for (int32_t i = 0; i + 1 < n; i++) {
        if (text[i] == 0) return -2;
        if (text[i] > kmax) kmax = text[i];
    }
    sais_core<int32_t, uint8_t>(text, sa, n, (int32_t)kmax + 1,
                                nt < 1 ? 1 : nt);
    return 0;
}

int sais_u8_i64_mt(const uint8_t* text, int64_t n, int64_t* sa, int nt) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (text[n - 1] != 0) return -2;
    uint8_t kmax = 0;
    for (int64_t i = 0; i + 1 < n; i++) {
        if (text[i] == 0) return -2;
        if (text[i] > kmax) kmax = text[i];
    }
    sais_core<int64_t, uint8_t>(text, sa, n, (int64_t)kmax + 1,
                                nt < 1 ? 1 : nt);
    return 0;
}

int sais_u8_i32(const uint8_t* text, int32_t n, int32_t* sa) {
    return sais_u8_i32_mt(text, n, sa, 1);
}

int sais_u8_i64(const uint8_t* text, int64_t n, int64_t* sa) {
    return sais_u8_i64_mt(text, n, sa, 1);
}

}  // extern "C"
