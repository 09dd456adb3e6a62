"""Gap similarity heuristic.

Emulates CalGapSimilarity / CreateKmerVecFromReadSeq / CreateKmerID
(src/KmerAnalysis.cpp) including its quirks: only the literal character 'N'
interrupts k-mer formation (lowercase 'n' and other ambiguity codes flow into
the 2-bit-shift k-mer id as code 4), and the rolling id keeps just 8 bits of
history (KmerPower=0xFF) before shifting in the next 2-bit-or-3-bit code.
"""

from __future__ import annotations

import numpy as np

from gsalign_tpu.genome.packing import NT4_TABLE

KMER_SIZE = 5
KMER_POWER = 0xFF


def kmer_vector(seq_ascii: np.ndarray) -> np.ndarray:
    """Sorted k-mer id multiset of a fragment (CreateKmerVecFromReadSeq,
    src/KmerAnalysis.cpp:32-76)."""
    ln = int(seq_ascii.shape[0])
    codes = NT4_TABLE[seq_ascii].astype(np.int64)
    is_n = seq_ascii == ord("N")
    # Fast path: all codes <= 3 (no 'N', no ambiguity). The rolling-id
    # recurrence wid = ((wid & 0xFF) << 2) + c has disjoint bit fields
    # then (no addition carries), so it equals a pure 5-code sliding
    # window — one vectorized expression instead of the per-char loop
    # (ambiguity code 4 spans 3 bits and can carry, so it keeps the
    # exact sequential loop below).
    if not (codes >= 4).any():
        if ln < KMER_SIZE:
            return np.zeros(0, dtype=np.int64)
        ids = ((codes[:-4] << 8) | (codes[1:-3] << 6) | (codes[2:-2] << 4)
               | (codes[3:-1] << 2) | codes[4:])
        ids.sort()
        return ids
    out = []
    tail = 0
    # find first window of KMER_SIZE non-'N' chars
    count = 0
    head = 0
    while count < KMER_SIZE and tail < ln:
        if not is_n[tail]:
            count += 1
        else:
            count = 0
        tail += 1
    if count == KMER_SIZE:
        wid = 0
        for i in range(head, head + KMER_SIZE):
            wid = (wid << 2) + int(codes[i])
        out.append(wid)
        head += 1
        while tail < ln:
            if not is_n[tail]:
                wid = ((wid & KMER_POWER) << 2) + int(codes[tail])
                out.append(wid)
                head += 1
                tail += 1
            else:
                tail += 1
                count = 0
                while count < KMER_SIZE and tail < ln:
                    if not is_n[tail]:
                        count += 1
                    else:
                        count = 0
                    tail += 1
                if count == KMER_SIZE:
                    wid = 0
                    for i in range(head, head + KMER_SIZE):
                        wid = (wid << 2) + int(codes[i])
                    out.append(wid)
                    head += 1
                else:
                    break
    arr = np.asarray(out, dtype=np.int64)
    arr.sort()
    return arr


def _multiset_intersection_size(a: np.ndarray, b: np.ndarray) -> int:
    """|multiset intersection| of two sorted arrays (std::set_intersection)."""
    if a.size == 0 or b.size == 0:
        return 0
    vals = np.union1d(a, b)
    ca = np.searchsorted(a, vals, side="right") - np.searchsorted(a, vals, side="left")
    cb = np.searchsorted(b, vals, side="right") - np.searchsorted(b, vals, side="left")
    return int(np.minimum(ca, cb).sum())


def cal_gap_similarity(qry_chars: np.ndarray, ref_chars: np.ndarray,
                       q_pos1: int, q_pos2: int, r_pos1: int, r_pos2: int,
                       max_seed_gap: int) -> bool:
    """CalGapSimilarity (src/KmerAnalysis.cpp:78-121).

    qry_chars: the query chromosome (ASCII), ref_chars: the 2N reference text
    (ASCII, ACGT only).
    """
    q_len = q_pos2 - q_pos1
    r_len = r_pos2 - r_pos1
    similar = False
    if (r_pos1 - q_pos1) == (r_pos2 - q_pos2):
        nt1 = NT4_TABLE[ref_chars[r_pos1:r_pos1 + q_len]]
        nt2 = NT4_TABLE[qry_chars[q_pos1:q_pos2]]
        idy = int(((nt1 == nt2) | (nt1 == 4) | (nt2 == 4)).sum())
        if idy >= q_len * 0.5:
            similar = True
    if not similar and q_len <= max_seed_gap and r_len <= max_seed_gap:
        v1 = kmer_vector(qry_chars[q_pos1:q_pos2])
        v2 = kmer_vector(ref_chars[r_pos1:r_pos2])
        common = _multiset_intersection_size(v1, v2)
        if common > (q_len + r_len) * 0.1:
            similar = True
    return similar
