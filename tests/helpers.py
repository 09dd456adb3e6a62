"""Naive reference implementations used to validate the device kernels."""

from __future__ import annotations

import numpy as np


def random_genome(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n).astype(np.uint8)


def codes_to_ascii(codes: np.ndarray) -> np.ndarray:
    return np.frombuffer(b"ACGTN", dtype=np.uint8)[codes]


def naive_suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of codes+sentinel by direct sort (small inputs only)."""
    n = len(codes)
    text = bytes(bytearray((codes + 1).tolist()) + bytearray([0]))
    suffixes = sorted(range(n + 1), key=lambda i: text[i:])
    return np.asarray(suffixes, dtype=np.int64)


def naive_occurrences(text_codes: np.ndarray, pattern: np.ndarray) -> list:
    """All positions where pattern occurs in text (codes arrays)."""
    t = bytes(bytearray(text_codes.tolist()))
    p = bytes(bytearray(pattern.tolist()))
    out = []
    i = t.find(p)
    while i != -1:
        out.append(i)
        i = t.find(p, i + 1)
    return out


def naive_lmem_seeds(text_codes: np.ndarray, qry_codes: np.ndarray,
                     min_seed_length: int = 15, max_seed_freq: int = 100,
                     chunk: int = 10000, sensitive: bool = False) -> list:
    """Pure-python emulation of IdentifyLocalMEM + BWT_Search semantics
    (src/GSAlign.cpp:51-107, src/bwt_search.cpp:141-185).

    Returns [(q_pos, r_pos, length), ...] (unsorted).
    """
    L = len(qry_codes)
    seeds = []
    for cstart in range(0, L, chunk):
        stop = min(cstart + chunk, L)
        start = cstart
        while start < stop:
            if qry_codes[start] > 3:
                start += 1
                continue
            # longest prefix of qry[start:stop] present in text, stopping at
            # an ambiguous base
            end = start + 1
            while end < stop and qry_codes[end] <= 3:
                if not naive_occurrences(text_codes, qry_codes[start:end + 1]):
                    break
                end += 1
            length = end - start
            occ = naive_occurrences(text_codes, qry_codes[start:end])
            freq = len(occ)
            if length >= min_seed_length and 0 < freq <= max_seed_freq:
                for r in occ:
                    seeds.append((start, r, length))
                start += 5 if sensitive else (length + 1)
            else:
                start += 1
    return seeds
