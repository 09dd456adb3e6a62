"""Genome model: 2-bit packing, ambiguity holes, fwd+RC text.

Re-designs the reference's bntseq packing (src/BWT_Index/bntseq.c:107-211)
as vectorized numpy: bases map through the nt4 table (A=0,C=1,G=2,T=3,other=4),
ambiguous bases become lrand48()&3 with the fixed seed 11
(bntseq.c:144,173-174), runs of identical ambiguity codes are recorded as
"holes", and the index text is the forward genome followed by its reverse
complement (bntseq.c:184-190) so one FM-index serves both strands.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

# nst_nt4_table equivalent (reference src/BWT_Index/bntseq.c:40-57):
# 'A'/'a'->0, 'C'/'c'->1, 'G'/'g'->2, 'T'/'t'->3, everything else->4.
NT4_TABLE = np.full(256, 4, dtype=np.uint8)
for _ch, _code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    NT4_TABLE[ord(_ch)] = _code
    NT4_TABLE[ord(_ch.lower())] = _code

_CODE2CHAR = np.frombuffer(b"ACGTN", dtype=np.uint8)

_LRAND48_A = 0x5DEECE66D
_LRAND48_C = 0xB
_LRAND48_MASK = (1 << 48) - 1


class Lrand48:
    """Exact lrand48 (POSIX drand48 family) for N->base parity.

    X_{n+1} = (a*X_n + c) mod 2^48, a=0x5DEECE66D, c=0xB;
    srand48(seed): X = (seed << 16) | 0x330E; lrand48() = X_{n+1} >> 17.
    """

    def __init__(self, seed: int = 11):
        self.x = ((seed << 16) | 0x330E) & _LRAND48_MASK

    def next(self) -> int:
        self.x = (_LRAND48_A * self.x + _LRAND48_C) & _LRAND48_MASK
        return self.x >> 17

    def draw_batch(self, n: int) -> np.ndarray:
        """Vectorized: n consecutive lrand48() values as uint64[n].

        Writes X_{k+1} = a_pow[k]*X_0 + c_sum[k] mod 2^48 for k in [0, n):
        affine-step coefficients are built iteratively for the first block,
        then extended blockwise with the composed map f_B(x) = a^B x + c_B.
        """
        if n == 0:
            return np.zeros(0, dtype=np.uint64)
        B = 4096
        a_pow = np.empty(n, dtype=np.uint64)
        c_sum = np.empty(n, dtype=np.uint64)
        ap, cs = _LRAND48_A, _LRAND48_C
        for i in range(min(n, B)):
            a_pow[i] = ap
            c_sum[i] = cs
            ap = (ap * _LRAND48_A) & _LRAND48_MASK
            cs = (cs * _LRAND48_A + _LRAND48_C) & _LRAND48_MASK
        if n > B:
            blk_a = np.uint64(pow(_LRAND48_A, B, 1 << 48))
            blk_c = np.uint64(c_sum[B - 1])  # c*(a^{B-1}+...+1) mod 2^48
            for start in range(B, n, B):
                end = min(start + B, n)
                m = end - start
                prev = slice(start - B, start - B + m)
                a_pow[start:end] = _mulmod48(a_pow[prev], blk_a)
                c_sum[start:end] = (_mulmod48(c_sum[prev], blk_a) + blk_c) \
                    & np.uint64(_LRAND48_MASK)
        x0 = np.uint64(self.x)
        xs = (_mulmod48(a_pow, x0) + c_sum) & np.uint64(_LRAND48_MASK)
        self.x = int(xs[-1])
        return xs >> np.uint64(17)


def _mulmod48(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """(a * b) mod 2^48 for uint64 arrays without overflow (24-bit limbs)."""
    M24 = np.uint64((1 << 24) - 1)
    M48 = np.uint64((1 << 48) - 1)
    a_lo, a_hi = a & M24, a >> np.uint64(24)
    b_lo, b_hi = b & M24, b >> np.uint64(24)
    lo = a_lo * b_lo
    mid = ((a_hi * b_lo + a_lo * b_hi) & M24) << np.uint64(24)
    return (lo + mid) & M48


@dataclasses.dataclass
class Hole:
    offset: int   # position in the forward concatenated genome
    length: int
    amb: int      # ASCII code of the ambiguity character


@dataclasses.dataclass
class Genome:
    """Reference genome model: chromosome table + packed fwd+RC text.

    Equivalent of the reference's bntseq_t + RestoreReferenceInfo state
    (src/structure.h:54-62, src/bwt_index.cpp:229-264).
    """

    names: List[str]
    lengths: np.ndarray          # int64 [n_chr]
    offsets: np.ndarray          # int64 [n_chr], forward start locations
    holes: List[Hole]
    codes_fwd: np.ndarray        # uint8 [N], 0..3 (ambiguity already randomized)
    seed: int = 11

    @property
    def n_chr(self) -> int:
        return len(self.names)

    @property
    def size(self) -> int:
        return int(self.codes_fwd.shape[0])

    @property
    def two_size(self) -> int:
        return 2 * self.size

    def reverse_locations(self) -> np.ndarray:
        """ReverseLocation per chromosome (src/bwt_index.cpp:248)."""
        return self.two_size - (self.offsets + self.lengths)

    def codes_fwd_rc(self) -> np.ndarray:
        """The 2N-base index text: forward genome + reverse complement."""
        cached = getattr(self, "_codes2_cache", None)
        if cached is None:
            rc = (3 - self.codes_fwd[::-1]).astype(np.uint8)
            cached = np.concatenate([self.codes_fwd, rc])
            object.__setattr__(self, "_codes2_cache", cached)
        return cached

    def chars_fwd_rc(self) -> np.ndarray:
        """ASCII 'ACGT' rendering of the 2N text (reference RefSequence,
        src/bwt_index.cpp:193-227; N positions appear as their random base)."""
        cached = getattr(self, "_chars2_cache", None)
        if cached is None:
            cached = _CODE2CHAR[self.codes_fwd_rc()]
            object.__setattr__(self, "_chars2_cache", cached)
        return cached


def chars_to_codes(seq_ascii: np.ndarray) -> np.ndarray:
    return NT4_TABLE[seq_ascii]


def codes_to_chars(codes: np.ndarray) -> np.ndarray:
    return _CODE2CHAR[codes]


def pack_genome(records: Sequence[Tuple[str, np.ndarray]], seed: int = 11) -> Genome:
    """Pack FASTA records into a Genome, replacing ambiguous bases with
    lrand48()&3 in file order (parity with bntseq.c:144,173-174).
    """
    rng = Lrand48(seed)
    names: List[str] = []
    lengths: List[int] = []
    offsets: List[int] = []
    holes: List[Hole] = []
    code_parts: List[np.ndarray] = []
    offset = 0
    for name, seq_ascii in records:
        names.append(name)
        n = int(seq_ascii.shape[0])
        lengths.append(n)
        offsets.append(offset)
        codes = NT4_TABLE[seq_ascii].copy()
        amb = codes == 4
        n_amb = int(amb.sum())
        if n_amb:
            # hole bookkeeping: runs of the *same ASCII char* merge
            # (bntseq.c:126-140 merges only when lasts == current char)
            idx = np.nonzero(amb)[0]
            chars = seq_ascii[idx]
            brk = np.ones(n_amb, dtype=bool)
            if n_amb > 1:
                brk[1:] = (idx[1:] != idx[:-1] + 1) | (chars[1:] != chars[:-1])
            starts = np.nonzero(brk)[0]
            ends = np.append(starts[1:], n_amb)
            for s, e in zip(starts, ends):
                holes.append(Hole(offset + int(idx[s]), int(e - s), int(chars[s])))
            codes[idx] = (rng.draw_batch(n_amb) & np.uint64(3)).astype(np.uint8)
        code_parts.append(codes)
        offset += n
    return Genome(
        names=names,
        lengths=np.asarray(lengths, dtype=np.int64),
        offsets=np.asarray(offsets, dtype=np.int64),
        holes=holes,
        codes_fwd=np.concatenate(code_parts) if code_parts else
        np.zeros(0, dtype=np.uint8),
        seed=seed,
    )
