"""FM-index: BWT + occ checkpoints + sampled suffix array.

Array layout designed for batched device rank queries (see ops/rank.py),
mirroring the semantics (not the bytes) of the reference index
(src/BWT_Index/bwtindex.c:53-75 interleaved layout, src/bwt_search.cpp:45-119
occ queries, src/BWT_Index/bwt.c:101-123 SA sampling):

- ``bwt_packed``: uint32 words, 16 bases/word, base k at bits ``(~k & 15)*2``
  (same within-word order as BWA so masks line up with the reference math).
- ``occ_cp``:    [n_blocks, 4] counts of each base in B'[0 : 128*b) — one
  checkpoint per 128-base block, gathered then refined by popcount.
- ``sa_samples``: SA_full[k] for k % sa_intv == 0 (rank space includes the
  sentinel row: sa_samples[0] == seq_len).
- ``l2``:        L2[c] = # of symbols < c in the text (L2[0]=0, L2[4]=seq_len).
- ``primary``:   rank of the full-text suffix (the $ row the BWT omits).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from gsalign_tpu.genome.packing import Genome
from gsalign_tpu.index.suffix_array import build_suffix_array

OCC_INTERVAL = 128          # bases per checkpoint block
WORDS_PER_BLOCK = OCC_INTERVAL // 16


@dataclasses.dataclass
class FMIndex:
    seq_len: int                 # 2N (fwd + RC)
    primary: int
    l2: np.ndarray               # int64 [5]
    bwt_packed: np.ndarray       # uint32 [n_blocks * 8]
    occ_cp: np.ndarray           # int32/int64 [n_blocks, 4]
    sa_samples: np.ndarray       # int32/int64 [ceil((seq_len+1)/intv)]
    sa_intv: int
    genome: Optional[Genome] = None

    @property
    def rank_dtype(self):
        return self.occ_cp.dtype


def pack_bwt_codes(bcodes: np.ndarray) -> np.ndarray:
    """Pack base codes (uint8, 0..3) into uint32 words, 16/word, BWA bit order."""
    n = bcodes.shape[0]
    n_words = -(-n // 16)
    padded = np.zeros(n_words * 16, dtype=np.uint32)
    padded[:n] = bcodes
    lanes = padded.reshape(n_words, 16)
    shifts = ((15 - np.arange(16)) * 2).astype(np.uint32)
    return np.bitwise_or.reduce(lanes << shifts, axis=1).astype(np.uint32)


def build_fmindex(genome: Genome, sa_intv: int = 8,
                  prefer_device: bool = True,
                  sa_full: Optional[np.ndarray] = None) -> FMIndex:
    """Build the FM-index over the genome's fwd+RC text."""
    assert sa_intv & (sa_intv - 1) == 0, "sa_intv must be a power of two"
    text = genome.codes_fwd_rc()
    n = int(text.shape[0])
    if sa_full is None:
        sa_full = build_suffix_array(text, prefer_device=prefer_device)
    assert sa_full.shape[0] == n + 1 and sa_full[0] == n

    primary = int(np.nonzero(sa_full == 0)[0][0])
    mask = sa_full > 0
    bcodes = text[sa_full[mask] - 1]          # $-removed BWT, n entries

    counts = np.bincount(text, minlength=4)[:4]
    l2 = np.zeros(5, dtype=np.int64)
    l2[1:] = np.cumsum(counts)

    # occ checkpoints: exclusive cumulative per-char counts at block starts
    n_blocks = -(-n // OCC_INTERVAL)
    padded = np.full(n_blocks * OCC_INTERVAL, 255, dtype=np.uint8)
    padded[:n] = bcodes
    block_view = padded.reshape(n_blocks, OCC_INTERVAL)
    per_block = np.stack([(block_view == c).sum(axis=1) for c in range(4)], axis=1)
    occ_cp = np.zeros((n_blocks, 4), dtype=np.int64)
    occ_cp[1:] = np.cumsum(per_block, axis=0)[:-1]
    cp_dtype = np.int32 if n < (1 << 31) else np.int64
    occ_cp = occ_cp.astype(cp_dtype)

    bwt_packed = pack_bwt_codes(bcodes)
    # pad packed words to whole blocks so rank gathers are unconditional
    want = n_blocks * WORDS_PER_BLOCK
    if bwt_packed.shape[0] < want:
        bwt_packed = np.concatenate(
            [bwt_packed, np.zeros(want - bwt_packed.shape[0], dtype=np.uint32)])

    sa_dtype = np.int32 if n < (1 << 31) else np.int64
    sa_samples = sa_full[::sa_intv].astype(sa_dtype)

    return FMIndex(
        seq_len=n, primary=primary, l2=l2, bwt_packed=bwt_packed,
        occ_cp=occ_cp, sa_samples=sa_samples, sa_intv=sa_intv, genome=genome,
    )


# ---- host-side (numpy) reference queries, used by tests and small runs ----

def occ4_np(fm: FMIndex, k: int) -> np.ndarray:
    """Counts of each base in B'[0..k_adj] — mirrors bwt_occ4
    (src/bwt_search.cpp:69-86). k == -1 returns zeros."""
    if k == -1:
        return np.zeros(4, dtype=np.int64)
    ka = k - (1 if k >= fm.primary else 0)
    block = ka >> 7
    cnt = fm.occ_cp[block].astype(np.int64).copy()
    word0 = block * WORDS_PER_BLOCK
    widx = (ka >> 4) & 7
    words = fm.bwt_packed[word0: word0 + WORDS_PER_BLOCK]
    m_in_word = (ka & 15) + 1
    for j in range(WORDS_PER_BLOCK):
        if j > widx:
            break
        m = 16 if j < widx else m_in_word
        w = int(words[j])
        for pos in range(m):
            cnt[(w >> ((15 - pos) * 2)) & 3] += 1
    return cnt


def bwt_code_at_np(fm: FMIndex, x: int) -> int:
    w = int(fm.bwt_packed[x >> 4])
    return (w >> ((~x & 15) << 1)) & 3


def occ1_np(fm: FMIndex, k: int, c: int) -> int:
    """Single-char occ — mirrors bwt_occ (src/bwt_search.cpp:45-67)."""
    if k == fm.seq_len:
        return int(fm.l2[c + 1] - fm.l2[c])
    if k == -1:
        return 0
    return int(occ4_np(fm, k)[c])


def inv_psi_np(fm: FMIndex, k: int) -> int:
    """bwt_invPsi (src/bwt_search.cpp:121-127)."""
    x = k - (1 if k > fm.primary else 0)
    c = bwt_code_at_np(fm, x)
    x = int(fm.l2[c]) + occ1_np(fm, k, c)
    return 0 if k == fm.primary else x


def sa_lookup_np(fm: FMIndex, k: int) -> int:
    """bwt_sa (src/bwt_search.cpp:129-139): LF-walk to a sampled rank."""
    sa = 0
    mask = fm.sa_intv - 1
    while k & mask:
        sa += 1
        k = inv_psi_np(fm, k)
    return (sa + int(fm.sa_samples[k // fm.sa_intv])) % (fm.seq_len + 1)
