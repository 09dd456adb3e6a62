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


PAIR_BLOCK = 64                 # pair-symbols per pair checkpoint block


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
    # pair-symbol (alphabet-16) structures over ALL SA_full rows (no $-row
    # removal, no primary shift): two query-genome bases per rank query.
    pbwt_packed: Optional[np.ndarray] = None   # uint32 [n_pblocks*8], 4b/sym
    pair_cp: Optional[np.ndarray] = None       # int32 [n_pblocks, 16]
    c16: Optional[np.ndarray] = None           # int64 [17]
    pair_exc: Optional[np.ndarray] = None      # int32 [2] ranks with SA < 2

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


def build_fmindex(genome: Genome, sa_intv: Optional[int] = None,
                  prefer_device: bool = True,
                  sa_full: Optional[np.ndarray] = None) -> FMIndex:
    """Build the FM-index over the genome's fwd+RC text.

    sa_intv None picks automatically: the FULL suffix array (interval 1 —
    occurrence resolution becomes a single gather, no LF walks) while it
    fits a ~1.2GB budget, else every-8th sampling."""
    text = genome.codes_fwd_rc()
    n = int(text.shape[0])
    if sa_intv is None:
        sa_intv = 1 if n <= 300_000_000 else 8
    assert sa_intv & (sa_intv - 1) == 0, "sa_intv must be a power of two"
    if sa_full is None:
        sa_full = build_suffix_array(text, prefer_device=prefer_device)
    assert sa_full.shape[0] == n + 1 and sa_full[0] == n

    primary = int(np.nonzero(sa_full == 0)[0][0])
    # ONE random gather serves BWT extraction, the pair BWT, and the C16
    # keys: pack (text[i-2], text[i-1], text[i], text[i+1]) per position
    # (3 bits each; out-of-range -> 0 on the left, 4 on the right).
    ctx = np.zeros(n + 1, dtype=np.uint16)
    t16 = text.astype(np.uint16)
    ctx[2:] |= t16[:n - 1] << 9          # prev2
    ctx[1:] |= t16 << 6                  # prev1
    ctx[:n] |= t16 << 3                  # cur   (position n: cur = 4 = $)
    ctx[n] |= 4 << 3
    ctx[:n - 1] |= t16[1:]               # next
    ctx[n - 1:] |= 4
    g_ctx = ctx[sa_full]                 # [n+1] — the only big gather

    mask = sa_full > 0
    bcodes = ((g_ctx >> 6) & 7)[mask].astype(np.uint8)   # $-removed BWT

    counts = np.bincount(text, minlength=4)[:4]
    l2 = np.zeros(5, dtype=np.int64)
    l2[1:] = np.cumsum(counts)

    # occ checkpoints: exclusive cumulative per-char counts at block starts
    n_blocks = -(-n // OCC_INTERVAL)
    ids = (np.arange(n, dtype=np.int64) >> 7) * 4 + bcodes
    per_block = np.bincount(ids, minlength=n_blocks * 4).reshape(n_blocks, 4)
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

    pbwt_packed, pair_cp, c16, pair_exc = _build_pair_index(sa_full, g_ctx, n)

    return FMIndex(
        seq_len=n, primary=primary, l2=l2, bwt_packed=bwt_packed,
        occ_cp=occ_cp, sa_samples=sa_samples, sa_intv=sa_intv, genome=genome,
        pbwt_packed=pbwt_packed, pair_cp=pair_cp, c16=c16, pair_exc=pair_exc,
    )


def _build_pair_index(sa_full: np.ndarray, g_ctx: np.ndarray, n: int):
    """Alphabet-16 BWT over all SA_full rows: PBWT[i] = the pair of bases
    preceding suffix SA[i] (4*T[SA-2]+T[SA-1]); rows with SA < 2 are
    exceptions (no 2-base left context, stored as 0 and subtracted from
    class-0 ranks at query time). One backward step with a pair symbol
    consumes two query bases — half the rank queries of the seeding scan.

    g_ctx is the pre-gathered packed context per SA row (see build_fmindex).
    """
    rows = n + 1
    # narrow dtypes throughout: this host is memory-bandwidth-bound, and
    # int64 temporaries over 2N-length arrays dominate build time otherwise.
    pair_all = ((g_ctx >> 6) & np.uint16(0x3F)).astype(np.uint8)
    # bits: prev2 at 9..11, prev1 at 6..8 -> symbol = prev2*4 + prev1:
    pbwt = ((pair_all >> 3) << 2) | (pair_all & 7)
    small = np.nonzero(sa_full < 2)[0]          # exceptions: SA in {0, 1}
    pair_exc = small.astype(np.int32)
    assert pair_exc.shape[0] == 2
    pbwt[small] = 0

    # C16[c]: rows sorting strictly below the suffix block with first pair c.
    # key coarsens suffix order to 2-char granularity (short suffixes get
    # keys that slot them below the full pairs sharing their first char;
    # cur == 4 marks the $ row, nxt == 4 a length-1 suffix). Encoded so the
    # key order matches: key = cur*8 + nxt*2 + 1, with nxt==4 -> cur*8 and
    # cur==4 ($ row) -> 0 (sorts first; all real keys are >= 1).
    cn = (g_ctx & np.uint16(0x3F)).astype(np.uint8)   # cur at 3..5, nxt at 0..2
    cur8 = cn >> 3
    nxt8 = cn & 7
    keys = np.where(cur8 == 4, 0,
                    np.where(nxt8 == 4, cur8 << 3,
                             (cur8 << 3) + (nxt8 << 1) + 1)).astype(np.uint8)
    c16 = np.empty(17, dtype=np.int64)
    for c in range(16):
        a, b = c >> 2, c & 3
        c16[c] = np.searchsorted(keys, a * 8 + b * 2 + 1, side="left")
    c16[16] = rows

    # per-block class checkpoints + 4-bit packed symbols (MSB-first in word)
    n_pblocks = rows // PAIR_BLOCK + 1
    ids = (np.arange(rows, dtype=np.int64) >> 6) * 16 + pbwt
    per_block = np.bincount(ids, minlength=n_pblocks * 16).reshape(
        n_pblocks, 16)
    pair_cp = np.zeros((n_pblocks, 16), dtype=np.int64)
    pair_cp[1:] = np.cumsum(per_block, axis=0)[:-1]
    pair_cp = pair_cp.astype(np.int32)
    padded = np.zeros(n_pblocks * PAIR_BLOCK, dtype=np.uint8)
    padded[:rows] = pbwt

    syms = padded.astype(np.uint32).reshape(-1, 8)
    shifts = ((7 - np.arange(8)) * 4).astype(np.uint32)
    pbwt_packed = np.bitwise_or.reduce((syms & 0xF) << shifts, axis=1) \
        .astype(np.uint32)
    return pbwt_packed, pair_cp, c16, pair_exc


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


def rank16_np(fm: FMIndex, c: int, k: int) -> int:
    """# rows j in [0, k) with pair-symbol c (exceptions excluded)."""
    block = k // PAIR_BLOCK
    cnt = int(fm.pair_cp[block, c])
    for j in range(block * PAIR_BLOCK, k):
        w = int(fm.pbwt_packed[j >> 3])
        sym = (w >> ((7 - (j & 7)) * 4)) & 0xF
        if sym == c:
            cnt += 1
    if c == 0:
        cnt -= int((fm.pair_exc < k).sum())
    return cnt


def extend_rc_pair_np(fm: FMIndex, ik1: int, ik2: int, b1: int, b2: int):
    """Append bases (b1, b2) to P by backward-extending RC(P) with the pair
    symbol (comp(b2), comp(b1)). Returns (new_ik1, new_ik2)."""
    c = (3 - b2) * 4 + (3 - b1)
    lo = rank16_np(fm, c, ik1)
    hi = rank16_np(fm, c, ik1 + ik2)
    return int(fm.c16[c]) + lo, hi - lo


def sa_lookup_np(fm: FMIndex, k: int) -> int:
    """bwt_sa (src/bwt_search.cpp:129-139): LF-walk to a sampled rank."""
    sa = 0
    mask = fm.sa_intv - 1
    while k & mask:
        sa += 1
        k = inv_psi_np(fm, k)
    return (sa + int(fm.sa_samples[k // fm.sa_intv])) % (fm.seq_len + 1)
