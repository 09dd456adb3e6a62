"""Block repair, splitting, dedup, gap filling.

Host-side emulation of reference stages S4-S8
(src/ProcessCandidateAlignment.cpp:63-276, src/GSAlign.cpp:393-471).
Each block's FragPairs are struct-of-arrays; per-pair trims are vectorized
(each consecutive-pair comparison mutates only the left pair, so a whole
pass is data-parallel).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from gsalign_tpu.config import AlignConfig
from gsalign_tpu.genome.coords import ChrLocIndex, reverse_ref_coordinate
from gsalign_tpu.pipeline.chain import Block
from gsalign_tpu.pipeline.kmer import cal_gap_similarity


def cal_block_score(blk: Block, cfg: AlignConfig) -> int:
    """CalAlnBlockScore (src/ProcessCandidateAlignment.cpp:26-36)."""
    if blk.n == 0:
        return 0
    region = int(blk.q_pos[-1] + blk.q_len[-1] - blk.q_pos[0])
    if region < cfg.min_aln_length:
        return 0
    return int(blk.q_len.sum())


def remove_overlaps(blk: Block) -> None:
    """RemoveOverlaps (src/ProcessCandidateAlignment.cpp:189-231), in place.

    One pass trims each pair i against its successor (ref overlap then query
    overlap, both shrinking i); pairs whose successor starts at or before
    them, or that shrink to nothing, are dropped and the pass repeats.
    """
    q_pos, r_pos = blk.q_pos, blk.r_pos
    q_len, r_len = blk.q_len, blk.r_len
    while True:
        n = q_pos.shape[0]
        if n <= 1:
            break
        drop = np.zeros(n, dtype=bool)
        drop[:-1] = r_pos[1:] <= r_pos[:-1]
        alive = ~drop[:-1]
        ov_r = np.maximum(r_pos[:-1] + r_len[:-1] - r_pos[1:], 0)
        ov_r = np.where(alive, ov_r, 0)
        q_len_t = q_len.copy()
        r_len_t = r_len.copy()
        q_len_t[:-1] -= ov_r
        r_len_t[:-1] -= ov_r
        dead = alive & ((q_len_t[:-1] <= 0) | (r_len_t[:-1] <= 0))
        drop[:-1] |= dead
        alive &= ~dead
        ov_q = np.maximum(q_pos[:-1] + q_len_t[:-1] - q_pos[1:], 0)
        ov_q = np.where(alive, ov_q, 0)
        q_len_t[:-1] -= ov_q
        r_len_t[:-1] -= ov_q
        dead2 = alive & ((q_len_t[:-1] <= 0) | (r_len_t[:-1] <= 0))
        drop[:-1] |= dead2
        q_len, r_len = q_len_t, r_len_t
        if not drop.any():
            break
        keep = ~drop
        q_pos, r_pos = q_pos[keep], r_pos[keep]
        q_len, r_len = q_len[keep], r_len[keep]
    n = q_pos.shape[0]
    blk.q_pos, blk.r_pos, blk.q_len, blk.r_len = q_pos, r_pos, q_len, r_len
    blk.b_seed = np.ones(n, dtype=bool)
    blk.aln1 = [None] * n
    blk.aln2 = [None] * n


def _split_block(blk: Block, break_points: np.ndarray, cfg: AlignConfig
                 ) -> List[Block]:
    """Split at break points; keep sub-blocks with score > MinAlnBlockScore
    (strict >, src/ProcessCandidateAlignment.cpp:108,148)."""
    subs: List[Block] = []
    bounds = np.concatenate([[0], break_points, [blk.n]]).astype(np.int64)
    for i in range(len(bounds) - 1):
        s, e = int(bounds[i]), int(bounds[i + 1])
        sub = Block(
            q_pos=blk.q_pos[s:e].copy(), r_pos=blk.r_pos[s:e].copy(),
            q_len=blk.q_len[s:e].copy(), r_len=blk.r_len[s:e].copy(),
            b_seed=np.ones(e - s, dtype=bool),
            aln1=[None] * (e - s), aln2=[None] * (e - s))
        sub.score = cal_block_score(sub, cfg)
        if sub.score > cfg.min_aln_block_score:
            subs.append(sub)
    return subs


def check_gaps_between_seeds(blk: Block, qry_chars: np.ndarray,
                             ref_chars: np.ndarray, cfg: AlignConfig
                             ) -> Optional[List[Block]]:
    """CheckGapsBetweenSeeds (src/ProcessCandidateAlignment.cpp:120-156).

    Returns replacement sub-blocks if the block was split, else None.
    """
    n = blk.n
    if n < 2:
        return None
    q_gap = blk.q_pos[1:] - blk.q_pos[:-1] - blk.q_len[:-1]
    r_gap = blk.r_pos[1:] - blk.r_pos[:-1] - blk.r_len[:-1]
    candidates = np.nonzero((q_gap > cfg.gap_check_size) |
                            (r_gap > cfg.gap_check_size))[0]
    break_points = []
    for i in candidates:
        i = int(i)
        if q_gap[i] > cfg.max_seed_gap or r_gap[i] > cfg.max_seed_gap:
            break_points.append(i + 1)
            continue
        similar = cal_gap_similarity(
            qry_chars, ref_chars,
            int(blk.q_pos[i] + blk.q_len[i]), int(blk.q_pos[i + 1]),
            int(blk.r_pos[i] + blk.r_len[i]), int(blk.r_pos[i + 1]),
            cfg.max_seed_gap)
        if not similar:
            break_points.append(i + 1)
    if not break_points:
        return None
    return _split_block(blk, np.asarray(break_points, dtype=np.int64), cfg)


def check_span_multiple_chrs(blk: Block, chr_index: ChrLocIndex,
                             cfg: AlignConfig) -> Optional[List[Block]]:
    """CheckAlnBlockSpanMultipleRefChrs (src/ProcessCandidateAlignment.cpp:81-118).

    Sequential emulation of its last_rPos logic: a break point is recorded
    whenever a pair's rPos passes the segment-end key of the current anchor.
    """
    n = blk.n
    if n < 2:
        return None
    keys = chr_index.key_of(blk.r_pos)
    break_points = []
    last_key = int(keys[0])
    for j in range(1, n):
        if int(blk.r_pos[j]) > last_key:
            break_points.append(j)
            last_key = int(keys[j])
    if not break_points:
        return None
    return _split_block(blk, np.asarray(break_points, dtype=np.int64), cfg)


def remove_bad_blocks(blocks: List[Block]) -> List[Block]:
    """RemoveBadAlnBlocks (src/ProcessCandidateAlignment.cpp:72-79):
    sort by score descending, drop zero-score blocks. Python sort is stable
    (the reference's std::sort is not; ties are order-ambiguous there)."""
    blocks = sorted(blocks, key=lambda b: -b.score)
    while blocks and blocks[-1].score == 0:
        blocks.pop()
    return blocks


def est_chromosome_similarity(blocks: List[Block], chr_index: ChrLocIndex
                              ) -> np.ndarray:
    """EstChromosomeSimilarity (src/GSAlign.cpp:393-407)."""
    scores = np.zeros(chr_index.genome.n_chr, dtype=np.int64)
    live = [blk for blk in blocks if blk.n]
    if live:
        cis = chr_index.chr_of(
            np.asarray([b.r_pos[0] for b in live], dtype=np.int64))
        np.add.at(scores, cis, np.asarray([b.score for b in live]))
    return scores


def remove_redundant_blocks(blocks: List[Block], chr_scores: np.ndarray,
                            chr_index: ChrLocIndex, cfg: AlignConfig,
                            axis: int) -> List[Block]:
    """RemoveRedundantAlnBlocks (src/GSAlign.cpp:415-471). axis 1: query,
    axis 2: reference."""
    if axis == 1:
        blocks = sorted(blocks, key=lambda b: (int(b.q_pos[0]), -b.score))
    else:
        blocks = sorted(blocks, key=lambda b: (int(b.r_pos[0]), -b.score))
    n = len(blocks)
    if n == 0:
        return blocks
    # precompute heads/tails/chromosomes in one vectorized pass (immutable
    # during the sweep; only scores/b_dup mutate) — the per-pair chr_of
    # array round-trips dominated this stage at 100Mb scale
    if axis == 1:
        heads = [int(b.q_pos[0]) for b in blocks]
        tails = [int(b.q_pos[-1] + b.q_len[-1] - 1) for b in blocks]
    else:
        heads = [int(b.r_pos[0]) for b in blocks]
        tails = [int(b.r_pos[-1] + b.r_len[-1] - 1) for b in blocks]
    chrv = chr_index.chr_of(
        np.asarray([b.r_pos[0] for b in blocks], dtype=np.int64)).tolist()
    if axis == 2:
        for k in range(n):
            if heads[k] >= chr_index.size:
                heads[k], tails[k] = reverse_ref_coordinate(
                    chr_index.two_size, heads[k], tails[k])
    # The reference's O(n^2) sweep already breaks at the first
    # non-overlapping j (heads ascend), so its real cost is the overlap
    # depth — EXCEPT that killed (score-0) blocks are re-visited by every
    # later i's inner scan. A singly-linked "next live" list unlinks a
    # block the moment it dies, which is semantics-preserving (a dead
    # block never changes state again and both loops skip it) and keeps
    # repeat-rich inputs (10^4-10^5 blocks at human-chr scale) near-linear.
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    linked = [True] * n

    def unlink(j):
        # idempotent: traversal may reach a node through a stale nxt
        # pointer after it was already unlinked (nxt always points
        # forward, so progress and completeness are preserved)
        if not linked[j]:
            return
        linked[j] = False
        p, q = prv[j], nxt[j]
        if p >= 0:
            nxt[p] = q
        if q >= 0:
            prv[q] = p

    i = 0
    while i != -1:
        bi = blocks[i]
        i_next = nxt[i]
        if bi.score == 0:
            unlink(i)
            i = i_next
            continue
        head1, tail1, chr1 = heads[i], tails[i], chrv[i]
        j = nxt[i]
        while j != -1:
            bj = blocks[j]
            j_next = nxt[j]
            if bj.score == 0:
                unlink(j)
                j = j_next
                continue
            head2, tail2 = heads[j], tails[j]
            if axis == 1 and head1 == head2 and tail1 == tail2:
                bi.b_dup = True
                bj.score = 0
                unlink(j)
                j = j_next
                continue
            chr2 = chrv[j]
            if head2 < tail1:   # overlap
                overlap = (tail1 - head2) if tail2 > tail1 else (tail2 - head2)
                f1 = overlap / (tail1 - head1)
                f2 = overlap / (tail2 - head2)
                dominated2 = cfg.one_on_one and \
                    _dup_chr_score(chr_scores[chr2], chr_scores[chr1])
                dominated1 = cfg.one_on_one and \
                    _dup_chr_score(chr_scores[chr1], chr_scores[chr2])
                if (f1 > f2 and f1 >= cfg.dup_overlap_frac) or dominated2:
                    bi.score = 0
                    unlink(i)
                    break
                if (f2 > f1 and f2 >= cfg.dup_overlap_frac) or dominated1:
                    bj.score = 0
                    unlink(j)
            else:
                break
            j = j_next
        i = i_next
    return remove_bad_blocks(blocks)


def _dup_chr_score(score1: int, score2: int) -> bool:
    """CheckDuplicatedChrScore (src/GSAlign.cpp:409-413)."""
    return score1 > score2 and score1 >= score2 * 2


def fill_block_gaps(blk: Block) -> None:
    """IdentifyNormalPairs (src/ProcessCandidateAlignment.cpp:241-265):
    insert a non-seed FragPair for each inter-seed (qGap, rGap), merged into
    (qPos, rPos) order."""
    n = blk.n
    if n <= 1:
        return
    q_gap = np.maximum(blk.q_pos[1:] - (blk.q_pos[:-1] + blk.q_len[:-1]), 0)
    r_gap = np.maximum(blk.r_pos[1:] - (blk.r_pos[:-1] + blk.r_len[:-1]), 0)
    need = (q_gap > 0) | (r_gap > 0)
    idx = np.nonzero(need)[0]
    if idx.size == 0:
        return
    g_qpos = blk.q_pos[idx] + blk.q_len[idx]
    g_rpos = blk.r_pos[idx] + blk.r_len[idx]
    g_qlen = q_gap[idx]
    g_rlen = r_gap[idx]
    # Direct interleave: with pairs sorted and non-overlapping (this runs
    # after RemoveOverlaps), gap i sorts strictly before pair idx[i]+1
    # (q_gap > 0 gives a smaller qPos; q_gap == 0 needs r_gap > 0, a
    # smaller rPos at equal qPos) and never before its own pair (lexsort
    # stability keeps the pair first on equal keys) — so each gap lands
    # right after its pair, no O(n log n) lexsort. A vectorized
    # monotonicity check guards the invariant and falls back to the
    # lexsort semantics if some caller ever violates it.
    m = n + idx.size
    dest_pairs = np.arange(n)
    dest_pairs[1:] += np.cumsum(need)
    dest_gaps = dest_pairs[idx] + 1
    all_qpos = np.empty(m, dtype=blk.q_pos.dtype)
    all_rpos = np.empty(m, dtype=blk.r_pos.dtype)
    all_qlen = np.empty(m, dtype=blk.q_len.dtype)
    all_rlen = np.empty(m, dtype=blk.r_len.dtype)
    all_seed = np.empty(m, dtype=bool)
    for dst, a, g in ((all_qpos, blk.q_pos, g_qpos),
                      (all_rpos, blk.r_pos, g_rpos),
                      (all_qlen, blk.q_len, g_qlen),
                      (all_rlen, blk.r_len, g_rlen)):
        dst[dest_pairs] = a
        dst[dest_gaps] = g
    all_seed[dest_pairs] = blk.b_seed
    all_seed[dest_gaps] = False
    ok = bool(np.all((all_qpos[1:] > all_qpos[:-1])
                     | ((all_qpos[1:] == all_qpos[:-1])
                        & (all_rpos[1:] >= all_rpos[:-1]))))
    if not ok:
        aq = np.concatenate([blk.q_pos, g_qpos])
        ar = np.concatenate([blk.r_pos, g_rpos])
        order = np.lexsort((ar, aq))
        all_qpos, all_rpos = aq[order], ar[order]
        all_qlen = np.concatenate([blk.q_len, g_qlen])[order]
        all_rlen = np.concatenate([blk.r_len, g_rlen])[order]
        all_seed = np.concatenate(
            [blk.b_seed, np.zeros(idx.size, dtype=bool)])[order]
    blk.q_pos = all_qpos
    blk.r_pos = all_rpos
    blk.q_len = all_qlen
    blk.r_len = all_rlen
    blk.b_seed = all_seed
    blk.aln1 = [None] * blk.n
    blk.aln2 = [None] * blk.n
