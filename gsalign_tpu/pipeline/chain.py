"""Seed grouping, chaining, outlier removal, block construction.

Host-side vectorized (numpy) emulation of the reference's stages S2-S3
(SeedGrouping src/GSAlign.cpp:126-143, SeedGroupAnalysis src/GSAlign.cpp:305-375
and helpers :145-303). These heuristics are order-dependent; the observable
behavior is reproduced exactly. Seed counts here are 10^4-10^6 — scalar-cheap
next to seeding/DP — so clarity and parity win over device offload; the
PosDiff sort that dominates is already done on device by the seeding stage.

Integer division in the reference is C++ int64 (truncation toward zero);
`_trunc_div` mirrors that. `PosDiff >> 4` is an arithmetic shift (floor).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from gsalign_tpu.config import AlignConfig


def _trunc_div(a: int, b: int) -> int:
    """C++ integer division (truncates toward zero)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@dataclasses.dataclass
class Block:
    """An alignment block: struct-of-arrays over its FragPairs.

    Equivalent of AlnBlock_t (src/structure.h:115-122); aln1/aln2 are filled
    per non-seed pair by the DP stage.
    """
    q_pos: np.ndarray      # int64 [n]
    r_pos: np.ndarray      # int64 [n]
    q_len: np.ndarray      # int64 [n]
    r_len: np.ndarray      # int64 [n]
    b_seed: np.ndarray     # bool  [n]
    score: int = 0
    aln_len: int = 0
    b_dup: bool = False
    aln1: list = dataclasses.field(default_factory=list)  # per-pair bytes|None
    aln2: list = dataclasses.field(default_factory=list)
    coor = None

    @property
    def n(self) -> int:
        return int(self.q_pos.shape[0])

    def pos_diff(self) -> np.ndarray:
        return self.r_pos - self.q_pos


def seed_grouping(pos_diff: np.ndarray, max_indel_size: int
                  ) -> List[Tuple[int, int]]:
    """Split PosDiff-sorted seeds where consecutive diffs exceed MaxIndelSize
    (SeedGrouping, src/GSAlign.cpp:126-143). Returns [start, end) pairs."""
    n = int(pos_diff.shape[0])
    if n == 0:
        return []
    brk = np.nonzero((pos_diff[1:] - pos_diff[:-1]) > max_indel_size)[0] + 1
    bounds = np.concatenate([[0], brk, [n]])
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(len(bounds) - 1)]


def _unique_mask(q_pos: np.ndarray) -> np.ndarray:
    """True where a qPos occurs exactly once (src/GSAlign.cpp:316-325).
    Assumes q_pos sorted ascending."""
    n = q_pos.shape[0]
    uniq = np.ones(n, dtype=bool)
    if n > 1:
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = q_pos[1:] == q_pos[:-1]
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = q_pos[:-1] == q_pos[1:]
        uniq = ~(same_prev | same_next)
    return uniq


def _remove_outlier_seeds(pd: np.ndarray, b_seed: np.ndarray,
                          uniq: np.ndarray, lo: int, hi: int,
                          cfg: AlignConfig, genome_size: int) -> None:
    """RemoveOutlierSeeds + RefinePDFmap + Check_PD_Frequency
    (src/GSAlign.cpp:145-153, 245-296) on the [lo, hi) slice, in place."""
    _remove_outlier_seeds_batch(
        pd, b_seed, uniq, np.asarray([lo], np.int64),
        np.asarray([hi], np.int64), cfg, genome_size)


def _remove_outlier_seeds_batch(pd: np.ndarray, b_seed: np.ndarray,
                                uniq: np.ndarray, iv_lo: np.ndarray,
                                iv_hi: np.ndarray, cfg: AlignConfig,
                                genome_size: int) -> None:
    """The outlier kill of _remove_outlier_seeds over MANY [lo, hi)
    intervals at once (they partition the group — 13k tiny python calls
    dominated the chain stage at 100 Mb). Per interval: histogram the
    unique seeds' PosDiff>>4 bins, keep the FIRST max-count bin (std::map
    ascending-iteration semantics), zero bins >= 3 away, average the
    survivors' PosDiff (C++ truncating division), kill seeds far from the
    average whose bin frequency is below Min_PD_Freq."""
    u = np.nonzero(uniq)[0]
    su = np.searchsorted(u, iv_lo)
    eu = np.searchsorted(u, iv_hi)
    nz = eu > su
    su, eu = su[nz], eu[nz]
    if su.size == 0:
        return
    lens = eu - su
    sel = u[_segidx(su, lens)]              # unique seed idx, interval-major
    iid = np.repeat(np.arange(su.size, dtype=np.int64), lens)
    iv_bounds = np.concatenate([[0], np.cumsum(lens)])
    binv = pd[sel] >> 4                     # arithmetic shift
    bmin = int(binv.min())
    span = int(binv.max()) - bmin + 1
    key = iid * span + (binv - bmin)
    ukey, counts = np.unique(key, return_counts=True)
    kid = ukey // span
    seg = np.nonzero(np.concatenate([[True], kid[1:] != kid[:-1]]))[0]
    segmax = np.maximum.reduceat(counts, seg)
    segid = np.cumsum(np.concatenate(
        [[0], (kid[1:] != kid[:-1]).astype(np.int64)]))
    # first max-count bin per interval: reversed fill keeps the first
    is_max = counts == segmax[segid]
    first_max = np.zeros(seg.size, dtype=np.int64)
    hit = np.nonzero(is_max)[0]
    first_max[segid[hit[::-1]]] = hit[::-1]
    max_bin = ukey[first_max] % span        # per present-interval, offset
    freq = np.where(np.abs((ukey % span) - max_bin[segid]) >= 3, 0, counts)
    freq_elem = freq[np.searchsorted(ukey, key)]
    good = freq_elem > 0
    pd_sel = pd[sel]
    sums = np.add.reduceat(np.where(good, pd_sel, 0), iv_bounds[:-1])
    ngood = np.add.reduceat(good.astype(np.int64), iv_bounds[:-1])
    safe = np.maximum(ngood, 1)
    avg = np.where(ngood > 0,
                   np.sign(sums) * (np.abs(sums) // safe),   # trunc toward 0
                   np.int64(genome_size))
    kill = (np.abs(avg[iid] - pd_sel) > cfg.max_indel_size) & \
        (freq_elem < cfg.min_pd_freq)
    b_seed[sel[kill]] = False


def _outlier_pass(q_pos, pd, b_seed, uniq, cfg, genome_size) -> None:
    """The interval-driven outlier sweep (src/GSAlign.cpp:326-338).

    The reference walks every seed; here the walk jumps straight between
    TRIGGERS (a unique seed with a PosDiff change, at least 30 uniques
    after the last reset, spanning > 3000 bp) — triggers are >= 30 uniques
    apart, so the python loop runs per interval, not per seed. The trigger
    predicate reads only q_pos/pd/uniq (never b_seed), so precomputing it
    is exact."""
    n = q_pos.shape[0]
    if n == 0:
        _remove_outlier_seeds(pd, b_seed, uniq, 0, n, cfg, genome_size)
        return
    u = np.nonzero(uniq)[0]
    chg = np.zeros(u.size, dtype=bool)
    nz = u > 0
    chg[nz] = pd[u[nz]] != pd[u[nz] - 1]
    # Both trigger conditions are monotone along the candidate list (u is
    # ascending, so q_pos[u] is nondecreasing): the next trigger is the
    # intersection of two up-sets, i.e. max of two binary searches — the
    # naive full-tail rescan per trigger was quadratic at 100 Mb scale.
    cand_k = np.nonzero(chg)[0]
    cand_qp = q_pos[u[cand_k]]
    from gsalign_tpu import native_lib
    nb = native_lib.outlier_bounds(cand_k, cand_qp, q_pos, u)
    if nb is not None:
        bv = np.concatenate([nb, [n]])
    else:
        i_full = 0
        base = 0              # uniques consumed before the current reset
        bounds = [0]
        while base + 29 < u.size:
            i1 = int(np.searchsorted(cand_k, base + 29))
            i2 = int(np.searchsorted(cand_qp, q_pos[i_full] + 3000,
                                     side="right"))
            ci = max(i1, i2)
            if ci >= cand_k.size:
                break
            k = int(cand_k[ci])
            j = int(u[k])
            bounds.append(j)
            i_full = j
            base = k + 1      # the trigger unique was counted, then reset
        bounds.append(n)
        bv = np.asarray(bounds, dtype=np.int64)
    # the intervals partition the group and the kill of one never affects
    # another (the predicate reads pd/uniq only), so batch them
    _remove_outlier_seeds_batch(pd, b_seed, uniq, bv[:-1], bv[1:], cfg,
                                genome_size)


def _resolve_repeats(q_pos, pd, b_seed, uniq, cfg, genome_size) -> None:
    """Per equal-qPos run, keep the occurrence nearest the neighborhood
    PosDiff average (src/GSAlign.cpp:178-225, 341-350).

    Fully vectorized: runs only kill NON-unique seeds while their neighbor
    averages read unique live seeds (static during this pass), so runs are
    independent. Neighbor windows (up to 5 unique live seeds either side)
    come from prefix sums over the unique-live subsequence; the per-run
    "first minimum" keep is a segmented reduce."""
    n = q_pos.shape[0]
    if n == 0:
        return
    runs_start = np.nonzero(np.concatenate(
        [[True], q_pos[1:] != q_pos[:-1]]))[0]
    runs_end = np.append(runs_start[1:], n)
    multi = (runs_end - runs_start) >= 2
    rs = runs_start[multi]
    re_ = runs_end[multi]
    if rs.size == 0:
        return

    lu = np.nonzero(uniq & b_seed)[0]          # unique live positions
    cpd = np.concatenate([[0], np.cumsum(pd[lu], dtype=np.int64)])
    # previous up-to-5: lu indices in [pos-5, pos) where pos = count below s
    p_hi = np.searchsorted(lu, rs)             # (strictly below s: lu < s)
    p_lo = np.maximum(p_hi - 5, 0)
    n1 = p_hi - p_lo
    sum1 = cpd[p_hi] - cpd[p_lo]
    # next up-to-5 starting at e (inclusive: original scans p2 = e, e+1, ...)
    q_lo = np.searchsorted(lu, re_)
    q_hi = np.minimum(q_lo + 5, lu.size)
    n2 = q_hi - q_lo
    sum2 = cpd[q_hi] - cpd[q_lo]

    tot = n1 + n2
    sums = sum1 + sum2
    # C++ division truncates toward zero
    safe_tot = np.maximum(tot, 1)
    avg = np.where(tot > 0,
                   np.sign(sums) * (np.abs(sums) // safe_tot),
                   pd[rs])

    # segmented first-minimum among |pd - avg| < max_indel_size
    run_lens = re_ - rs
    member = _segidx(rs, run_lens)
    rid = np.repeat(np.arange(rs.size), run_lens)
    diffs = np.abs(pd[member] - avg[rid])
    ok = diffs < cfg.max_indel_size
    dmask = np.where(ok, diffs, np.int64(genome_size) + 1)
    bounds = np.concatenate([[0], np.cumsum(run_lens)])
    runmin = np.minimum.reduceat(dmask, bounds[:-1])
    is_min = ok & (dmask == runmin[rid])
    # first minimal member per run (strict < keeps first in scan order)
    hit = np.nonzero(is_min)[0]
    if hit.size:
        first_per_run = np.zeros(rs.size, dtype=np.int64) - 1
        # reversed fill keeps the FIRST hit per run
        first_per_run[rid[hit[::-1]]] = member[hit[::-1]]
    else:
        first_per_run = np.full(rs.size, -1, dtype=np.int64)
    b_seed[member] = False
    keepers = first_per_run[first_per_run >= 0]
    b_seed[keepers] = True


def _segidx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    adj = starts.astype(np.int64) - (np.cumsum(lens, dtype=np.int64) - lens)
    return np.repeat(adj, lens) + np.arange(total, dtype=np.int64)


def _compact_kept(q_pos, r_pos, q_len, pd, b_seed):
    """CompByRemoval sort + trim (src/GSAlign.cpp:353,363): kept seeds stay in
    qPos order (they have distinct qPos), removed ones drop off the end."""
    keep = b_seed
    return (q_pos[keep], r_pos[keep], q_len[keep], pd[keep],
            np.ones(int(keep.sum()), dtype=bool))


def seed_group_analysis(q_pos: np.ndarray, r_pos: np.ndarray,
                        q_len: np.ndarray, cfg: AlignConfig,
                        genome_size: int) -> List[Block]:
    """SeedGroupAnalysis (src/GSAlign.cpp:305-375) for one seed group.
    Returns the blocks that pass AddAlnBlock's filters (:29-49)."""
    # sort by (qPos, rPos) — CompByQueryPos
    order = np.lexsort((r_pos, q_pos))
    q_pos = q_pos[order].copy()
    r_pos = r_pos[order].copy()
    q_len = q_len[order].copy()
    pd = r_pos - q_pos
    n = q_pos.shape[0]
    b_seed = np.ones(n, dtype=bool)
    uniq = _unique_mask(q_pos)

    _outlier_pass(q_pos, pd, b_seed, uniq, cfg, genome_size)
    _resolve_repeats(q_pos, pd, b_seed, uniq, cfg, genome_size)

    q_pos, r_pos, q_len, pd, b_seed = _compact_kept(q_pos, r_pos, q_len, pd,
                                                    b_seed)
    n = q_pos.shape[0]
    # triple-noise filter (src/GSAlign.cpp:355-362): computed on the compacted
    # array; removal does not cascade (neighbors use original values).
    if n >= 3:
        noisy = (np.abs(pd[1:-1] - pd[:-2]) > 5) & \
            (np.abs(pd[1:-1] - pd[2:]) > 5)
        kill = np.zeros(n, dtype=bool)
        kill[1:-1] = noisy
        b_seed[kill] = False
        q_pos, r_pos, q_len, pd, b_seed = _compact_kept(
            q_pos, r_pos, q_len, pd, b_seed)
        n = q_pos.shape[0]

    if n == 0:
        return []
    # chain split (src/GSAlign.cpp:364-374)
    if n > 1:
        gap = q_pos[1:] - q_pos[:-1] - q_len[:-1]
        jump = np.abs(pd[:-1] - pd[1:]) > cfg.chain_pd_break
        brk = np.nonzero((gap > cfg.max_seed_gap) | jump)[0] + 1
    else:
        brk = np.zeros(0, dtype=np.int64)
    bounds = np.concatenate([[0], brk, [n]]).astype(np.int64)

    blocks: List[Block] = []
    for bi in range(len(bounds) - 1):
        s, e = int(bounds[bi]), int(bounds[bi + 1])
        score = int(q_len[s:e].sum())
        region = int(q_pos[e - 1] + q_len[e - 1] - q_pos[s])
        # AddAlnBlock filters (src/GSAlign.cpp:38)
        if score < cfg.min_aln_block_score or region < cfg.min_aln_length or \
                (score < 1000 and score < region * 0.05):
            continue
        blocks.append(Block(
            q_pos=q_pos[s:e].copy(), r_pos=r_pos[s:e].copy(),
            q_len=q_len[s:e].copy(), r_len=q_len[s:e].copy(),
            b_seed=np.ones(e - s, dtype=bool), score=score,
            aln1=[None] * (e - s), aln2=[None] * (e - s)))
    return blocks


def generate_alignment_blocks(q_pos: np.ndarray, r_pos: np.ndarray,
                              length: np.ndarray, cfg: AlignConfig,
                              genome_size: int) -> List[Block]:
    """Stages S2+S3: group PosDiff-sorted seeds, analyze each group
    (SeedGrouping + GenerateAlignmentBlocks, src/GSAlign.cpp:126-143,377-391).
    """
    pd = r_pos - q_pos
    blocks: List[Block] = []
    for s, e in seed_grouping(pd, cfg.max_indel_size):
        if int(length[s:e].sum()) < cfg.min_aln_block_score:
            continue
        blocks.extend(seed_group_analysis(
            q_pos[s:e], r_pos[s:e], length[s:e], cfg, genome_size))
    return blocks
