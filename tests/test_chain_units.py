"""Unit tests for the chaining/block heuristics (reference semantics)."""

import numpy as np

from gsalign_tpu.config import AlignConfig
from gsalign_tpu.pipeline import blocks as blk_ops
from gsalign_tpu.pipeline.chain import (Block, _trunc_div, _unique_mask,
                                        seed_grouping,
                                        generate_alignment_blocks)
from gsalign_tpu.pipeline.kmer import kmer_vector

CFG = AlignConfig()


def test_trunc_div_matches_cpp():
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3      # C++ truncates toward zero
    assert _trunc_div(7, -2) == -3
    assert _trunc_div(-7, -2) == 3


def test_seed_grouping_splits_on_posdiff_gap():
    # MaxIndelSize=25 (src/GSAlign.cpp:133): split where delta > 25
    pd = np.asarray([0, 10, 20, 46, 50, 100])
    groups = seed_grouping(pd, 25)
    assert groups == [(0, 3), (3, 5), (5, 6)]
    assert seed_grouping(np.asarray([5]), 25) == [(0, 1)]
    assert seed_grouping(np.zeros(0, dtype=np.int64), 25) == []


def test_unique_mask_runs():
    q = np.asarray([1, 2, 2, 2, 3, 4, 4, 5])
    np.testing.assert_array_equal(
        _unique_mask(q),
        [True, False, False, False, True, False, False, True])


def _mk_block(rows):
    rows = np.asarray(rows, dtype=np.int64)
    n = len(rows)
    return Block(q_pos=rows[:, 0].copy(), r_pos=rows[:, 1].copy(),
                 q_len=rows[:, 2].copy(), r_len=rows[:, 2].copy(),
                 b_seed=np.ones(n, dtype=bool), score=int(rows[:, 2].sum()),
                 aln1=[None] * n, aln2=[None] * n)


def test_remove_overlaps_trims_left_pair():
    # (src/ProcessCandidateAlignment.cpp:205-226): overlap shrinks pair i
    blk = _mk_block([[0, 100, 50], [40, 140, 50]])  # 10 overlap on both axes
    blk_ops.remove_overlaps(blk)
    assert blk.q_len[0] == 40 and blk.r_len[0] == 40
    assert blk.q_len[1] == 50


def test_remove_overlaps_drops_nonmonotone_ref():
    # rPos[j] <= rPos[i] -> drop i (src/ProcessCandidateAlignment.cpp:199)
    blk = _mk_block([[0, 200, 20], [30, 100, 20], [60, 260, 20]])
    blk_ops.remove_overlaps(blk)
    assert blk.n == 2
    assert blk.r_pos.tolist() == [100, 260]


def test_add_block_filters():
    # AddAlnBlock (src/GSAlign.cpp:38): score floor, region floor,
    # score < 1000 and score < region*0.05
    q = np.asarray([0, 5000])
    r = np.asarray([0, 5000])
    ln = np.asarray([150, 100])     # score 250 >= 200, region 5100
    blocks = generate_alignment_blocks(q, r, ln, CFG, genome_size=10**6)
    # score 250 < 1000 and 250 < 5100*0.05=255 -> discarded
    assert blocks == []
    ln = np.asarray([150, 110])     # score 260 > 255 -> kept
    blocks = generate_alignment_blocks(q, r, ln, CFG, genome_size=10**6)
    assert len(blocks) == 1 and blocks[0].score == 260


def test_chain_split_on_gap_and_posdiff():
    # split at qGap > 5000 or |dPD| > 100 (src/GSAlign.cpp:367)
    q = np.asarray([0, 300, 6000])
    r = np.asarray([0, 300, 6000 + 150])     # PD jumps by 150
    ln = np.asarray([250, 250, 250])
    blocks = generate_alignment_blocks(q, r, ln, CFG, genome_size=10**6)
    # PD gap 150 > MaxIndelSize=25 splits at GROUPING already; craft within
    assert all(b.score >= 200 for b in blocks)


def test_redundant_blocks_containment():
    # f >= 0.9 containment kills the smaller block (src/GSAlign.cpp:451-466)
    big = _mk_block([[0, 0, 5000]])
    small = _mk_block([[100, 90000, 450]])
    big.score, small.score = 5000, 450
    from gsalign_tpu.genome.packing import Genome
    from gsalign_tpu.genome.coords import ChrLocIndex
    g = Genome(names=["c"], lengths=np.asarray([200000]),
               offsets=np.asarray([0]), holes=[],
               codes_fwd=np.zeros(200000, dtype=np.uint8))
    ci = ChrLocIndex(g)
    out = blk_ops.remove_redundant_blocks([big, small],
                                          np.asarray([5450]), ci, CFG, axis=1)
    assert len(out) == 1 and out[0].score == 5000


def test_type1_exact_duplicate_marks_bdup():
    a = _mk_block([[100, 0, 500]])
    b = _mk_block([[100, 50000, 500]])
    a.score = b.score = 500
    from gsalign_tpu.genome.packing import Genome
    from gsalign_tpu.genome.coords import ChrLocIndex
    g = Genome(names=["c"], lengths=np.asarray([200000]),
               offsets=np.asarray([0]), holes=[],
               codes_fwd=np.zeros(200000, dtype=np.uint8))
    ci = ChrLocIndex(g)
    out = blk_ops.remove_redundant_blocks([a, b], np.asarray([1000]), ci,
                                          CFG, axis=1)
    assert len(out) == 1 and out[0].b_dup


def test_fill_block_gaps_inserts_and_orders():
    blk = _mk_block([[0, 0, 100], [150, 160, 100]])
    blk_ops.fill_block_gaps(blk)
    assert blk.n == 3
    assert not blk.b_seed[1]
    assert blk.q_pos[1] == 100 and blk.q_len[1] == 50
    assert blk.r_pos[1] == 100 and blk.r_len[1] == 60


def test_kmer_vector_reference_quirks():
    # only literal 'N' interrupts k-mers; ids keep 8 bits of history
    seq = np.frombuffer(b"ACGTACGTA", dtype=np.uint8)
    v = kmer_vector(seq)
    assert len(v) == 5              # 9 - 5 + 1
    # 'N' resets the window count but the reference never advances `head`
    # during the initial scan (src/KmerAnalysis.cpp:39-47), so the first id
    # is still taken at position 0 — including the N as code 4:
    seq_n = np.frombuffer(b"ACGTNACGTA", dtype=np.uint8)
    v = kmer_vector(seq_n)
    assert v.tolist() == [112]            # id("ACGTN") = 0b0001101100 + 4
    # lowercase 'n' does NOT interrupt (flows into ids as code 4)
    seq_low = np.frombuffer(b"ACGTnACGTA", dtype=np.uint8)
    assert len(kmer_vector(seq_low)) == 6


def _redundant_sweep_naive(blocks, chr_scores, chr_index, cfg, axis):
    """Plain O(n^2) transliteration of RemoveRedundantAlnBlocks
    (src/GSAlign.cpp:415-471) — oracle for the linked-list sweep."""
    from gsalign_tpu.genome.coords import reverse_ref_coordinate
    from gsalign_tpu.pipeline.blocks import _dup_chr_score, remove_bad_blocks
    if axis == 1:
        blocks = sorted(blocks, key=lambda b: (int(b.q_pos[0]), -b.score))
        heads = [int(b.q_pos[0]) for b in blocks]
        tails = [int(b.q_pos[-1] + b.q_len[-1] - 1) for b in blocks]
    else:
        blocks = sorted(blocks, key=lambda b: (int(b.r_pos[0]), -b.score))
        heads = [int(b.r_pos[0]) for b in blocks]
        tails = [int(b.r_pos[-1] + b.r_len[-1] - 1) for b in blocks]
    chrv = chr_index.chr_of(
        np.asarray([b.r_pos[0] for b in blocks], dtype=np.int64)).tolist()
    if axis == 2:
        for k in range(len(blocks)):
            if heads[k] >= chr_index.size:
                heads[k], tails[k] = reverse_ref_coordinate(
                    chr_index.two_size, heads[k], tails[k])
    n = len(blocks)
    for i in range(n):
        bi = blocks[i]
        if bi.score == 0:
            continue
        head1, tail1, chr1 = heads[i], tails[i], chrv[i]
        for j in range(i + 1, n):
            bj = blocks[j]
            if bj.score == 0:
                continue
            head2, tail2 = heads[j], tails[j]
            if axis == 1 and head1 == head2 and tail1 == tail2:
                bi.b_dup = True
                bj.score = 0
                continue
            chr2 = chrv[j]
            if head2 < tail1:
                overlap = (tail1 - head2) if tail2 > tail1 else (tail2 - head2)
                f1 = overlap / (tail1 - head1)
                f2 = overlap / (tail2 - head2)
                dominated2 = cfg.one_on_one and \
                    _dup_chr_score(chr_scores[chr2], chr_scores[chr1])
                dominated1 = cfg.one_on_one and \
                    _dup_chr_score(chr_scores[chr1], chr_scores[chr2])
                if (f1 > f2 and f1 >= cfg.dup_overlap_frac) or dominated2:
                    bi.score = 0
                    break
                if (f2 > f1 and f2 >= cfg.dup_overlap_frac) or dominated1:
                    bj.score = 0
            else:
                break
    return remove_bad_blocks(blocks)


def test_redundant_blocks_linkedlist_matches_naive_sweep():
    """Randomized dense-overlap block sets: the skip-list sweep must
    reproduce the plain quadratic reference sweep exactly (scores, b_dup,
    order), including one_on_one mode."""
    import copy
    import dataclasses as _dc
    from gsalign_tpu.genome.packing import Genome
    from gsalign_tpu.genome.coords import ChrLocIndex
    g = Genome(names=["c1", "c2"], lengths=np.asarray([60000, 60000]),
               offsets=np.asarray([0, 60000]), holes=[],
               codes_fwd=np.zeros(120000, dtype=np.uint8))
    ci = ChrLocIndex(g)
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 60))
        blocks = []
        for _ in range(n):
            q0 = int(rng.integers(0, 50000))
            ln = int(rng.integers(200, 4000))
            r0 = int(rng.integers(0, 230000))  # spans both strands/chrs
            blk = _mk_block([[q0, r0, ln]])
            blk.score = ln
            blocks.append(blk)
        # duplicate a few exactly (axis-1 b_dup path)
        for k in range(min(3, n)):
            src = blocks[int(rng.integers(0, n))]
            dup = _mk_block([[int(src.q_pos[0]),
                              int(rng.integers(0, 230000)),
                              int(src.q_len[0])]])
            dup.score = src.score
            blocks.append(dup)
        chr_scores = np.asarray([int(rng.integers(0, 10000)),
                                 int(rng.integers(0, 10000))])
        for axis in (1, 2):
            for one in (False, True):
                cfg = _dc.replace(CFG, one_on_one=one)
                b1 = copy.deepcopy(blocks)
                b2 = copy.deepcopy(blocks)
                got = blk_ops.remove_redundant_blocks(
                    b1, chr_scores, ci, cfg, axis)
                want = _redundant_sweep_naive(
                    b2, chr_scores, ci, cfg, axis)
                assert [(int(b.q_pos[0]), int(b.r_pos[0]), b.score, b.b_dup)
                        for b in got] == \
                       [(int(b.q_pos[0]), int(b.r_pos[0]), b.score, b.b_dup)
                        for b in want], (trial, axis, one)
