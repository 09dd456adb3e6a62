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
