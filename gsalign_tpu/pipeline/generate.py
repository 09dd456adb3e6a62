"""Alignment generation for gap FragPairs (stage S9).

Emulates GenerateFragAlignment (src/ProcessCandidateAlignment.cpp:290-351):
seeds contribute length to score/aln_len; pure insertions/deletions become
all-gap rows; equal-length pairs with <= 5 mismatches pair up directly;
everything else goes to the batched device DP kernel (ops/dp.py) — all DP
problems across all blocks are collected first and dispatched in padded,
size-bucketed batches, replacing the reference's per-pair pthread striding.
"""

from __future__ import annotations

from typing import List

import numpy as np

from gsalign_tpu.config import AlignConfig
from gsalign_tpu.genome.packing import NT4_TABLE
from gsalign_tpu.ops import dp as dp_ops
from gsalign_tpu.pipeline.chain import Block

_GAP = ord("-")


def count_identical(a1: np.ndarray, a2: np.ndarray) -> int:
    """CountIdenticalPairs (src/ProcessCandidateAlignment.cpp:38-47):
    nt4-code equality, so N matches N and '-' (both code 4)."""
    return int((NT4_TABLE[a1] == NT4_TABLE[a2]).sum())


def fragpair_mismatch(ref_chars: np.ndarray, qry_chars: np.ndarray,
                      r_pos: int, q_pos: int, length: int) -> int:
    """CheckFragPairMismatch (src/ProcessCandidateAlignment.cpp:49-61):
    query-N positions are skipped."""
    rf = NT4_TABLE[ref_chars[r_pos:r_pos + length]]
    qf = NT4_TABLE[qry_chars[q_pos:q_pos + length]]
    return int(((qf != 4) & (qf != rf)).sum())


def generate_alignments(blocks: List[Block], qry_chars: np.ndarray,
                        ref_chars: np.ndarray, cfg: AlignConfig,
                        dp_fn=None) -> None:
    """Fill aln1/aln2 for all non-seed pairs; set per-block score/aln_len."""
    dp_jobs = []          # (block_idx, pair_idx, ref_codes, qry_codes)
    for bi, blk in enumerate(blocks):
        blk.score = 0
        blk.aln_len = 0
        score = 0
        aln_len = 0
        for j in range(blk.n):
            if blk.b_seed[j]:
                aln_len += int(blk.q_len[j])
                score += int(blk.q_len[j])
                continue
            q_pos, r_pos = int(blk.q_pos[j]), int(blk.r_pos[j])
            q_len, r_len = int(blk.q_len[j]), int(blk.r_len[j])
            if q_len == 0:
                aln_len += r_len
                blk.aln1[j] = ref_chars[r_pos:r_pos + r_len].copy()
                blk.aln2[j] = np.full(r_len, _GAP, dtype=np.uint8)
            elif r_len == 0:
                aln_len += q_len
                blk.aln1[j] = np.full(q_len, _GAP, dtype=np.uint8)
                blk.aln2[j] = qry_chars[q_pos:q_pos + q_len].copy()
            elif q_len == r_len and (mism := fragpair_mismatch(
                    ref_chars, qry_chars, r_pos, q_pos, q_len)) <= 5:
                blk.aln1[j] = ref_chars[r_pos:r_pos + r_len].copy()
                blk.aln2[j] = qry_chars[q_pos:q_pos + q_len].copy()
                aln_len += q_len
                score += q_len - mism
            else:
                rf = NT4_TABLE[ref_chars[r_pos:r_pos + r_len]].astype(np.int32)
                qf = NT4_TABLE[qry_chars[q_pos:q_pos + q_len]].astype(np.int32)
                dp_jobs.append((bi, j, rf, qf))
        blk.score = score
        blk.aln_len = aln_len

    if dp_jobs:
        ref_frags = [job[2] for job in dp_jobs]
        qry_frags = [job[3] for job in dp_jobs]
        kwargs = {} if dp_fn is None else {"dp_fn": dp_fn}
        ops_list = dp_ops.align_fragments(
            ref_frags, qry_frags, bucket_sizes=cfg.dp_buckets,
            batch_cells=cfg.dp_batch_cells, **kwargs)
        for (bi, j, _, _), ops in zip(dp_jobs, ops_list):
            blk = blocks[bi]
            q_pos, r_pos = int(blk.q_pos[j]), int(blk.r_pos[j])
            q_len, r_len = int(blk.q_len[j]), int(blk.r_len[j])
            a1, a2 = dp_ops.ops_to_alignment(
                ops, ref_chars[r_pos:r_pos + r_len],
                qry_chars[q_pos:q_pos + q_len])
            blk.aln1[j] = a1
            blk.aln2[j] = a2
            blk.aln_len += len(a1)
            blk.score += count_identical(a1, a2)
