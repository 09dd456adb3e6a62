"""Align-stage breakdown (plan / device DP / finish) on a bench config.

Usage: python tools/exp_align.py [tag] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                        # noqa: E402
import gsalign_tpu                                        # noqa: F401,E402
from gsalign_tpu.config import AlignConfig                # noqa: E402
from gsalign_tpu.genome.coords import ChrLocIndex         # noqa: E402
from gsalign_tpu.genome.fasta import read_fasta           # noqa: E402
from gsalign_tpu.genome.packing import chars_to_codes     # noqa: E402
from gsalign_tpu.index.io import load_index               # noqa: E402
from gsalign_tpu.ops.rank import DeviceFMIndex            # noqa: E402
from gsalign_tpu.ops import dp as dp_ops                  # noqa: E402
from gsalign_tpu.ops.seeding import find_seeds_all        # noqa: E402
from gsalign_tpu.pipeline import blocks as blk_ops        # noqa: E402
from gsalign_tpu.pipeline import chain                    # noqa: E402
from gsalign_tpu.pipeline.generate import (               # noqa: E402
    finish_alignments, plan_alignments)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "ecoli_4.6mb"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    genome = fm.genome
    dfm = DeviceFMIndex.from_host(fm)
    cfg = AlignConfig().effective()
    chr_index = ChrLocIndex(genome)
    ref_chars = genome.chars_fwd_rc()
    ref_codes = genome.codes_fwd_rc()
    qry_records = read_fasta(os.path.join(d, "qry.fa"))
    qcodes = [chars_to_codes(q) for _, q in qry_records]
    seeds = find_seeds_all(dfm, qcodes)

    def chain_stages(qry_chars, s):
        blocks = chain.generate_alignment_blocks(
            s[0], s[1], s[2], cfg, genome.size)
        for b in blocks:
            blk_ops.remove_overlaps(b)
        nb = []
        for b in blocks:
            sub = blk_ops.check_gaps_between_seeds(b, qry_chars, ref_chars,
                                                   cfg)
            nb.extend([b] if sub is None else sub)
        blocks = blk_ops.remove_bad_blocks(nb)
        nb = []
        for b in blocks:
            sub = blk_ops.check_span_multiple_chrs(b, chr_index, cfg)
            nb.extend([b] if sub is None else sub)
        blocks = blk_ops.remove_bad_blocks(nb)
        for b in blocks:
            b.b_dup = False
        cs = blk_ops.est_chromosome_similarity(blocks, chr_index)
        blocks = blk_ops.remove_redundant_blocks(blocks, cs, chr_index, cfg, 1)
        blocks = blk_ops.remove_redundant_blocks(blocks, cs, chr_index, cfg, 2)
        for b in blocks:
            if b.score > 0:
                blk_ops.fill_block_gaps(b)
        return blocks

    for rep in range(reps):
        T = {}
        all_rf, all_qf, planned = [], [], []
        for qi, (name, qry_chars) in enumerate(qry_records):
            t0 = time.time()
            blocks = chain_stages(qry_chars, seeds[qi])
            T["chain"] = T.get("chain", 0) + time.time() - t0
            t0 = time.time()
            jobs, rf, qf = plan_alignments(blocks, qry_chars, ref_chars,
                                           ref_codes=ref_codes,
                                           qry_codes=qcodes[qi])
            T["plan"] = T.get("plan", 0) + time.time() - t0
            lo = len(all_rf)
            all_rf += rf
            all_qf += qf
            planned.append((qry_chars, blocks, jobs, lo, len(all_rf)))
        t0 = time.time()
        import jax
        from gsalign_tpu.pipeline.generate import select_dp_fn
        dp_fn = select_dp_fn(cfg, None) if os.environ.get(
            "GSALIGN_EXP_PALLAS") else None
        aligner = dp_ops.FragmentAligner(
            bucket_sizes=cfg.dp_buckets, batch_cells=cfg.dp_batch_cells,
            **({"dp_fn": dp_fn} if dp_fn else {}))
        aligner.submit(all_rf, all_qf)
        T["dp_submit"] = time.time() - t0
        t0 = time.time()
        for Lb, part in sorted(aligner.queue.items()):
            mb = max(1, aligner.batch_cells // (Lb * Lb))
            for s in range(0, len(part), mb):
                aligner._dispatch(Lb, part[s:s + mb])
        aligner.queue = {}
        T["dp_rest"] = time.time() - t0
        t0 = time.time()
        jax.block_until_ready([p[1] for p in aligner.pending])
        T["dp_device"] = time.time() - t0
        t0 = time.time()
        ops_all = aligner.finish()
        T["dp_fetch"] = time.time() - t0
        t0 = time.time()
        for qry_chars, blocks, jobs, lo, hi in planned:
            finish_alignments(blocks, jobs, ops_all[lo:hi], qry_chars,
                              ref_chars)
        T["finish"] = time.time() - t0
        sizes = [max(len(a), len(b)) for a, b in zip(all_rf, all_qf)]
        hist = {}
        for s in sizes:
            for Lb in cfg.dp_buckets:
                if s <= Lb:
                    hist[Lb] = hist.get(Lb, 0) + 1
                    break
        print(f"rep{rep}:", {k: round(v, 3) for k, v in T.items()},
              "n_dp:", len(all_rf), "buckets:", dict(sorted(hist.items())),
              flush=True)


if __name__ == "__main__":
    main()
