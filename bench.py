"""Benchmark driver. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: E. coli-scale (4.6 Mb) intra-species pair alignment
wall-clock on one TPU chip, steady-state (one warm-up pass first — remote
compile/executable-load latency in this environment is an axon-tunnel
artifact, not device time). Baseline: the C reference (hsinnan75/GSAlign
v1.0.22, -t 4) on the same pair on this machine's 4 CPU cores: 0.21 s
(measured; see BASELINE.md protocol — repo publishes no numbers).

vs_baseline = baseline_seconds / our_seconds (>1 means faster than the C
reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_DIR = "/tmp/gsalign_bench"
TOTAL_LEN = 4_600_000
BASELINE_SECONDS = 0.21          # C reference, -t 4, same pair, this host
EXTRA = {}


def ensure_data():
    os.makedirs(BENCH_DIR, exist_ok=True)
    ref_fa = os.path.join(BENCH_DIR, "ref.fa")
    qry_fa = os.path.join(BENCH_DIR, "qry.fa")
    if not (os.path.exists(ref_fa) and os.path.exists(qry_fa)):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        from make_testdata import make_pair, write_fasta
        ref, qry = make_pair(total_len=TOTAL_LEN)
        write_fasta(ref_fa, ref)
        write_fasta(qry_fa, qry)
    return ref_fa, qry_fa


def main():
    ref_fa, qry_fa = ensure_data()

    import gsalign_tpu  # noqa: F401
    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.genome.fasta import read_fasta
    from gsalign_tpu.genome.packing import pack_genome
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.index.io import index_exists, load_index, save_index
    from gsalign_tpu.pipeline.align import compare_genomes

    idx_prefix = os.path.join(BENCH_DIR, "ref_idx")
    if index_exists(idx_prefix):
        fm = load_index(idx_prefix)
    else:
        t0 = time.time()
        fm = build_fmindex(pack_genome(read_fasta(ref_fa)))
        EXTRA["index_build_seconds"] = round(time.time() - t0, 3)
        save_index(fm, idx_prefix)
    qry_records = read_fasta(qry_fa)
    cfg = AlignConfig()

    out = os.path.join(BENCH_DIR, "bench_out")
    # warm-up: compile + load executables
    stats, _, _ = compare_genomes(fm, qry_records, cfg, output_prefix=out,
                                  verbose=False)
    assert stats.local_alignment_num > 0

    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        stats, collector, _ = compare_genomes(fm, qry_records, cfg,
                                              output_prefix=out, verbose=False)
        best = min(best, time.time() - t0)

    bps = stats.total_alignment_length / best
    result = {
        "metric": "ecoli_pair_align_wallclock",
        "value": round(best, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / best, 4),
        "aligned_bp_per_s": round(bps),
        "ani_pct": round(stats.ani, 2),
        "alignments": stats.local_alignment_num,
        "aligned_bp": stats.total_alignment_length,
        "snv": collector.n_snv,
        "ins": collector.n_ins,
        "dele": collector.n_del,
        **EXTRA,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
