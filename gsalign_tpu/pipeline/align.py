"""Top-level genome comparison pipeline.

Equivalent of GenomeComparison (src/GSAlign.cpp:473-552): per query
chromosome, run seeding -> grouping/chaining -> overlap repair -> gap split
-> chromosome-span split -> dedup -> gap fill -> alignment generation ->
identity filter -> output. The reference's per-stage pthread barriers map to
whole-array device launches here; stage order and all filters are preserved.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import List, Optional

import numpy as np


from gsalign_tpu.config import AlignConfig
from gsalign_tpu.genome.coords import ChrLocIndex, gen_coordinate_info
from gsalign_tpu.genome.packing import chars_to_codes
from gsalign_tpu.index.fmindex import FMIndex
from gsalign_tpu.ops.rank import DeviceFMIndex
from gsalign_tpu.ops.seeding import find_seeds_all
from gsalign_tpu.pipeline import blocks as blk_ops
from gsalign_tpu.pipeline import chain
from gsalign_tpu.ops import dp as dp_ops
from gsalign_tpu.pipeline.generate import (finish_alignments,
                                           plan_alignments, select_dp_fn)
from gsalign_tpu.pipeline.output import write_aln, write_dotplot, write_maf
from gsalign_tpu.pipeline.variants import (VariantCollector,
                                           identify_variants, write_vcf)
from gsalign_tpu.utils.trace import StageTimer, device_trace


@dataclasses.dataclass
class RunStats:
    local_alignment_num: int = 0
    total_alignment_length: int = 0
    total_alignment_matches: int = 0
    dup_aln_num: int = 0
    stage_times: dict = dataclasses.field(default_factory=dict)

    @property
    def ani(self) -> float:
        if self.total_alignment_length == 0:
            return 0.0
        return 100.0 * self.total_alignment_matches / self.total_alignment_length


@dataclasses.dataclass
class ChromosomeResult:
    name: str
    blocks: list
    n_alignments: int
    aln_len: int
    aln_score: int


def log(msg: str, verbose: bool = True):
    if verbose:
        print(msg, file=sys.stderr, flush=True)


def debug_dump_blocks(blocks, chr_index: ChrLocIndex, obr_pos: int = -1):
    """-d / -obr dump: chained block boundaries and FragPairs.

    Equivalent of the reference's ShowAlnBlockBoundary / ShowFragPair
    printers (src/tools.cpp:79-118 — parsed but dead in v1.0.22; live
    here). With obr_pos >= 0, only blocks whose reference span covers that
    position are dumped (the observation hook sketched at
    src/GSAlign.cpp:456)."""
    for b in blocks:
        if b.n == 0:
            continue
        q1, q2 = int(b.q_pos[0]), int(b.q_pos[-1] + b.q_len[-1] - 1)
        r1, r2 = int(b.r_pos[0]), int(b.r_pos[-1] + b.r_len[-1] - 1)
        if obr_pos >= 0 and not (r1 <= obr_pos <= r2):
            continue
        chr_idx = int(chr_index.chr_of(np.asarray([r1]))[0])
        name = chr_index.genome.names[chr_idx]
        print(f"AlnBlockBoundary Q[{q1}-{q2}] R[{r1}-{r2}] chr={name} "
              f"score = {b.score} size = {q2 - q1 + 1}")
        if r2 - r1 < 100 or obr_pos >= 0:
            print(f"FragPairVec (N={b.n})")
            for i in range(b.n):
                pd = int(b.r_pos[i]) - int(b.q_pos[i])
                print(f"q[{int(b.q_pos[i])}-{int(b.q_pos[i] + b.q_len[i] - 1)}] "
                      f"r[{int(b.r_pos[i])}-{int(b.r_pos[i] + b.r_len[i] - 1)}] "
                      f"L:{int(b.q_len[i])} D:{pd} ")
            print("End\n")


_QCODES_MEMO: dict = {}   # one-slot chars->codes memo (see _codes_for)
_QCODES_MEMO_MAX_BYTES = 1 << 30


def _codes_for(query_records):
    """chars_to_codes over the query records, memoized BY OBJECT IDENTITY
    of the chars arrays. Warm re-runs over the same in-memory query then
    hand seeding.find_seeds_all identical codes objects, which lets its
    one-slot q_rows device cache hit without any byte comparison."""
    chars = [q for _, q in query_records]
    m = _QCODES_MEMO
    if (len(m.get("chars", ())) == len(chars)
            and all(a is b for a, b in zip(m["chars"], chars))):
        return m["codes"]
    codes = [chars_to_codes(q) for q in chars]
    if sum(c.nbytes for c in codes) <= _QCODES_MEMO_MAX_BYTES:
        m["chars"] = chars
        m["codes"] = codes
    return codes


def compare_genomes(fm: FMIndex,
                    query_records: List,
                    cfg: AlignConfig,
                    output_prefix: Optional[str] = None,
                    verbose: bool = True,
                    dp_fn=None,
                    mesh=None,
                    write_vcf_file: bool = True,
                    plot_prefix: Optional[str] = None,
                    shard_index_rows: bool = False):
    """Run the full comparison. query_records: [(name, ascii uint8[]), ...].

    With a mesh (jax.sharding.Mesh over the "frag" axis), the two batched
    device stages — seeding lanes and DP problems — are sharded across its
    devices with the FM-index replicated; outputs are bit-identical for any
    device count (deterministic merge order).

    Returns (RunStats, VariantCollector, [ChromosomeResult]).
    """
    cfg = cfg.effective()
    genome = fm.genome
    chr_index = ChrLocIndex(genome)
    ref_chars = genome.chars_fwd_rc()
    dfm = DeviceFMIndex.from_host(fm)
    if shard_index_rows and mesh is not None:
        # beyond-HBM mode: big table rows sharded over the mesh, seed
        # lanes replicated (docs/SCALING_3GB.md item 1)
        from gsalign_tpu.parallel import mesh as mesh_lib
        dfm = mesh_lib.shard_index_rows(dfm, mesh)
    stats = RunStats()
    timer = StageTimer()
    collector = VariantCollector()
    results: List[ChromosomeResult] = []
    t0 = time.time()

    maf_path = f"{output_prefix}.maf" if output_prefix else None
    aln_path = f"{output_prefix}.aln" if output_prefix else None

    log("Step2. Sequence analysis for all query chromosomes", verbose)
    # S1: seeding — every chromosome's chunk lanes in ONE device scan
    # (the reference seeds per chromosome with thread chunks,
    # src/GSAlign.cpp:483-493; lane stops make the results identical)
    qcodes_list = _codes_for(query_records)
    ref_codes_full = genome.codes_fwd_rc()
    if output_prefix and cfg.output_format == 1:
        # pre-fault MAF row buffers on a background thread WHILE the
        # device seeds: the kernel's first-touch page zeroing of the
        # ~chromosome-sized rows then overlaps device wait instead of
        # serializing into the output stage (2 rows per in-flight
        # chromosome, sized with indel slack)
        import threading
        from gsalign_tpu.utils import bufpool
        n_flight = min(len(query_records), max(1, cfg.thread_num))
        sizes = sorted((len(q) for _, q in query_records), reverse=True)
        want = [int(s * 1.08) for s in sizes[:n_flight] for _ in (0, 1)]
        threading.Thread(target=bufpool.prime, args=(want,),
                         daemon=True).start()
    with device_trace(), timer.stage("seed"):
        all_seeds = find_seeds_all(
            dfm, qcodes_list,
            min_seed_length=cfg.min_seed_length,
            max_seed_freq=cfg.max_seed_freq,
            sensitive=cfg.sensitive,
            chunk=cfg.seed_exploration_chunk,
            mesh=mesh)

    # Pass 1 (host): chain stages + DP-pair planning per chromosome. DP
    # fragments stream into an incremental aligner: full buckets DISPATCH
    # while later chromosomes are still chaining on host (device/host
    # overlap), partial buckets POOL across chromosomes, and ALL results
    # arrive in one fetch (launch + fetch round trips dominate the actual
    # DP compute).
    aligner = dp_ops.FragmentAligner(
        bucket_sizes=cfg.dp_buckets, batch_cells=cfg.dp_batch_cells,
        dp_fn=select_dp_fn(cfg, dp_fn), mesh=mesh)
    planned = []                   # (qname, qry_chars, blocks, jobs, lo, hi)
    for qc_idx, (qname, qry_chars) in enumerate(query_records):
        log(f"\tProcess query chromosome: {qname}...", verbose)
        q_pos, r_pos, length = all_seeds[qc_idx]

        with timer.stage("chain"):
            # S2+S3: grouping + chaining
            blocks = chain.generate_alignment_blocks(
                q_pos, r_pos, length, cfg, genome.size)

            # S4: overlap repair
            for b in blocks:
                blk_ops.remove_overlaps(b)

            # S5: gap splitting
            new_blocks = []
            for b in blocks:
                subs = blk_ops.check_gaps_between_seeds(b, qry_chars,
                                                        ref_chars, cfg)
                if subs is None:
                    new_blocks.append(b)
                else:
                    new_blocks.extend(subs)
            blocks = blk_ops.remove_bad_blocks(new_blocks)

            # S6: chromosome-span splitting
            new_blocks = []
            for b in blocks:
                subs = blk_ops.check_span_multiple_chrs(b, chr_index, cfg)
                if subs is None:
                    new_blocks.append(b)
                else:
                    new_blocks.extend(subs)
            blocks = blk_ops.remove_bad_blocks(new_blocks)

            # S7: dedup
            for b in blocks:
                b.b_dup = False
            chr_scores = blk_ops.est_chromosome_similarity(blocks, chr_index)
            blocks = blk_ops.remove_redundant_blocks(blocks, chr_scores,
                                                     chr_index, cfg, axis=1)
            blocks = blk_ops.remove_redundant_blocks(blocks, chr_scores,
                                                     chr_index, cfg, axis=2)

            # S8: gap fill
            for b in blocks:
                if b.score > 0:
                    blk_ops.fill_block_gaps(b)

        if cfg.debug or cfg.obr_pos >= 0:
            debug_dump_blocks(blocks, chr_index, cfg.obr_pos)

        # S9a: classify pairs, submit this chromosome's DP fragments (full
        # buckets start on device now, behind the next chromosome's chain)
        with timer.stage("align"):
            jobs, rf, qf = plan_alignments(
                blocks, qry_chars, ref_chars,
                ref_codes=ref_codes_full, qry_codes=qcodes_list[qc_idx])
            lo = aligner.submit(rf, qf)
            planned.append((qname, qry_chars, qcodes_list[qc_idx], blocks,
                            jobs, lo, lo + len(rf)))

    # S9b: dispatch leftover partial buckets, ONE fetch for every
    # chromosome's gap fragments
    with device_trace(), timer.stage("align"):
        ops_all = aligner.finish()

    # Pass 2 (host): expand alignments, filter, emit — chromosome order.
    # The heavy per-chromosome work (alignment expansion, MAF row
    # assembly incl. the clip mutations, variant identification into a
    # PRIVATE collector) is independent across chromosomes, so with
    # -t > 1 it runs on a thread pool (the reference stripes every stage
    # over pthreads, src/GSAlign.cpp:492-526); the main thread then
    # consumes results IN CHROMOSOME ORDER — file chunks are submitted to
    # the ordered sink and private collectors merge via merge_from (the
    # distributed path's machinery), so the output bytes and variant
    # emission order are identical to the serial path. MAF disk writes
    # still go through the background sink thread.
    from gsalign_tpu.pipeline.output import AsyncSink, assemble_maf_chunks
    sink = AsyncSink() if (output_prefix and cfg.output_format == 1) \
        else None

    def pass2_work(item):
        qname, qry_chars, qry_codes, blocks, jobs, lo, hi = item
        with timer.stage("align"):
            finish_alignments(blocks, jobs, ops_all[lo:hi], qry_chars,
                              ref_chars)
        # identity filter + stats (src/GSAlign.cpp:528-541)
        n = 0
        aln_len_sum = 0
        aln_score_sum = 0
        dup_n = 0
        for b in blocks:
            if b.aln_len == 0 or \
                    int(100 * (b.score / b.aln_len)) < cfg.min_seq_idy:
                b.score = 0
            else:
                if b.b_dup:
                    dup_n += 1
                n += 1
                aln_len_sum += b.aln_len
                aln_score_sum += b.score
                b.coor = gen_coordinate_info(chr_index, int(b.r_pos[0]))
        blocks = blk_ops.remove_bad_blocks(blocks)
        chunks = private = None
        if n:
            # assembly clips blocks in place, so it runs before variant
            # identification, same as the reference ordering
            if output_prefix and cfg.output_format == 1:
                with timer.stage("output"):
                    chunks = assemble_maf_chunks(
                        blocks, qname, qry_chars, chr_index,
                        cfg.allow_duplication)
            if cfg.emit_vcf and cfg.output_format != 2:
                with timer.stage("variants"):
                    private = VariantCollector()
                    identify_variants(blocks, qry_chars, ref_chars,
                                      chr_index, private,
                                      ref_codes=ref_codes_full,
                                      qry_codes=qry_codes)
        return (qname, qry_chars, qry_codes, blocks, n, aln_len_sum,
                aln_score_sum, dup_n, chunks, private)

    _wall = [time.time()]

    def wallmark(label):
        # env-gated WALL-clock phase profile (timer.stage sums THREAD
        # time across workers, which over-counts overlapped phases)
        if os.environ.get("GSALIGN_WALLPROF"):
            now = time.time()
            print(f"[wall] {label}: {now - _wall[0]:.3f}s "
                  f"(t+{now - t0:.3f})", file=sys.stderr, flush=True)
            _wall[0] = now

    wallmark("seed+pass1+dp")
    n_workers = min(len(planned), max(1, cfg.thread_num))
    if n_workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=n_workers)
        outcomes = list(pool.map(pass2_work, planned))
        pool.shutdown()
    else:
        outcomes = map(pass2_work, planned)
    wallmark("pass2-pool")

    first_out = True
    for (qname, qry_chars, qry_codes, blocks, n, aln_len_sum,
         aln_score_sum, dup_n, chunks, private) in outcomes:
        if n == 0:
            continue
        stats.dup_aln_num += dup_n
        stats.local_alignment_num += n
        stats.total_alignment_length += aln_len_sum
        stats.total_alignment_matches += aln_score_sum
        log(f"\t\tProduce {n} local alignments (length = {aln_len_sum}), "
            f"ANI={100.0 * aln_score_sum / aln_len_sum:.2f}%", verbose)

        if output_prefix:
            with timer.stage("output"):
                if cfg.output_format == 1:
                    write_maf(maf_path, blocks, qname, qry_chars, chr_index,
                              first_out, cfg.allow_duplication, sink=sink,
                              chunks=chunks)
                elif cfg.output_format == 2:
                    write_aln(aln_path, blocks, qname, qry_chars, chr_index,
                              first_out, cfg.allow_duplication)
            first_out = False
        if cfg.emit_vcf:
            with timer.stage("variants"):
                if private is not None:
                    collector.merge_from(private)
                else:
                    identify_variants(blocks, qry_chars, ref_chars,
                                      chr_index, collector,
                                      ref_codes=ref_codes_full,
                                      qry_codes=qry_codes)
        if cfg.show_plot and output_prefix:
            # under sharded runs the dotplot keeps the USER-facing prefix
            # (the reference writes {prefix}.gp / {prefix}-{qname}.ps,
            # src/DotPloting.cpp:47-49, regardless of worker)
            write_dotplot(plot_prefix or output_prefix, qname, blocks,
                          chr_index, gnuplot_path=cfg.gnuplot_path)

        results.append(ChromosomeResult(qname, blocks, n, aln_len_sum,
                                        aln_score_sum))

    wallmark("consume+emit")
    # VCF formatting runs WHILE the sink thread drains the residual MAF
    # disk writes (independent files) — the close() join then returns
    # almost immediately instead of serializing ~0.7 s + ~0.9 s tails.
    try:
        if cfg.emit_vcf and output_prefix and write_vcf_file:
            with timer.stage("variants"):
                write_vcf(f"{output_prefix}.vcf", collector, genome.names,
                          genome.lengths, reference_name=output_prefix)
        wallmark("vcf-write")
    finally:
        if sink is not None:
            with timer.stage("output"):   # residual non-overlapped disk time
                sink.close()
    wallmark("sink-drain")
    if stats.local_alignment_num > 0:
        log(f"\tAlignment#={stats.local_alignment_num} "
            f"(total alignment length={stats.total_alignment_length}) "
            f"ANI={stats.ani:.2f}%, unique alignment#="
            f"{stats.local_alignment_num - stats.dup_aln_num}", verbose)
    stats.stage_times = dict(timer.totals)
    log(f"\t[stages] {timer.report()}", verbose)
    log(f"\tIt took {int(time.time() - t0)} seconds for genome sequence "
        f"alignment.", verbose)

    if cfg.emit_vcf and output_prefix and write_vcf_file:
        log(f"\nGSAlign identifies {collector.n_snv} SNVs, "
            f"{collector.n_ins} insertions, and {collector.n_del} deletions "
            f"[{output_prefix}.vcf].", verbose)
    return stats, collector, results
