"""MAF / ALN writers and dotplot.

Byte-level emulation of OutputMAF / OutputAlignment (src/tools.cpp:142-286)
including their quirks: seed regions copy *query* characters into both rows,
the qry (MAF) / both (ALN) names are space-padded to the longer of the two,
and a block extending past its chromosome end is clipped in place (mutating
the block's score/aln_len and its last pair) before emission.
"""

from __future__ import annotations

import os

from typing import List

import numpy as np

from gsalign_tpu.genome.coords import ChrLocIndex, gen_coordinate_info
from gsalign_tpu.pipeline.chain import Block

# ReverseMap (src/tools.cpp:3-31): complement for ACGTUN upper/lower + '-'.
_GAP = ord("-")

REVERSE_MAP = np.zeros(256, dtype=np.uint8)
for _src, _dst in ((45, 45), (65, 84), (67, 71), (71, 67), (78, 78),
                   (84, 65), (85, 65), (97, 84), (99, 71), (103, 67),
                   (110, 78), (116, 65), (117, 65)):
    REVERSE_MAP[_src] = _dst


def self_complementary(arr: np.ndarray) -> np.ndarray:
    """SelfComplementarySeq (src/tools.cpp:33-44): reverse + complement."""
    return REVERSE_MAP[arr[::-1]]


class AsyncSink:
    """Ordered background file writer: row ASSEMBLY (and the block clip
    mutations variant calling depends on) stays synchronous in the caller;
    only the disk writes move to one FIFO thread, overlapping the variant
    walk of the same chromosome (file writes release the GIL). close()
    joins and re-raises any writer error."""

    def __init__(self):
        import queue
        import threading
        self._q = queue.Queue(maxsize=8)
        self._err = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            path, mode, chunks, recycle = item
            try:
                if self._err is None:
                    with open(path, mode) as fh:
                        for c in chunks:
                            fh.write(c)
            except BaseException as e:      # propagate on close()
                self._err = e
            finally:
                from gsalign_tpu.utils import bufpool
                for buf in recycle:         # safe: the writes are done
                    bufpool.put(buf)

    def submit(self, path: str, mode: str, chunks: list, recycle=()):
        """recycle: uint8 buffers backing `chunks` that may be returned to
        the row pool once this item's writes complete."""
        self._q.put((path, mode, chunks, recycle))

    def close(self):
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err


def _build_rows(blk: Block, qry_chars: np.ndarray, ref_chars: np.ndarray):
    """Concatenate per-pair rows (src/tools.cpp:170-184): seed pairs copy the
    query characters into BOTH rows; non-seed pairs use their (possibly
    implied) aligned rows.

    Copy-then-patch formulation (the MAF writer used to dominate host time
    rebuilding segment indices six times): ONE segmented fill builds the
    query row over every query-consuming pair, the ref row starts as a copy
    of it (seed pairs want query chars in both rows; equal-length pairs
    differ only at their few mismatch columns), and the small classes —
    direct-pair mismatches, pure-deletion ref spans, pure-insertion gap
    spans, DP pairs — are patched on top.

    Rows are carved from utils.bufpool buffers (same as the native path),
    so warm runs write into already-faulted pages; returns (a1, a2, bases)
    with `bases` the pooled arrays to recycle after the disk writes."""
    from gsalign_tpu.pipeline.generate import _segment_indices
    n = blk.n
    has_aln = np.asarray([a is not None for a in blk.aln1])
    row_len = np.where(blk.b_seed, blk.q_len,
                       np.where(has_aln, 0,
                                np.maximum(blk.q_len, blk.r_len)))
    dp_idx = np.nonzero(has_aln & ~blk.b_seed)[0]
    if dp_idx.size:
        row_len[dp_idx] = [len(blk.aln1[j]) for j in dp_idx]
    offs = np.concatenate([[0], np.cumsum(row_len)])
    total = int(offs[-1])

    seeds = blk.b_seed
    direct = (~seeds) & ~has_aln & (blk.q_len == blk.r_len) & (blk.q_len > 0)
    gap_r = (~seeds) & ~has_aln & (blk.q_len == 0)
    gap_q = (~seeds) & ~has_aln & (blk.r_len == 0) & (blk.q_len > 0)

    # Query row: segment copies per query-consuming pair (the multithreaded
    # native memcpy kernel when available; spans of the other classes are
    # fully overwritten below, so they may start as garbage).
    from gsalign_tpu import native_lib
    from gsalign_tpu.utils import bufpool
    qcons = seeds | direct | gap_q
    qn = int(qry_chars.shape[0])
    ridx = np.nonzero(gap_r)[0]
    cidx = np.nonzero(qcons)[0]
    b1, b2 = bufpool.get(total), bufpool.get(total)
    a2 = None
    if cidx.size:
        a2 = native_lib.seg_gather_u8(
            qry_chars, blk.q_pos[cidx], row_len[cidx],
            out=b2[:total], offs=offs[cidx])
    if a2 is None:
        a2 = b2[:total]
        idt = np.int32 if (total < 2**31 and qn < 2**31) else np.int64
        qdelta = (np.where(qcons, blk.q_pos, 0).astype(np.int64)
                  - offs[:-1]).astype(idt)
        src = np.repeat(qdelta, row_len)
        src += np.arange(total, dtype=idt)
        np.minimum(src, idt(qn - 1), out=src)   # bound garbage spans
        np.take(qry_chars, src, out=a2)
    if ridx.size:                      # deletion spans: query row is gaps
        a2[_segment_indices(offs[ridx], row_len[ridx])] = _GAP
    for j in dp_idx:
        o = int(offs[j])
        a2[o:o + row_len[j]] = blk.aln2[j]
    a1 = b1[:total]
    np.copyto(a1, a2)

    didx = np.nonzero(direct)[0]
    if didx.size:                      # patch ref-row mismatch columns
        lens = row_len[didx]
        dstd = _segment_indices(offs[didx], lens)
        rid = _segment_indices(blk.r_pos[didx], lens)
        rch = ref_chars[rid]
        diff = rch != a1[dstd]
        a1[dstd[diff]] = rch[diff]
    if ridx.size:                      # deletions: ref chars, a2 stays '-'
        lens = row_len[ridx]
        if native_lib.seg_gather_u8(
                ref_chars, blk.r_pos[ridx], lens, out=a1,
                offs=offs[ridx]) is None:
            a1[_segment_indices(offs[ridx], lens)] = \
                ref_chars[_segment_indices(blk.r_pos[ridx], lens)]
    qidx = np.nonzero(gap_q)[0]
    if qidx.size:                      # insertions: a1 must be gaps
        lens = row_len[qidx]
        a1[_segment_indices(offs[qidx], lens)] = _GAP
    for j in dp_idx:
        o = int(offs[j])
        a1[o:o + row_len[j]] = blk.aln1[j]
    return a1, a2, (b1, b2)


def _clip_amount(blk: Block, chr_index: ChrLocIndex) -> int:
    """Bases by which the block runs past its chromosome end
    (src/tools.cpp:192-202); <= 0 when no clip is needed."""
    g = chr_index.genome
    ref_idx = blk.coor.chromosome_idx
    end = int(blk.r_pos[-1] + blk.r_len[-1])
    if blk.coor.b_dir:
        limit = int(g.offsets[ref_idx] + g.lengths[ref_idx])
    else:
        limit = int(chr_index.rev_loc[ref_idx] + g.lengths[ref_idx])
    return end - limit


def _emit_rows(blk: Block, qry_chars: np.ndarray, ref_chars: np.ndarray,
               chr_index: ChrLocIndex, rev: bool):
    """Aligned rows of one block, chromosome-end-clipped, '-'-counted, and
    (when rev) reverse-complemented: (a1, a2, gaps1, gaps2).

    Applies the clip mutations of the reference (src/tools.cpp:192-202) to
    blk (score/aln_len/last-pair lens); the per-pair aln rows keep their
    pre-clip content (the later variant walk reads them unclipped), so an
    implied clipped last pair is materialized first. The assembly runs as
    ONE multithreaded native pass when the library is available."""
    from gsalign_tpu import native_lib
    ext = _clip_amount(blk, chr_index)
    last = blk.n - 1
    if ext > 0 and not blk.b_seed[last] and blk.aln1[last] is None:
        from gsalign_tpu.pipeline.generate import pair_rows
        blk.aln1[last], blk.aln2[last] = (
            arr.copy() for arr in pair_rows(blk, last, qry_chars, ref_chars))

    has_aln = np.asarray([a is not None for a in blk.aln1])
    row_len = np.where(blk.b_seed, blk.q_len,
                       np.where(has_aln, 0,
                                np.maximum(blk.q_len, blk.r_len)))
    dp_mask = has_aln & ~blk.b_seed
    dp_idx = np.nonzero(dp_mask)[0]
    if dp_idx.size:
        row_len[dp_idx] = [len(blk.aln1[j]) for j in dp_idx]
    offs = np.concatenate([[0], np.cumsum(row_len)])
    emit_len = int(offs[-1]) if ext <= 0 \
        else min(blk.aln_len - ext, int(offs[-1]))

    cls = np.full(blk.n, 4, dtype=np.uint8)      # default: DP rows
    implied = ~blk.b_seed & ~has_aln
    cls[blk.b_seed] = 0
    cls[implied & (blk.q_len == blk.r_len) & (blk.q_len > 0)] = 1
    cls[implied & (blk.q_len == 0)] = 2
    cls[implied & (blk.r_len == 0) & (blk.q_len > 0)] = 3

    out = None
    bases = ()
    if not (implied & (blk.q_len != blk.r_len)
            & (blk.q_len > 0) & (blk.r_len > 0)).any():
        from gsalign_tpu.utils import bufpool
        b1, b2 = bufpool.get(emit_len), bufpool.get(emit_len)
        out = native_lib.maf_build_rows(
            qry_chars, ref_chars, blk.q_pos, blk.r_pos, row_len, offs, cls,
            blk.aln1, blk.aln2, emit_len, rev, out1=b1, out2=b2)
        if out is None:
            bufpool.put(b1)
            bufpool.put(b2)
        else:
            bases = (b1, b2)    # recycled by the caller after the writes
    if out is None:
        a1, a2, bases = _build_rows(blk, qry_chars, ref_chars)
        a1, a2 = a1[:emit_len], a2[:emit_len]
        gaps1 = int((a1 == _GAP).sum())
        gaps2 = int((a2 == _GAP).sum())
        if rev:
            a1 = self_complementary(a1)
            a2 = self_complementary(a2)
    else:
        a1, a2, gaps1, gaps2 = out

    if ext > 0:
        blk.aln_len -= ext
        blk.score -= ext
        blk.r_len[-1] -= ext
        blk.q_len[-1] -= ext
    return a1, a2, gaps1, gaps2, bases


def _pad_names(qry_name: str, ref_name: str):
    if len(qry_name) > len(ref_name):
        ref_name = ref_name + " " * (len(qry_name) - len(ref_name))
    else:
        qry_name = qry_name + " " * (len(ref_name) - len(qry_name))
    return qry_name, ref_name


class MafChunks(list):
    """Byte chunks plus the pooled row buffers they alias (returned to
    utils.bufpool once the chunks' disk writes complete)."""

    def __init__(self, *a):
        super().__init__(*a)
        self.recycle: list = []


def assemble_maf_chunks(blocks: List[Block], qry_name: str,
                        qry_chars: np.ndarray, chr_index: ChrLocIndex,
                        allow_duplication: bool) -> list:
    """Row assembly for one chromosome's MAF records (and the clip
    mutations the variant walk depends on): returns the byte chunks
    WITHOUT the ##maf header. Thread-safe across chromosomes (mutates
    only its own blocks), so the pipeline can assemble chromosomes in
    parallel and write in order."""
    g = chr_index.genome
    qry_total = int(qry_chars.shape[0])
    chunks = MafChunks()
    for blk in blocks:
        if not allow_duplication and blk.b_dup:
            continue
        ref_idx = blk.coor.chromosome_idx
        ref_name = g.names[ref_idx]
        qn, _ = _pad_names(qry_name, ref_name)
        a1, a2, gaps1, gaps2, bases = _emit_rows(
            blk, qry_chars, chr_index.genome.chars_fwd_rc(), chr_index,
            rev=not blk.coor.b_dir)
        chunks.recycle.extend(bases)
        score = 1 if blk.b_dup else blk.score
        chr_len = int(g.lengths[ref_idx])
        if blk.coor.b_dir:
            r_start = blk.coor.g_pos - 1
            q_start = int(blk.q_pos[0])
        else:
            r_last = int(blk.r_pos[-1] + blk.r_len[-1] - 1)
            r_start = gen_coordinate_info(chr_index, r_last).g_pos - 1
            q_start = qry_total - int(blk.q_pos[-1] + blk.q_len[-1])
        chunks.append(f"a score={score}\n".encode())
        chunks.append(f"s ref.{ref_name} {r_start} "
                      f"{blk.aln_len - gaps1} + {chr_len} ".encode())
        # buffer-protocol write: .tobytes() copied each multi-MB row
        # (the rows are fresh _emit_rows outputs, never mutated later,
        # so handing views to the writer thread is safe). memoryview()
        # raises on a non-contiguous row — every _emit_rows path returns
        # contiguous rows, and a silent ascontiguousarray copy here would
        # re-pay the multi-MB first-touch cost the bufpool exists to avoid
        chunks.append(memoryview(a1))
        chunks.append(f"\ns qry.{qn} {q_start} "
                      f"{blk.aln_len - gaps2} + {qry_total} ".encode())
        chunks.append(memoryview(a2))
        chunks.append(b"\n\n")
    return chunks


def write_maf(path: str, blocks: List[Block], qry_name: str,
              qry_chars: np.ndarray, chr_index: ChrLocIndex,
              first_chromosome: bool, allow_duplication: bool,
              sink: AsyncSink = None, chunks: list = None) -> None:
    """OutputMAF (src/tools.cpp:149-220). Row assembly (and the clip
    mutations the variant walk depends on) happens here — or arrives
    pre-assembled via `chunks` from a parallel pass — synchronously;
    with a sink the chunks are handed to its writer thread so the disk
    time overlaps the rest of the chromosome's host work."""
    if chunks is None:
        chunks = assemble_maf_chunks(blocks, qry_name, qry_chars,
                                     chr_index, allow_duplication)
    recycle = getattr(chunks, "recycle", ())
    mode = "wb" if first_chromosome else "ab"
    if first_chromosome:
        chunks = [b"##maf version=1\n"] + chunks
    if sink is not None:
        sink.submit(path, mode, chunks, recycle=recycle)
        return
    with open(path, mode) as fh:
        for c in chunks:
            fh.write(c)
    from gsalign_tpu.utils import bufpool
    for buf in recycle:
        bufpool.put(buf)


def write_aln(path: str, blocks: List[Block], qry_name: str,
              qry_chars: np.ndarray, chr_index: ChrLocIndex,
              first_chromosome: bool, allow_duplication: bool) -> None:
    """OutputAlignment (src/tools.cpp:222-286): 80-column pretty format."""
    g = chr_index.genome
    mode = "w" if first_chromosome else "a"
    with open(path, mode) as fh:
        for blk in blocks:
            if not allow_duplication and blk.b_dup:
                continue
            ref_idx = blk.coor.chromosome_idx
            ref_name = g.names[ref_idx]
            qn, rn = _pad_names(qry_name, ref_name)
            a1, a2, _, _, bases = _emit_rows(
                blk, qry_chars, chr_index.genome.chars_fwd_rc(), chr_index,
                rev=False)
            idy = int(1000 * (blk.score / blk.aln_len)) / 10.0 \
                if blk.aln_len else 0.0
            fh.write(f"#Identity = {blk.score} / {blk.aln_len} ({idy:.2f}%) "
                     f"Orientation = "
                     f"{'Forward' if blk.coor.b_dir else 'Reverse'}\n\n")
            pos = 0
            qry_pos = int(blk.q_pos[0]) + 1
            ref_pos = blk.coor.g_pos
            n = blk.aln_len
            while pos < n:
                stop = min(pos + 80, n)
                seg1 = a1[pos:stop]
                seg2 = a2[pos:stop]
                p = 80 - int((seg1 == ord("-")).sum())
                q = 80 - int((seg2 == ord("-")).sum())
                fh.write(f"ref.{rn}\t{ref_pos:12d}\t"
                         f"{seg1.tobytes().decode('latin1')}\n"
                         f"qry.{qn}\t{qry_pos:12d}\t"
                         f"{seg2.tobytes().decode('latin1')}\n\n")
                pos += 80
                ref_pos += p if blk.coor.b_dir else -p
                qry_pos += q
            fh.write("*" * 100 + "\n")
            from gsalign_tpu.utils import bufpool
            for buf in bases:
                bufpool.put(buf)


# gnuplot line colors (src/DotPloting.cpp:3); only the top-5 are reachable
_LINE_COLORS = ["red", "blue", "web-green", "dark-magenta", "orange",
                "yellow", "turquoise", "dark-yellow", "violet", "dark-grey"]


def _find_gnuplot(cfg_path: str = "") -> str:
    """FindGnuPlotPath (src/main.cpp:169-191): the -gp override wins,
    else the first absolute path `whereis gnuplot` reports (PATH lookup
    here — same result without the shell-out-to-a-temp-file quirk)."""
    if cfg_path:
        return cfg_path
    import shutil
    return shutil.which("gnuplot") or ""


def write_dotplot(prefix: str, qry_name: str, blocks: List[Block],
                  chr_index: ChrLocIndex, gnuplot_path: str = "") -> list:
    """OutputDotplot (src/DotPloting.cpp:10-71): top-5 ref chromosomes by
    score (floor 1000); writes per-chromosome gnuplot data files
    `{prefix}.{qname}vs{chrname}` and the gnuplot script `{prefix}.gp`
    byte-compatible with the reference, then execs gnuplot (producing
    `{prefix}-{qname}.ps`) and removes the data files, exactly as the
    reference does. Without a usable gnuplot the data/script files stay on
    disk and matplotlib renders the .ps instead (documented divergence).
    Returns the written file paths."""
    g = chr_index.genome
    if not blocks:
        return []
    scores = np.zeros(g.n_chr, dtype=np.int64)
    for blk in blocks:
        if blk.score > 0:
            scores[blk.coor.chromosome_idx] += blk.score
    chosen = [(i, int(s)) for i, s in enumerate(scores) if s >= 1000]
    if not chosen:
        return []
    chosen.sort(key=lambda t: -t[1])
    chosen = chosen[:5]
    chosen_set = {i for i, _ in chosen}

    segments = {i: [] for i in chosen_set}
    for blk in blocks:
        ci = blk.coor.chromosome_idx
        if blk.score > 0 and ci in chosen_set:
            q1 = int(blk.q_pos[0]) + 1
            q2 = int(blk.q_pos[-1] + blk.q_len[-1] - 1) + 1
            r1 = gen_coordinate_info(chr_index, int(blk.r_pos[0])).g_pos
            r2 = gen_coordinate_info(
                chr_index, int(blk.r_pos[-1] + blk.r_len[-1] - 1)).g_pos
            segments[ci].append((q1, r1, q2, r2))

    # per-chromosome data files + gnuplot script (src/DotPloting.cpp:36-58)
    data_base = f"{prefix}.{qry_name}"
    data_files = []
    for ci, _ in chosen:
        path = f"{data_base}vs{g.names[ci]}"
        with open(path, "w") as fh:
            fh.write("0 0\n0 0\n\n")
            for q1, r1, q2, r2 in segments[ci]:
                fh.write(f"{q1} {r1}\n{q2} {r2}\n\n")
        data_files.append(path)
    gp_path = f"{prefix}.gp"
    ps_path = f"{prefix}-{qry_name}.ps"
    with open(gp_path, "w") as fh:
        fh.write("set terminal postscript color solid 'Courier' 15\n"
                 f"set output '{ps_path}'\nset grid\nset border 1\n")
        for k in range(len(chosen)):
            fh.write(f"set style line {k + 1} lw 4 pt 0 ps 0.5 "
                     f"lc '{_LINE_COLORS[k]}'\n")
        fh.write("set xrange[1:*]\nset yrange[1:*]\n"
                 f"set xlabel 'Query ({qry_name})'\nset ylabel 'Ref'\n")
        fh.write("plot ")
        parts = [f"'{data_files[k]}' title '{g.names[ci]}' with lp ls {k + 1}"
                 for k, (ci, _) in enumerate(chosen)]
        fh.write(", ".join(parts) + "\n\n")

    gnuplot = _find_gnuplot(gnuplot_path)
    if gnuplot:
        import subprocess
        try:
            subprocess.run([gnuplot, gp_path], check=False)
        except OSError:
            gnuplot = ""
    if gnuplot:
        # `rm DataFileName*` (src/DotPloting.cpp:70) — scoped to the files
        # this call wrote rather than the reference's glob
        for path in data_files:
            try:
                os.remove(path)
            except OSError:
                pass
        return [gp_path, ps_path]

    # no gnuplot: keep data/script files and render the .ps with matplotlib
    written = data_files + [gp_path]
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return written
    fig, ax = plt.subplots(figsize=(8, 8))
    for k, (ci, _) in enumerate(chosen):
        xs, ys = [], []
        for q1, r1, q2, r2 in segments[ci]:
            xs += [q1, q2, np.nan]
            ys += [r1, r2, np.nan]
        ax.plot(xs, ys, color=["red", "blue", "green", "magenta",
                               "orange"][k % 5], linewidth=1.0,
                label=g.names[ci])
    ax.set_xlabel(f"Query ({qry_name})")
    ax.set_ylabel("Ref")
    ax.legend()
    fig.savefig(ps_path)
    plt.close(fig)
    written.append(ps_path)
    return written
