"""Variant identification and VCF emission.

Emulates VariantIdentification / OutputSequenceVariants (src/SeqVariant.cpp).
Quirks preserved for parity:
- the aligned-string walk anchors indels on the *query* base for insertions
  (ref allele = query's preceding base, SeqVariant.cpp:76) but on the ref
  base for deletions — while the pure-insert/delete FragPair cases use the
  reference base as anchor (SeqVariant.cpp:35-50);
- SNVs are skipped when the query base is ambiguous (nt4 == 4);
- variants from reverse-strand blocks carry reverse-strand coordinates and
  reverse-complemented alleles (rPos >= N), exactly as the reference emits.

SNVs from gap-free pairs (the overwhelming majority) are found columnar —
one segmented compare across all direct pairs of a block — and stored as
arrays; only indel FragPairs and DP-aligned pairs walk per pair. Emission
order (block, pair, column) is reconstructed with sort keys so the final
stable (chr, pos) sort ties break exactly like the reference's insertion
order.
"""

from __future__ import annotations

from typing import List

import numpy as np

from gsalign_tpu.genome.coords import ChrLocIndex
from gsalign_tpu.genome.packing import NT4_TABLE
from gsalign_tpu.pipeline.chain import Block

TYPE_SNV, TYPE_INS, TYPE_DEL = 0, 1, 2
_GAP = ord("-")


class VariantCollector:
    """Columnar SNVs + columnar indel/complex chunks, with global sequence
    numbers preserving reference emission order for tie-breaking.

    Indel ("other") variants are stored one CHUNK per identify_variants
    block: parallel arrays of chr/raw-coordinate/type/seq plus two packed
    allele byte buffers (ref and alt) with per-chunk offset vectors — no
    per-event Python objects anywhere (the former tuple list was the
    largest 250 Mb host stage)."""

    def __init__(self):
        self.snv_chr: List[np.ndarray] = []
        self.snv_rpos: List[np.ndarray] = []
        self.snv_ref: List[np.ndarray] = []
        self.snv_alt: List[np.ndarray] = []
        self.snv_seq: List[np.ndarray] = []
        self.snv_pos: List[np.ndarray] = []   # filled by finalize
        self.oth_chr: List[np.ndarray] = []   # int32
        self.oth_rraw: List[np.ndarray] = []  # int64 raw text coordinate
        self.oth_typ: List[np.ndarray] = []   # uint8 TYPE_*
        self.oth_seq: List[np.ndarray] = []   # int64
        self.oth_pos: List[np.ndarray] = []   # int64, filled by finalize
        self.oth_ref_buf: List[np.ndarray] = []   # uint8 packed ref alleles
        self.oth_ref_off: List[np.ndarray] = []   # int64 [n+1] offsets
        self.oth_alt_buf: List[np.ndarray] = []
        self.oth_alt_off: List[np.ndarray] = []
        self.n_snv = 0
        self.n_ins = 0
        self.n_del = 0
        self._seq = 0
        self._finalized_snv = 0
        self._finalized_other = 0

    def take_seq(self, n: int) -> int:
        base = self._seq
        self._seq += n
        return base

    def add_snv_block(self, chr_idx, r_raw, ref_b, alt_b, seq):
        m = len(r_raw)
        if m == 0:
            return
        self.snv_chr.append(np.full(m, chr_idx, dtype=np.int32))
        self.snv_rpos.append(np.asarray(r_raw, dtype=np.int64))
        self.snv_ref.append(np.asarray(ref_b, dtype=np.uint8))
        self.snv_alt.append(np.asarray(alt_b, dtype=np.uint8))
        self.snv_seq.append(np.asarray(seq, dtype=np.int64))
        self.n_snv += m

    def add_other_block(self, chr_idx, r_raw, typs, seqs,
                        ref_buf, ref_off, alt_buf, alt_off):
        """One columnar chunk of indel/complex events (parallel arrays;
        allele bytes packed in ref/alt buffers addressed by offsets)."""
        m = len(r_raw)
        if m == 0:
            return
        self.oth_chr.append(np.full(m, chr_idx, dtype=np.int32))
        self.oth_rraw.append(np.asarray(r_raw, dtype=np.int64))
        typs = np.asarray(typs, dtype=np.uint8)
        self.oth_typ.append(typs)
        self.oth_seq.append(np.asarray(seqs, dtype=np.int64))
        self.oth_ref_buf.append(np.asarray(ref_buf, dtype=np.uint8))
        self.oth_ref_off.append(np.asarray(ref_off, dtype=np.int64))
        self.oth_alt_buf.append(np.asarray(alt_buf, dtype=np.uint8))
        self.oth_alt_off.append(np.asarray(alt_off, dtype=np.int64))
        counts = np.bincount(typs, minlength=3)
        self.n_snv += int(counts[TYPE_SNV])
        self.n_ins += int(counts[TYPE_INS])
        self.n_del += int(counts[TYPE_DEL])

    def merge_from(self, other: "VariantCollector") -> None:
        """Append another (finalized) collector, offsetting its sequence
        numbers so the merged emission order equals running the inputs
        back to back (the distributed per-chromosome merge)."""
        off = self._seq
        self.snv_chr += other.snv_chr
        self.snv_rpos += other.snv_rpos
        self.snv_ref += other.snv_ref
        self.snv_alt += other.snv_alt
        self.snv_seq += [s + off for s in other.snv_seq]
        self.snv_pos += other.snv_pos
        self.oth_chr += other.oth_chr
        self.oth_rraw += other.oth_rraw
        self.oth_typ += other.oth_typ
        self.oth_seq += [s + off for s in other.oth_seq]
        self.oth_pos += other.oth_pos
        self.oth_ref_buf += other.oth_ref_buf
        self.oth_ref_off += other.oth_ref_off
        self.oth_alt_buf += other.oth_alt_buf
        self.oth_alt_off += other.oth_alt_off
        self.n_snv += other.n_snv
        self.n_ins += other.n_ins
        self.n_del += other.n_del
        self._seq += other._seq
        self._finalized_snv = len(self.snv_rpos)
        self._finalized_other = len(self.oth_chr)

    def finalize(self, chr_index: ChrLocIndex):
        while self._finalized_snv < len(self.snv_rpos):
            i = self._finalized_snv
            _, g, _ = chr_index.coordinate(self.snv_rpos[i])
            self.snv_pos.append(g.astype(np.int64))
            self._finalized_snv += 1
        while self._finalized_other < len(self.oth_chr):
            i = self._finalized_other
            _, g, _ = chr_index.coordinate(self.oth_rraw[i])
            self.oth_pos.append(g.astype(np.int64))
            self._finalized_other += 1

    def other_columns(self):
        """Concatenated (chr, pos, seq, typ) over all indel chunks plus
        rebased packed allele buffers: (chr, pos, seq, typ, ref_buf,
        ref_off, alt_buf, alt_off) with GLOBAL [n+1] offsets."""
        if not self.oth_chr:
            z8, zi = np.zeros(0, np.uint8), np.zeros(0, np.int64)
            one = np.zeros(1, np.int64)
            return zi, zi, zi, np.zeros(0, np.uint8), z8, one, z8, one

        def _rebase(offs):
            lens = np.concatenate([o[1:] - o[:-1] for o in offs])
            return np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        return (np.concatenate(self.oth_chr).astype(np.int64),
                np.concatenate(self.oth_pos),
                np.concatenate(self.oth_seq),
                np.concatenate(self.oth_typ),
                np.concatenate(self.oth_ref_buf),
                _rebase(self.oth_ref_off),
                np.concatenate(self.oth_alt_buf),
                _rebase(self.oth_alt_off))

    # --- convenience for tests: materialized, (chr,pos,seq)-sorted rows ---
    @property
    def variants(self):
        rows = []
        for i in range(len(self.snv_rpos)):
            for j in range(len(self.snv_rpos[i])):
                rows.append((int(self.snv_chr[i][j]),
                             int(self.snv_pos[i][j]),
                             bytes(self.snv_ref[i][j:j + 1]),
                             bytes(self.snv_alt[i][j:j + 1]),
                             TYPE_SNV, int(self.snv_seq[i][j])))
        o_chr, o_pos, o_seq, o_typ, rbuf, roff, abuf, aoff = \
            self.other_columns()
        for k in range(len(o_chr)):
            rows.append((int(o_chr[k]), int(o_pos[k]),
                         rbuf[roff[k]:roff[k + 1]].tobytes(),
                         abuf[aoff[k]:aoff[k + 1]].tobytes(),
                         int(o_typ[k]), int(o_seq[k])))
        rows.sort(key=lambda r: (r[0], r[1], r[5]))
        return rows


def identify_variants(blocks: List[Block], qry_chars: np.ndarray,
                      ref_chars: np.ndarray, chr_index: ChrLocIndex,
                      collector: VariantCollector,
                      ref_codes=None, qry_codes=None) -> None:
    """Per-chromosome variant pass (VariantIdentification,
    src/SeqVariant.cpp:12-119). Blocks must carry .coor already.
    ref_codes/qry_codes: optional precomputed NT4 codes (see
    generate.plan_alignments)."""
    from gsalign_tpu.pipeline.generate import _segment_indices
    if qry_codes is None:
        qry_codes = NT4_TABLE[qry_chars]
    if ref_codes is None:
        ref_codes = NT4_TABLE[ref_chars]
    for blk in blocks:
        if blk.b_dup:
            continue
        chr_idx = blk.coor.chromosome_idx
        nonseed = ~blk.b_seed
        has_aln = np.asarray([a is not None for a in blk.aln1]) \
            if blk.n else np.zeros(0, dtype=bool)
        direct = nonseed & ~has_aln & (blk.q_len == blk.r_len) & \
            (blk.q_len > 0)
        special = np.nonzero(nonseed & ~direct)[0]

        # --- columnar SNVs over all gap-free pairs of the block ---
        # native threaded two-pass scan when available (count, then fill
        # mismatch columns): no segment-index planes, no full gathers
        didx = np.nonzero(direct)[0]
        snv_pair = snv_col = snv_flat_q = snv_flat_r = None
        if didx.size:
            from gsalign_tpu import native_lib
            lens = blk.q_len[didx]
            res = native_lib.seg_mismatch(
                qry_codes, ref_codes, blk.q_pos[didx], blk.r_pos[didx],
                lens, want_cols=True)
            if res is not None:
                counts, cols = res
                if cols.size:
                    snv_pair = didx[np.repeat(
                        np.arange(len(didx)), counts)]
                    snv_col = cols.astype(np.int64)
                    snv_flat_q = blk.q_pos[snv_pair] + snv_col
                    snv_flat_r = blk.r_pos[snv_pair] + snv_col
            else:
                qi = _segment_indices(blk.q_pos[didx], lens)
                ri = _segment_indices(blk.r_pos[didx], lens)
                qf = qry_codes[qi]
                bad = (qf != ref_codes[ri]) & (qf != 4)
                flat = np.nonzero(bad)[0]
                if flat.size:
                    seg_start = np.repeat(np.cumsum(lens) - lens, lens)
                    snv_pair = didx[np.searchsorted(np.cumsum(lens),
                                                    flat, side="right")]
                    snv_col = flat - seg_start[flat]
                    snv_flat_q = qi[flat]
                    snv_flat_r = ri[flat]

        # --- columnar events for pure-indel FragPairs (SeqVariant.cpp:35-50)
        # and the walk over DP-aligned pairs. Events carry allele
        # DESCRIPTORS (source array, start, len); bytes are materialized in
        # one segmented gather per allele column below.
        sq = blk.q_len[special]
        sr = blk.r_len[special]
        d_j = special[(sq == 0) & (sr > 0)]     # deletion FragPairs
        i_j = special[(sr == 0) & (sq > 0)]     # insertion FragPairs
        walk_idx = special[(sq > 0) & (sr > 0)]  # DP-aligned pairs
        nd, ni = len(d_j), len(i_j)
        ev_pair = np.concatenate([d_j, i_j]).astype(np.int64)
        ev_col = np.zeros(nd + ni, dtype=np.int64)
        ev_typ = np.concatenate([np.full(nd, TYPE_DEL, np.uint8),
                                 np.full(ni, TYPE_INS, np.uint8)])
        ev_rraw = blk.r_pos[ev_pair].astype(np.int64) - 1
        # del: ref = ref[r-1 : r+rlen], alt = qry[q-1 : q] (query anchor);
        # ins: ref = ref[r-1 : r],      alt = qry[q-1 : q+qlen]
        ev_ref = np.stack([
            np.zeros(nd + ni, np.int64),                       # src: REF
            blk.r_pos[ev_pair].astype(np.int64) - 1,
            np.concatenate([blk.r_len[d_j].astype(np.int64) + 1,
                            np.ones(ni, np.int64)])], axis=0)
        ev_alt = np.stack([
            np.ones(nd + ni, np.int64),                        # src: QRY
            blk.q_pos[ev_pair].astype(np.int64) - 1,
            np.concatenate([np.ones(nd, np.int64),
                            blk.q_len[i_j].astype(np.int64) + 1])], axis=0)
        walk_snv = None
        if len(walk_idx):
            walk_snv, w_ev = _walk_alignments_batch(
                blk, walk_idx, qry_chars, ref_chars)
            if len(w_ev[0]):
                ev_pair = np.concatenate([ev_pair, w_ev[0]])
                ev_col = np.concatenate([ev_col, w_ev[1]])
                ev_typ = np.concatenate([ev_typ, w_ev[2]])
                ev_rraw = np.concatenate([ev_rraw, w_ev[3]])
                ev_ref = np.concatenate([ev_ref, w_ev[4]], axis=1)
                ev_alt = np.concatenate([ev_alt, w_ev[5]], axis=1)

        n_snv = 0 if snv_pair is None else len(snv_pair)
        n_wsnv = 0 if walk_snv is None else len(walk_snv[0])
        n_ev = len(ev_pair)
        if n_snv == 0 and n_wsnv == 0 and n_ev == 0:
            continue
        base = collector.take_seq(n_snv + n_wsnv + n_ev)
        # global emission order = (pair, column); merge the three streams
        # ((pair, col) keys are unique across them, so the stable argsort
        # is fully key-determined)
        if n_snv:
            keys_snv = (snv_pair.astype(np.int64) << 32) | \
                snv_col.astype(np.int64)
        else:
            keys_snv = np.zeros(0, dtype=np.int64)
        if n_wsnv:
            keys_wsnv = (walk_snv[0] << 32) | walk_snv[1]
        else:
            keys_wsnv = np.zeros(0, dtype=np.int64)
        keys_ev = (ev_pair << 32) | ev_col
        all_keys = np.concatenate([keys_snv, keys_wsnv, keys_ev])
        order = np.argsort(all_keys, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        if n_snv:
            collector.add_snv_block(
                chr_idx,
                blk.r_pos[snv_pair] + snv_col,
                ref_chars[snv_flat_r], qry_chars[snv_flat_q],
                base + rank[:n_snv])
        if n_wsnv:
            collector.add_snv_block(
                chr_idx, walk_snv[2], walk_snv[3], walk_snv[4],
                base + rank[n_snv:n_snv + n_wsnv])
        if n_ev:
            rbuf, roff = _gather_frags(ev_ref, ref_chars, qry_chars)
            abuf, aoff = _gather_frags(ev_alt, ref_chars, qry_chars)
            collector.add_other_block(
                chr_idx, ev_rraw, ev_typ, base + rank[n_snv + n_wsnv:],
                rbuf, roff, abuf, aoff)
    collector.finalize(chr_index)


def _gather_frags(desc, ref_chars: np.ndarray, qry_chars: np.ndarray):
    """Materialize allele byte fragments from (src, start, len) descriptor
    rows with PYTHON SLICE semantics — `chars[start:start+len]` clamps the
    stop at the array end and a negative start (start == -1 arises from the
    reference's `pos - 1` anchors at position 0, SeqVariant.cpp:35-50)
    wraps to n-1 and yields an EMPTY slice. Returns (packed uint8 buffer,
    int64 [n+1] offsets)."""
    from gsalign_tpu.pipeline.generate import _segment_indices
    srcs, starts, lens = desc[0], desc[1], desc[2]
    n_src = np.where(srcs == 0, len(ref_chars), len(qry_chars))
    st = np.where(starts >= 0, starts, starts + n_src)
    eff = np.maximum(np.minimum(starts + lens, n_src) - st, 0)
    offs = np.concatenate([[0], np.cumsum(eff)]).astype(np.int64)
    buf = np.empty(int(offs[-1]), dtype=np.uint8)
    for s, arr in ((0, ref_chars), (1, qry_chars)):
        m = np.nonzero((srcs == s) & (eff > 0))[0]
        if m.size:
            buf[_segment_indices(offs[m], eff[m])] = \
                arr[_segment_indices(st[m], eff[m])]
    return buf, offs


def _walk_alignments_batch(blk, walk_idx, qry_chars: np.ndarray,
                           ref_chars: np.ndarray):
    """The aligned-string walk (src/SeqVariant.cpp:64-115) over ALL of a
    block's DP pairs at once: rows are concatenated with per-position pair
    ids, indel runs found by boundary-reset mask edges, and coordinates by
    per-pair-rebased cumulative sums. Returns columnar SNVs plus columnar
    indel-run events with allele DESCRIPTORS — nothing per-event runs in
    Python (the run loops used to dominate the 250 Mb variants stage)."""
    a1 = np.concatenate([blk.aln1[j] for j in walk_idx])
    a2 = np.concatenate([blk.aln2[j] for j in walk_idx])
    lens = np.asarray([len(blk.aln1[j]) for j in walk_idx], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    n = int(starts[-1])
    pid = np.repeat(np.arange(len(walk_idx)), lens)
    col = np.arange(n, dtype=np.int64) - starts[pid]
    first = col == 0

    gap1 = a1 == _GAP
    gap2 = a2 == _GAP
    # per-pair exclusive cumsum of consumed chars, rebased at pair starts
    c1 = np.concatenate([[0], np.cumsum(~gap1)])[:n]
    c2 = np.concatenate([[0], np.cumsum(~gap2)])[:n]
    r0 = np.asarray([int(blk.r_pos[j]) for j in walk_idx], dtype=np.int64)
    q0 = np.asarray([int(blk.q_pos[j]) for j in walk_idx], dtype=np.int64)
    r_at = r0[pid] + (c1 - c1[starts[pid]])
    q_at = q0[pid] + (c2 - c2[starts[pid]])

    prev1 = np.concatenate([[False], gap1[:-1]])
    prev2 = np.concatenate([[False], gap2[:-1]])
    # run starts: gap position at a pair start or after a non-gap; run
    # ends: gap position whose successor starts a new pair or is not a gap
    nxt_first = np.concatenate([first[1:], [True]])
    nxt1 = np.concatenate([gap1[1:], [False]])
    nxt2 = np.concatenate([gap2[1:], [False]])
    ins_starts = np.nonzero(gap1 & (first | ~prev1))[0]
    ins_ends = np.nonzero(gap1 & (nxt_first | ~nxt1))[0]
    del_starts = np.nonzero(gap2 & (first | ~prev2))[0]
    del_ends = np.nonzero(gap2 & (nxt_first | ~nxt2))[0]
    snv_cols = np.nonzero((~gap1) & (~gap2) &
                          (NT4_TABLE[a1] != NT4_TABLE[a2]) &
                          (NT4_TABLE[a2] != 4))[0]

    # Indel runs, columnar. An insertion run of length L anchored at query
    # position q emits ref = qry[q-1 : q] (the QUERY anchor byte,
    # SeqVariant.cpp:76) and alt = qry[q-1 : q+L]; a deletion run anchored
    # at ref position r emits ref = ref[r-1 : r+L] and alt = ref[r-1 : r].
    wi = np.asarray(walk_idx, dtype=np.int64)
    ni, nd2 = len(ins_starts), len(del_starts)
    ilen = (ins_ends - ins_starts + 1).astype(np.int64)
    dlen = (del_ends - del_starts + 1).astype(np.int64)
    iq = q_at[ins_starts].astype(np.int64)
    dr = r_at[del_starts].astype(np.int64)
    w_pair = np.concatenate([wi[pid[ins_starts]], wi[pid[del_starts]]])
    w_col = np.concatenate([col[ins_starts], col[del_starts]])
    w_typ = np.concatenate([np.full(ni, TYPE_INS, np.uint8),
                            np.full(nd2, TYPE_DEL, np.uint8)])
    w_rraw = np.concatenate([r_at[ins_starts].astype(np.int64) - 1, dr - 1])
    w_ref = np.stack([
        np.concatenate([np.ones(ni, np.int64),          # ins: QRY anchor
                        np.zeros(nd2, np.int64)]),      # del: REF run
        np.concatenate([iq - 1, dr - 1]),
        np.concatenate([np.ones(ni, np.int64), dlen + 1])], axis=0)
    w_alt = np.stack([
        np.concatenate([np.ones(ni, np.int64),          # ins: QRY run
                        np.zeros(nd2, np.int64)]),      # del: REF anchor
        np.concatenate([iq - 1, dr - 1]),
        np.concatenate([ilen + 1, np.ones(nd2, np.int64)])], axis=0)
    # SNVs stay columnar: (pair, col) keys are disjoint from the indel
    # events', so merging as a separate stream preserves the (pair, col)
    # emission order exactly
    return ((wi[pid[snv_cols]], col[snv_cols], r_at[snv_cols],
             a1[snv_cols], a2[snv_cols]),
            (w_pair, w_col, w_typ, w_rraw, w_ref, w_alt))


def write_vcf(path: str, collector: VariantCollector, names: List[str],
              lengths: np.ndarray, reference_name: str,
              version_str: str = "1.0.22") -> None:
    """OutputSequenceVariants (src/SeqVariant.cpp:121-143).

    Columnar emission: the (chr, pos, seq) sort runs as one lexsort over
    the collector's arrays and SNV lines are assembled from pre-decoded
    character strings — no per-variant row materialization (the former
    `collector.variants` walk dominated host time at 100 Mb scale)."""
    c = collector
    if c.snv_rpos:
        s_chr = np.concatenate(c.snv_chr).astype(np.int64)
        s_pos = np.concatenate(c.snv_pos)
        s_seq = np.concatenate(c.snv_seq)
        s_ref = np.concatenate(c.snv_ref)
        s_alt = np.concatenate(c.snv_alt)
    else:
        s_chr = s_pos = s_seq = np.zeros(0, dtype=np.int64)
        s_ref = s_alt = np.zeros(0, dtype=np.uint8)
    n_snv = len(s_chr)
    o_chr, o_pos, o_seq, o_typ, rbuf, roff, abuf, aoff = c.other_columns()
    all_chr = np.concatenate([s_chr, o_chr])
    all_pos = np.concatenate([s_pos, o_pos])
    all_seq = np.concatenate([s_seq, o_seq])
    order = np.lexsort((all_seq, all_pos, all_chr))

    ref_str = s_ref.tobytes().decode("latin1")
    alt_str = s_alt.tobytes().decode("latin1")
    mut_type = {TYPE_SNV: "SUBSTITUTE", TYPE_INS: "INSERT", TYPE_DEL: "DELETE"}
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.1\n")
        fh.write(f"##reference={reference_name}\n")
        fh.write(f"##source=GSAlign {version_str}\n")
        fh.write('##INFO=<ID=TYPE,Number=1,Type=String,Description="The type '
                 'of allele, either SUBSTITUTE, INSERT, or DELETE.">\n')
        for i, name in enumerate(names):
            fh.write(f"##contig=<ID={name},length={int(lengths[i])}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.flush()
        body = _format_body_native(names, order, all_chr, all_pos, n_snv,
                                   s_ref, s_alt, o_typ, rbuf, roff,
                                   abuf, aoff)
        if body is not None:
            with open(path, "ab") as bfh:
                bfh.write(body)
            return
        chr_l = all_chr.tolist()
        pos_l = all_pos.tolist()
        lines = []
        for i in order.tolist():
            if i < n_snv:
                lines.append(f"{names[chr_l[i]]}\t{pos_l[i]}\t.\t"
                             f"{ref_str[i]}\t{alt_str[i]}\t100\t*\t"
                             f"TYPE=SUBSTITUTE\n")
            else:
                k = i - n_snv
                rf = rbuf[roff[k]:roff[k + 1]].tobytes()
                af = abuf[aoff[k]:aoff[k + 1]].tobytes()
                lines.append(f"{names[chr_l[i]]}\t{pos_l[i]}\t.\t"
                             f"{rf.decode('ascii')}\t{af.decode('ascii')}\t"
                             f"100\t*\tTYPE={mut_type[int(o_typ[k])]}\n")
        fh.write("".join(lines))


def _format_body_native(names, order, all_chr, all_pos, n_snv, s_ref,
                        s_alt, o_typ, rbuf, roff, abuf, aoff):
    """Native one-buffer formatting of the sorted VCF data lines (the
    python f-string loop was ~1 s for 1.4 M lines at 250 Mb). The
    interleaved rf/af fragment layout the native formatter expects is
    assembled with two segmented scatters — no per-event Python. Returns a
    bytes-like or None when the native lib is unavailable."""
    from gsalign_tpu import native_lib
    from gsalign_tpu.pipeline.generate import _segment_indices
    if native_lib.get_lib() is None:
        return None
    name_bytes = [n.encode("ascii") for n in names]
    name_buf = np.frombuffer(b"".join(name_bytes), dtype=np.uint8)
    name_off = np.concatenate(
        [[0], np.cumsum([len(b) for b in name_bytes])]).astype(np.int64)
    n_oth = len(o_typ)
    ref_lens = roff[1:] - roff[:-1]
    alt_lens = aoff[1:] - aoff[:-1]
    il_lens = np.empty(2 * n_oth, dtype=np.int64)
    il_lens[0::2] = ref_lens
    il_lens[1::2] = alt_lens
    frag_off = np.concatenate([[0], np.cumsum(il_lens)]).astype(np.int64)
    frag_buf = np.empty(int(frag_off[-1]), dtype=np.uint8)
    if n_oth:
        frag_buf[_segment_indices(frag_off[0:-1:2], ref_lens)] = rbuf
        frag_buf[_segment_indices(frag_off[1:-1:2], alt_lens)] = abuf
    return native_lib.vcf_format(order, all_chr, all_pos, name_buf,
                                 name_off, n_snv, s_ref, s_alt,
                                 frag_buf, frag_off, o_typ)
