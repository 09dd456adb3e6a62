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
    """Columnar SNVs + object-list indels/complex, with global sequence
    numbers preserving reference emission order for tie-breaking."""

    def __init__(self):
        self.snv_chr: List[np.ndarray] = []
        self.snv_rpos: List[np.ndarray] = []
        self.snv_ref: List[np.ndarray] = []
        self.snv_alt: List[np.ndarray] = []
        self.snv_seq: List[np.ndarray] = []
        self.snv_pos: List[np.ndarray] = []   # filled by finalize
        self.other = []     # (chr, r_raw, ref bytes, alt bytes, type, seq)
        self.other_pos: List[int] = []
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

    def add_other(self, chr_idx, r_raw, ref_frag: bytes, alt_frag: bytes,
                  typ: int, seq: int):
        self.other.append((chr_idx, r_raw, ref_frag, alt_frag, typ, seq))
        if typ == TYPE_INS:
            self.n_ins += 1
        elif typ == TYPE_DEL:
            self.n_del += 1
        else:
            self.n_snv += 1

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
        self.other += [(c, r, rf, af, t, s + off)
                       for c, r, rf, af, t, s in other.other]
        self.other_pos += other.other_pos
        self.n_snv += other.n_snv
        self.n_ins += other.n_ins
        self.n_del += other.n_del
        self._seq += other._seq
        self._finalized_snv = len(self.snv_rpos)
        self._finalized_other = len(self.other)

    def finalize(self, chr_index: ChrLocIndex):
        while self._finalized_snv < len(self.snv_rpos):
            i = self._finalized_snv
            _, g, _ = chr_index.coordinate(self.snv_rpos[i])
            self.snv_pos.append(g.astype(np.int64))
            self._finalized_snv += 1
        if self._finalized_other < len(self.other):
            pending = self.other[self._finalized_other:]
            r = np.asarray([p[1] for p in pending], dtype=np.int64)
            _, g, _ = chr_index.coordinate(r)
            self.other_pos.extend(int(x) for x in g)
            self._finalized_other = len(self.other)

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
        for k, (c, _, rf, af, t, s) in enumerate(self.other):
            rows.append((c, self.other_pos[k], rf, af, t, s))
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

        # --- per-pair events for indel / DP pairs (rare) ---
        events = []    # (pair_idx, col, type, r_raw, ref_frag, alt_frag)
        walk_idx = []
        for j in special:
            j = int(j)
            q_pos, r_pos = int(blk.q_pos[j]), int(blk.r_pos[j])
            q_len, r_len = int(blk.q_len[j]), int(blk.r_len[j])
            if q_len == 0 and r_len == 0:
                continue
            if q_len == 0:          # deletion FragPair
                ref_frag = bytes(ref_chars[r_pos - 1: r_pos + r_len])
                alt = bytes(qry_chars[q_pos - 1: q_pos])
                events.append((j, 0, TYPE_DEL, r_pos - 1, ref_frag, alt))
            elif r_len == 0:        # insertion FragPair
                alt_frag = bytes(qry_chars[q_pos - 1: q_pos + q_len])
                ref = bytes(ref_chars[r_pos - 1: r_pos])
                events.append((j, 0, TYPE_INS, r_pos - 1, ref, alt_frag))
            else:                   # DP-aligned pair
                walk_idx.append(j)
        walk_snv = None
        if walk_idx:
            walk_snv = _walk_alignments_batch(blk, walk_idx, qry_chars,
                                              ref_chars, events)

        n_snv = 0 if snv_pair is None else len(snv_pair)
        n_wsnv = 0 if walk_snv is None else len(walk_snv[0])
        n_ev = len(events)
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
        keys_ev = np.asarray([(e[0] << 32) | e[1] for e in events],
                             dtype=np.int64)
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
        for k, (j, col, typ, r_raw, rf, af) in enumerate(events):
            collector.add_other(chr_idx, r_raw, rf, af, typ,
                                base + int(rank[n_snv + n_wsnv + k]))
    collector.finalize(chr_index)


def _walk_alignments_batch(blk, walk_idx, qry_chars: np.ndarray,
                           ref_chars: np.ndarray, events: list) -> None:
    """The aligned-string walk (src/SeqVariant.cpp:64-115) over ALL of a
    block's DP pairs at once: rows are concatenated with per-position pair
    ids, indel runs found by boundary-reset mask edges, and coordinates by
    per-pair-rebased cumulative sums. Only the (rare) per-event fragment
    byte strings are built in Python."""
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

    for i, e in zip(ins_starts.tolist(), ins_ends.tolist()):
        ind_len = e - i + 1
        q_cur = int(q_at[i])
        frag2 = bytes(qry_chars[q_cur - 1: q_cur + ind_len])
        events.append((walk_idx[pid[i]], int(col[i]), TYPE_INS,
                       int(r_at[i]) - 1, frag2[:1], frag2))
    for i, e in zip(del_starts.tolist(), del_ends.tolist()):
        ind_len = e - i + 1
        r_cur = int(r_at[i])
        frag1 = bytes(ref_chars[r_cur - 1: r_cur + ind_len])
        events.append((walk_idx[pid[i]], int(col[i]), TYPE_DEL,
                       r_cur - 1, frag1, frag1[:1]))
    # SNVs stay columnar (the per-event python loop was the walk's cost):
    # (pair, col) keys are disjoint from the indel events', so merging as
    # a separate stream preserves the (pair, col) emission order exactly
    wi = np.asarray(walk_idx, dtype=np.int64)
    return (wi[pid[snv_cols]], col[snv_cols], r_at[snv_cols],
            a1[snv_cols], a2[snv_cols])


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
    o_chr = np.asarray([o[0] for o in c.other], dtype=np.int64)
    o_pos = np.asarray(c.other_pos, dtype=np.int64)
    o_seq = np.asarray([o[5] for o in c.other], dtype=np.int64)
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
        body = _format_body_native(c, names, order, all_chr, all_pos,
                                   n_snv, s_ref, s_alt)
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
                _, _, rf, af, typ, _ = c.other[i - n_snv]
                lines.append(f"{names[chr_l[i]]}\t{pos_l[i]}\t.\t"
                             f"{rf.decode('ascii')}\t{af.decode('ascii')}\t"
                             f"100\t*\tTYPE={mut_type[typ]}\n")
        fh.write("".join(lines))


def _format_body_native(c: VariantCollector, names, order, all_chr,
                        all_pos, n_snv, s_ref, s_alt):
    """Native one-buffer formatting of the sorted VCF data lines (the
    python f-string loop was ~1 s for 1.4 M lines at 250 Mb). Returns a
    bytes-like or None when the native lib is unavailable."""
    from gsalign_tpu import native_lib
    if native_lib.get_lib() is None:
        return None
    name_bytes = [n.encode("ascii") for n in names]
    name_buf = np.frombuffer(b"".join(name_bytes), dtype=np.uint8)
    name_off = np.concatenate(
        [[0], np.cumsum([len(b) for b in name_bytes])]).astype(np.int64)
    frags = []
    frag_lens = []
    types = np.empty(len(c.other), dtype=np.uint8)
    for j, (_, _, rf, af, typ, _) in enumerate(c.other):
        frags.append(rf)
        frags.append(af)
        frag_lens.append(len(rf))
        frag_lens.append(len(af))
        types[j] = typ
    frag_buf = np.frombuffer(b"".join(frags), dtype=np.uint8) if frags \
        else np.zeros(0, dtype=np.uint8)
    frag_off = np.concatenate([[0], np.cumsum(frag_lens)]).astype(np.int64) \
        if frags else np.zeros(1, dtype=np.int64)
    return native_lib.vcf_format(order, all_chr, all_pos, name_buf,
                                 name_off, n_snv, s_ref, s_alt,
                                 frag_buf, frag_off, types)
