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

Variants are appended in block/pair/column order (matching the reference's
emission order, which the final stable (chr,pos) sort preserves for ties);
reference-coordinate -> chromosome-position conversion is deferred and done
in one vectorized batch at the end.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from gsalign_tpu.genome.coords import ChrLocIndex
from gsalign_tpu.genome.packing import NT4_TABLE
from gsalign_tpu.pipeline.chain import Block

TYPE_SNV, TYPE_INS, TYPE_DEL = 0, 1, 2
_GAP = ord("-")


@dataclasses.dataclass
class Variant:
    chr_idx: int
    pos: int              # 1-based chromosome position (filled by finalize)
    ref_frag: bytes
    alt_frag: bytes
    type: int
    r_pos: int = -1       # raw fwd+RC coordinate pending conversion


class VariantCollector:
    def __init__(self):
        self.variants: List[Variant] = []
        self.n_snv = 0
        self.n_ins = 0
        self.n_del = 0
        self._finalized = 0

    def add_raw(self, chr_idx: int, r_pos: int, ref_frag: bytes,
                alt_frag: bytes, typ: int):
        self.variants.append(Variant(chr_idx, -1, ref_frag, alt_frag, typ,
                                     r_pos))
        if typ == TYPE_SNV:
            self.n_snv += 1
        elif typ == TYPE_INS:
            self.n_ins += 1
        else:
            self.n_del += 1

    def finalize(self, chr_index: ChrLocIndex):
        """Convert pending raw coordinates to 1-based chromosome positions."""
        pending = self.variants[self._finalized:]
        if pending:
            r = np.asarray([v.r_pos for v in pending], dtype=np.int64)
            _, g_pos, _ = chr_index.coordinate(r)
            for v, g in zip(pending, g_pos):
                v.pos = int(g)
        self._finalized = len(self.variants)


def identify_variants(blocks: List[Block], qry_chars: np.ndarray,
                      ref_chars: np.ndarray, chr_index: ChrLocIndex,
                      collector: VariantCollector) -> None:
    """Per-chromosome variant pass (VariantIdentification,
    src/SeqVariant.cpp:12-119). Blocks must carry .coor already."""
    from gsalign_tpu.pipeline.generate import pair_rows
    qry_codes = NT4_TABLE[qry_chars]
    ref_codes = NT4_TABLE[ref_chars]
    for blk in blocks:
        if blk.b_dup:
            continue
        chr_idx = blk.coor.chromosome_idx
        for j in range(blk.n):
            if blk.b_seed[j]:
                continue
            q_pos, r_pos = int(blk.q_pos[j]), int(blk.r_pos[j])
            q_len, r_len = int(blk.q_len[j]), int(blk.r_len[j])
            if q_len == 0 and r_len == 0:
                continue
            if q_len == 0:      # deletion FragPair
                ref_frag = bytes(ref_chars[r_pos - 1: r_pos + r_len])
                alt = bytes(qry_chars[q_pos - 1: q_pos])
                collector.add_raw(chr_idx, r_pos - 1, ref_frag, alt, TYPE_DEL)
            elif r_len == 0:    # insertion FragPair
                alt_frag = bytes(qry_chars[q_pos - 1: q_pos + q_len])
                ref = bytes(ref_chars[r_pos - 1: r_pos])
                collector.add_raw(chr_idx, r_pos - 1, ref, alt_frag, TYPE_INS)
            elif q_len == 1 and r_len == 1:
                rc = ref_codes[r_pos]
                qc = qry_codes[q_pos]
                if rc != qc and qc != 4:
                    collector.add_raw(chr_idx, r_pos,
                                      bytes(ref_chars[r_pos:r_pos + 1]),
                                      bytes(qry_chars[q_pos:q_pos + 1]),
                                      TYPE_SNV)
            elif blk.aln1[j] is None:
                # gap-free implied pair: SNV columns only, vectorized
                rf = ref_codes[r_pos:r_pos + r_len]
                qf = qry_codes[q_pos:q_pos + q_len]
                snv = np.nonzero((rf != qf) & (qf != 4))[0]
                for d in snv:
                    d = int(d)
                    collector.add_raw(
                        chr_idx, r_pos + d,
                        bytes(ref_chars[r_pos + d:r_pos + d + 1]),
                        bytes(qry_chars[q_pos + d:q_pos + d + 1]), TYPE_SNV)
            else:
                a1, a2 = pair_rows(blk, j, qry_chars, ref_chars)
                _walk_alignment(a1, a2, q_pos, r_pos, chr_idx, qry_chars,
                                ref_chars, collector)
    collector.finalize(chr_index)


def _walk_alignment(a1: np.ndarray, a2: np.ndarray, q_pos0: int, r_pos0: int,
                    chr_idx: int, qry_chars: np.ndarray,
                    ref_chars: np.ndarray,
                    collector: VariantCollector) -> None:
    """The aligned-string walk (src/SeqVariant.cpp:64-115), vectorized:
    consumed-character prefix sums give rPos/qPos at each column; indel runs
    and SNV columns are found by masks but emitted in column order."""
    n = len(a1)
    gap1 = a1 == _GAP
    gap2 = a2 == _GAP
    # rPos/qPos BEFORE each column
    r_at = r_pos0 + np.concatenate([[0], np.cumsum(~gap1)])[:n]
    q_at = q_pos0 + np.concatenate([[0], np.cumsum(~gap2)])[:n]

    ins_starts = np.nonzero(gap1 & ~np.concatenate([[False], gap1[:-1]]))[0]
    del_starts = np.nonzero(gap2 & ~np.concatenate([[False], gap2[:-1]]))[0]
    snv_cols = np.nonzero((~gap1) & (~gap2) &
                          (NT4_TABLE[a1] != NT4_TABLE[a2]) &
                          (NT4_TABLE[a2] != 4))[0]

    events = []
    for i in ins_starts:
        i = int(i)
        ind_len = 1
        while i + ind_len < n and gap1[i + ind_len]:
            ind_len += 1
        events.append((i, TYPE_INS, ind_len))
    for i in del_starts:
        i = int(i)
        ind_len = 1
        while i + ind_len < n and gap2[i + ind_len]:
            ind_len += 1
        events.append((i, TYPE_DEL, ind_len))
    for i in snv_cols:
        events.append((int(i), TYPE_SNV, 1))
    events.sort(key=lambda e: e[0])

    for i, typ, ind_len in events:
        r_cur, q_cur = int(r_at[i]), int(q_at[i])
        if typ == TYPE_INS:
            frag2 = bytes(qry_chars[q_cur - 1: q_cur + ind_len])
            collector.add_raw(chr_idx, r_cur - 1, frag2[:1], frag2, TYPE_INS)
        elif typ == TYPE_DEL:
            frag1 = bytes(ref_chars[r_cur - 1: r_cur + ind_len])
            collector.add_raw(chr_idx, r_cur - 1, frag1, frag1[:1], TYPE_DEL)
        else:
            collector.add_raw(chr_idx, r_cur, bytes(a1[i:i + 1]),
                              bytes(a2[i:i + 1]), TYPE_SNV)


def write_vcf(path: str, collector: VariantCollector, names: List[str],
              lengths: np.ndarray, reference_name: str,
              version_str: str = "1.0.22") -> None:
    """OutputSequenceVariants (src/SeqVariant.cpp:121-143)."""
    mut_type = {TYPE_SNV: "SUBSTITUTE", TYPE_INS: "INSERT", TYPE_DEL: "DELETE"}
    variants = sorted(collector.variants, key=lambda v: (v.chr_idx, v.pos))
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.1\n")
        fh.write(f"##reference={reference_name}\n")
        fh.write(f"##source=GSAlign {version_str}\n")
        fh.write('##INFO=<ID=TYPE,Number=1,Type=String,Description="The type '
                 'of allele, either SUBSTITUTE, INSERT, or DELETE.">\n')
        for i, name in enumerate(names):
            fh.write(f"##contig=<ID={name},length={int(lengths[i])}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for v in variants:
            fh.write(f"{names[v.chr_idx]}\t{v.pos}\t.\t"
                     f"{v.ref_frag.decode('ascii')}\t"
                     f"{v.alt_frag.decode('ascii')}\t100\t*\t"
                     f"TYPE={mut_type[v.type]}\n")
