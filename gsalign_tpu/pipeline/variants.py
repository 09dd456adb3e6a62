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
    pos: int
    ref_frag: bytes
    alt_frag: bytes
    type: int


class VariantCollector:
    def __init__(self):
        self.variants: List[Variant] = []
        self.n_snv = 0
        self.n_ins = 0
        self.n_del = 0

    def add(self, v: Variant):
        self.variants.append(v)
        if v.type == TYPE_SNV:
            self.n_snv += 1
        elif v.type == TYPE_INS:
            self.n_ins += 1
        else:
            self.n_del += 1


def identify_variants(blocks: List[Block], qry_chars: np.ndarray,
                      ref_chars: np.ndarray, chr_index: ChrLocIndex,
                      collector: VariantCollector) -> None:
    """Per-chromosome variant pass (VariantIdentification,
    src/SeqVariant.cpp:12-119). Blocks must carry .coor already."""
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
            if q_len == 0:      # deletion
                ref_frag = bytes(ref_chars[r_pos - 1: r_pos + r_len])
                pos = _gpos(chr_index, r_pos - 1)
                alt = bytes(qry_chars[q_pos - 1: q_pos])
                collector.add(Variant(chr_idx, pos, ref_frag, alt, TYPE_DEL))
            elif r_len == 0:    # insertion
                alt_frag = bytes(qry_chars[q_pos - 1: q_pos + q_len])
                pos = _gpos(chr_index, r_pos - 1)
                ref = bytes(ref_chars[r_pos - 1: r_pos])
                collector.add(Variant(chr_idx, pos, ref, alt_frag, TYPE_INS))
            elif q_len == 1 and r_len == 1:
                a1, a2 = blk.aln1[j], blk.aln2[j]
                if NT4_TABLE[a1[0]] != NT4_TABLE[a2[0]] and \
                        NT4_TABLE[a2[0]] != 4:
                    pos = _gpos(chr_index, r_pos)
                    collector.add(Variant(chr_idx, pos, bytes(a1[:1]),
                                          bytes(a2[:1]), TYPE_SNV))
            else:
                _walk_alignment(blk.aln1[j], blk.aln2[j], q_pos, r_pos,
                                chr_idx, qry_chars, ref_chars, chr_index,
                                collector)


def _gpos(chr_index: ChrLocIndex, r_pos: int) -> int:
    _, g, _ = chr_index.coordinate(np.asarray([r_pos]))
    return int(g[0])


def _walk_alignment(a1: np.ndarray, a2: np.ndarray, q_pos0: int, r_pos0: int,
                    chr_idx: int, qry_chars: np.ndarray,
                    ref_chars: np.ndarray, chr_index: ChrLocIndex,
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
            pos = _gpos(chr_index, r_cur - 1)
            collector.add(Variant(chr_idx, pos, frag2[:1], frag2, TYPE_INS))
        elif typ == TYPE_DEL:
            frag1 = bytes(ref_chars[r_cur - 1: r_cur + ind_len])
            pos = _gpos(chr_index, r_cur - 1)
            collector.add(Variant(chr_idx, pos, frag1, frag1[:1], TYPE_DEL))
        else:
            pos = _gpos(chr_index, r_cur)
            collector.add(Variant(chr_idx, pos, bytes(a1[i:i + 1]),
                                  bytes(a2[i:i + 1]), TYPE_SNV))


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
